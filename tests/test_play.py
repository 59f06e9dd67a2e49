"""play API tests: SentenceFeatures + evoked predict (bm/test_play.py
sentence-prediction coverage)."""

import numpy as np
import pytest

from brainmagick_tpu import play


def test_sentence_features():
    builder = play.SentenceFeatures(
        ["WordLength", "WordFrequency"], {}, sample_rate=20)
    out = builder("de kat slaapt in de woonkamer")
    assert out.shape[0] == 2
    # first word starts at 1s -> first 20 samples empty
    assert (out[:, :20] == 0).all()
    assert out.max() > 0
    # custom durations via generate
    out2 = builder.generate([("hallo", 0.5), ("wereld", 0.5)],
                            interword=0.2)
    assert out2.shape[0] == 2
    # word length painted over the word span
    assert (out2[0] == 5).sum() >= 9  # 0.5s @ 20Hz


@pytest.mark.slow
def test_predict_evoked(tmp_cache, tmp_path):
    from brainmagick_tpu import train as bm_train

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_solver import tiny_args

    args = tiny_args(tmp_cache, tmp_path, loss="mse",
                     features=("WordLength",), epochs=1)
    solver = bm_train.get_solver(args)
    solver.train()

    builder = play.SentenceFeatures.from_solver(solver)
    features = builder("Toen barkeeper de")
    assert features.shape[0] == 1  # WordLength only
    evoked = play.predict(solver, features.astype(np.float32),
                          subject_index=0)
    n_chan = solver.datasets.train[0].meg.shape[0]
    # decode task: the estimate lives in feature space
    assert evoked.shape[0] == solver.used_features.output_dimension
    assert np.isfinite(evoked).all()
