"""Paper-table analysis (scripts/paper_tables.py) — the reference ships
these aggregations as notebook templates."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

spec = importlib.util.spec_from_file_location(
    "paper_tables",
    Path(__file__).parent.parent / "scripts" / "paper_tables.py")
pt = importlib.util.module_from_spec(spec)
sys.modules["paper_tables"] = pt
spec.loader.exec_module(pt)


def _write_eval(out_dir: Path, sig: str, config: dict,
                hits: np.ndarray, n_vocab: int = 20, seed: int = 0):
    """Fabricate one XP's eval artifacts with a given per-sample top-1
    correctness pattern."""
    rng = np.random.RandomState(seed)
    n = len(hits)
    vocab = np.arange(n_vocab, dtype=np.int64) + 1000
    true_hashes = vocab[rng.randint(0, n_vocab, n)]
    probs = rng.rand(n, n_vocab).astype(np.float32) * 0.1
    for i in range(n):
        true_col = int(np.flatnonzero(vocab == true_hashes[i])[0])
        col = true_col if hits[i] else (true_col + 1) % n_vocab
        probs[i, col] = 1.0
    probs /= probs.sum(axis=1, keepdims=True)

    acc = pd.DataFrame(
        [dict(topk=k,
              acc_segment=float(
                  hits.mean() if k == 1 else min(1.0, hits.mean() + 0.1)))
         for k in (1, 5, 10)]).set_index("topk")

    eval_dir = out_dir / "eval" / sig
    eval_dir.mkdir(parents=True)
    np.save(eval_dir / "probs_segment.npy", probs)
    np.save(eval_dir / "vocab_segment.npy", vocab)
    pd.DataFrame({"segment_hashes": true_hashes}).to_csv(
        eval_dir / "metadata.csv")
    acc.reset_index().to_csv(eval_dir / "acc.csv", index=False)
    with open(eval_dir / "solver_config.yaml", "w") as f:
        yaml.safe_dump(config, f)


def _config(variant_base: bool, seed: int, study: str = "fake") -> dict:
    simpleconv = {"merger": True, "glu": 2, "initial_linear": 270,
                  "gelu": True, "skip": True, "complex_out": True,
                  "subject_layers": True}
    if not variant_base:
        simpleconv["merger"] = False
    return dict(seed=seed, simpleconv=simpleconv,
                norm={"clip": True},
                optim={"loss": "clip"},
                dset={"selections": [{"study": study}],
                      "features": ["Wav2VecTransformer", "WordHash"]},
                feature_model_name=None)


@pytest.fixture()
def fake_grid_evals(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    n = 400
    sigs = []
    for seed in (1, 2):
        base_hits = rng.rand(n) < 0.41
        # variant is clearly worse: flip 30% of base hits to misses
        var_hits = base_hits & (rng.rand(n) > 0.3)
        for sig, is_base, hits in ((f"base{seed}", True, base_hits),
                                   (f"var{seed}", False, var_hits)):
            _write_eval(tmp_path, sig, _config(is_base, seed), hits,
                        seed=seed)
            sigs.append(sig)
    monkeypatch.setattr(pt, "_evaluated_sigs",
                        lambda grid, out_dir: sigs)
    return tmp_path


def test_variant_and_dataset_names():
    cfg = _config(True, 1)
    assert pt.variant_name(cfg) == "base"
    assert pt.dataset_name(cfg) == "fake"
    cfg = _config(False, 1)
    assert pt.variant_name(cfg) == "no_merger"
    cfg = _config(True, 1)
    cfg["optim"]["loss"] = "mse"
    cfg["dset"]["features"] = ["MelSpectrum", "WordHash"]
    assert "mse" in pt.variant_name(cfg)
    assert "MelSpectrum" in pt.variant_name(cfg)
    cfg = _config(True, 1)
    cfg["feature_model_name"] = "deep_mel"
    assert "deep_mel" in pt.variant_name(cfg)


def test_build_table_aggregates_across_seeds(fake_grid_evals):
    table = pt.build_table("any_grid", str(fake_grid_evals), topk=1)
    assert set(table.variant) == {"base", "no_merger"}
    base = table[table.variant == "base"].iloc[0]
    var = table[table.variant == "no_merger"].iloc[0]
    assert base["count"] == 2 and var["count"] == 2
    assert base["mean"] > var["mean"]
    assert 0.3 < base["mean"] < 0.55


def test_per_sample_hits_roundtrip(fake_grid_evals):
    data = pt.load_eval("base1", str(fake_grid_evals))
    hits = pt.per_sample_hits(data)
    # recovered correctness rate equals the recorded top-1 accuracy
    np.testing.assert_allclose(hits.mean(),
                               data["acc"].loc[1, "acc_segment"],
                               atol=1e-6)


def test_pvalues_detect_real_difference(fake_grid_evals):
    table = pt.build_pvalues("any_grid", str(fake_grid_evals))
    row = table[(table.dataset == "fake")
                & (table.variant == "no_merger")].iloc[0]
    assert row.delta < 0            # ablation hurts
    assert row.p_value < 1e-6       # and significantly so
    assert row.n_seeds == 2
    assert row.n_samples == 800


def test_paired_pvalue_null():
    rng = np.random.RandomState(0)
    a = rng.rand(500) < 0.4
    flip = rng.rand(500) < 0.05     # symmetric noise, no real effect
    b = np.where(flip, ~a, a)
    assert pt.paired_pvalue(a, b) > 0.01
    assert pt.paired_pvalue(a, a) == 1.0


@pytest.mark.slow
def test_attention_map_from_solver(tmp_cache, tmp_path):
    from brainmagick_tpu import play
    from brainmagick_tpu import train as bm_train

    from test_solver import tiny_args

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    weights, positions = play.attention_map(solver)
    R, O, C = weights.shape
    assert O == 16 and C == positions.shape[1]
    assert positions.shape == (R, C, 2)
    # rows are softmax distributions over the real sensors
    np.testing.assert_allclose(weights.sum(axis=2), 1.0, atol=1e-5)
    assert (weights >= 0).all()
