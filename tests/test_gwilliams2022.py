"""Mock-BIDS test for the gwilliams2022 adapter (headline study):
participants.tsv + events.tsv with dict-literal trial_type + FIF raw
written by our own writer."""

import wave
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from brainmagick_tpu.env import env
from brainmagick_tpu.studies.api import RawData
from brainmagick_tpu.studies.io import write_fif

SENTENCES = ["the cat sat on the mat", "a dog ran over the hill"]


def _write_wav(path: Path, seconds: float) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    n = int(16000 * seconds)
    sig = (np.sin(2 * np.pi * 200 * np.arange(n) / 16000) * 15000
           ).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(sig.tobytes())


def write_gwilliams_fixture(root: Path, kind: str) -> None:
    """Deterministic gwilliams2022 study tree with the raw stored as
    `kind` in {'fif', 'con'} (shared by the pytest fixture and the
    golden-CSV regeneration entry point below)."""
    download = root / "download"
    download.mkdir(parents=True)
    pd.DataFrame({"participant_id": ["sub-01"]}).to_csv(
        download / "participants.tsv", sep="\t", index=False)

    meg_dir = download / "sub-01" / "ses-0" / "meg"
    meg_dir.mkdir(parents=True)
    stem = "sub-01_ses-0_task-0"

    # events.tsv: sound + word rows with dict-literal trial_type
    rows = []
    t = 1.0
    _write_wav(download / "stimuli" / "audio" / "story0.wav", 30.0)
    for seq_id, sentence in enumerate(SENTENCES):
        rows.append(dict(onset=t, duration=10.0, trial_type=repr(dict(
            kind="sound", sound="stimuli/audio/story0.WAV.wav"))))
        for word in sentence.split():
            rows.append(dict(onset=t, duration=0.25, trial_type=repr(dict(
                kind="word", word=word, sequence_id=seq_id,
                condition="sentence"))))
            t += 0.4
        t += 2.0
    pd.DataFrame(rows).to_csv(meg_dir / f"{stem}_events.tsv", sep="\t",
                              index=False)

    # raw: 16 MEG channels @ 1000 Hz, stored as FIF or native KIT .con
    # (the real MEG-MASC release ships .con)
    rng = np.random.RandomState(0)
    n_chan = 16
    positions = rng.rand(n_chan, 2).astype(np.float32)
    scale = 1.0 if kind == "fif" else 1e-13  # Tesla for .con
    raw = RawData(data=rng.randn(n_chan, int(1000 * (t + 2))
                                 ).astype(np.float32) * scale,
                  sample_rate=1000.0,
                  ch_names=[f"MEG{k:03d}" for k in range(n_chan)],
                  positions=positions, ch_kinds=[1] * n_chan)
    if kind == "fif":
        write_fif(meg_dir / f"{stem}_meg.fif", raw)
    else:
        from brainmagick_tpu.studies.kit import write_kit
        write_kit(meg_dir / f"{stem}_meg.con", raw)


@pytest.fixture(params=["fif", "con"])
def gwilliams_root(tmp_path, request):
    root = tmp_path / "gwilliams"
    write_gwilliams_fixture(root, request.param)
    cache = tmp_path / "fake_cache"
    cache.mkdir()
    with env.temporary(studies={"gwilliams2022": root}, cache=cache):
        yield root


GOLDEN_CSV = Path(__file__).parent / "golden" / "gwilliams_events.csv"


def _parse_golden_fixture(tmp_path: Path) -> pd.DataFrame:
    root = tmp_path / "gwilliams_golden"
    write_gwilliams_fixture(root, "fif")  # events identical for .con
    cache = tmp_path / "gwilliams_golden_cache"
    cache.mkdir(parents=True, exist_ok=True)
    with env.temporary(studies={"gwilliams2022": root}, cache=cache):
        from brainmagick_tpu import studies
        rec = next(studies.register["gwilliams2022"].iter())
        df = rec.events().copy()
    # machine-dependent tmp prefix -> keep the basename only
    if "filepath" in df.columns:
        df["filepath"] = df["filepath"].map(
            lambda p: Path(p).name if isinstance(p, str) and p else p)
    return df.reset_index(drop=True)


def test_gwilliams_events_golden(tmp_path):
    """The BIDS events.tsv parser's exact typed-event output is pinned
    by a committed CSV (matching broderick/brennan/schoffelen)."""
    df = _parse_golden_fixture(tmp_path)
    golden = pd.read_csv(GOLDEN_CSV)
    assert sorted(df.columns) == sorted(golden.columns)
    assert len(df) == len(golden)
    for col in golden.columns:
        got, want = df[col], golden[col]
        if pd.api.types.is_numeric_dtype(want) and not \
                pd.api.types.is_bool_dtype(want):
            np.testing.assert_allclose(
                pd.to_numeric(got).to_numpy(dtype=np.float64),
                want.to_numpy(dtype=np.float64),
                atol=1e-9, equal_nan=True, err_msg=col)
        else:
            assert got.fillna("").astype(str).tolist() == \
                want.fillna("").astype(str).tolist(), col


def test_gwilliams_pipeline(gwilliams_root):
    from brainmagick_tpu import studies

    recs = list(studies.register["gwilliams2022"].iter())
    assert len(recs) == 1
    rec = recs[0]
    assert rec.recording_uid == "01_session0_story0"

    raw = rec.raw()
    assert raw.n_channels == 16
    assert raw.sample_rate == 1000.0

    events = rec.events()
    assert {"word", "sound", "block"} <= set(events.kind)
    words = events[events.kind == "word"]
    assert list(words.word) == (SENTENCES[0].split()
                                + SENTENCES[1].split())
    # sequence info extracted: word_index restarts per sentence
    assert list(words.word_index[:6]) == [0, 1, 2, 3, 4, 5]
    assert words.word_sequence.iloc[0] == SENTENCES[0]
    # blocks by sentence
    blocks = events[events.kind == "block"]
    assert len(blocks) == 2
    # sound filepath resolved (lowercased stem + real extension)
    sounds = events[events.kind == "sound"]
    assert all(Path(f).exists() for f in sounds.filepath)

    # preprocessing runs through the XLA kernels and caches
    pre = rec.preprocessed(100)
    assert pre.sample_rate == 100
    assert abs(pre.data.shape[1] - raw.n_times // 10) <= 1


if __name__ == "__main__":
    import sys
    import tempfile
    if "--regen" in sys.argv:
        with tempfile.TemporaryDirectory() as td:
            out = _parse_golden_fixture(Path(td))
        GOLDEN_CSV.parent.mkdir(exist_ok=True)
        out.to_csv(GOLDEN_CSV, index=False)
        print(f"wrote {GOLDEN_CSV} ({len(out)} rows)")
