"""Mock-filesystem tests for the Brennan2019 and Broderick2019 EEG
adapters (the reference tests neither — fabricated .mat/JSON layouts
prove the parsers end to end)."""

import json
import wave
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from scipy.io import savemat

from brainmagick_tpu.env import env

WORDS = ("alice was beginning to get very tired of sitting by her sister "
         "on the bank").split()


def _write_wav(path: Path, seconds: float = 3.0) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    n = int(16000 * seconds)
    sig = (np.sin(2 * np.pi * 180 * np.arange(n) / 16000) * 15000
           ).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(sig.tobytes())


def write_brennan_fixture(root: Path) -> None:
    """Deterministic brennan2019 study tree (shared by the pytest
    fixture and the golden-CSV regeneration entry point below)."""
    download = root / "download"
    (download / "proc").mkdir(parents=True)

    n_trials = 2129
    sfreq = 500.0
    rng = np.random.RandomState(0)
    # proc: trl matrix [start_sample, stop_sample, offset, order]
    starts = (np.arange(n_trials) * 150 + 500).astype(float)
    trl = np.stack([starts, starts + 120, np.zeros(n_trials),
                    np.ones(n_trials), np.arange(n_trials, dtype=float)],
                   axis=1)
    proc = dict(trl=trl, tot_trials=float(n_trials), tot_chans=61.0,
                varnames=np.array(["segment", "order"], dtype=object),
                impedence=dict(bads=np.array([], dtype=object)),
                rejections=dict(badchans=np.array([], dtype=object)))
    savemat(download / "proc" / "S01.mat", dict(proc=proc))

    # AliceChapterOne-EEG.csv: one row per trial
    n_words = len(WORDS)
    story = pd.DataFrame({
        "Word": [WORDS[k % n_words] for k in range(n_trials)],
        "Position": [k % 10 for k in range(n_trials)],
        "Sentence": [k // 10 for k in range(n_trials)],
        "Segment": [1 + (k // 1100) for k in range(n_trials)],
        "onset": [0.1] * n_trials,
        "offset": [0.4] * n_trials,
    })
    story.to_csv(download / "AliceChapterOne-EEG.csv", index=False)

    for seg in (1, 2):
        _write_wav(download / "audio"
                   / f"DownTheRabbitHoleFinal_SoundFile{seg}.wav",
                   seconds=700.0 / 16)  # keep tiny but long enough

    # raw EEG struct
    n_samp = int(sfreq * 700)
    labels = [str(i + 1 + (i >= 28)) for i in range(60)] + ["VEOG", "AUD"]
    raw = dict(
        hdr=dict(Fs=sfreq, nChans=62.0, nSamples=float(n_samp),
                 label=np.array(labels, dtype=object),
                 chantype=np.array(["eeg"] * 62, dtype=object),
                 chanunit=np.array(["uV"] * 62, dtype=object),
                 nSamplesPre=0.0, nTrials=1.0),
        fsample=sfreq,
        time=np.arange(n_samp) / sfreq,
        sampleinfo=np.array([1.0, float(n_samp)]),
        trial=rng.randn(62, n_samp).astype(np.float32),
    )
    savemat(download / "S01.mat", dict(raw=raw))


@pytest.fixture()
def brennan_root(tmp_path):
    root = tmp_path / "brennan"
    write_brennan_fixture(root)
    cache = tmp_path / "fake_cache"
    cache.mkdir()
    with env.temporary(studies={"brennan2019": root}, cache=cache):
        yield root


BRENNAN_GOLDEN_CSV = (Path(__file__).parent / "golden"
                      / "brennan_events.csv")


def _parse_brennan_golden_fixture(tmp_path: Path) -> pd.DataFrame:
    root = tmp_path / "brennan_golden"
    write_brennan_fixture(root)
    cache = tmp_path / "brennan_golden_cache"
    cache.mkdir(parents=True, exist_ok=True)
    with env.temporary(studies={"brennan2019": root}, cache=cache):
        from brainmagick_tpu import studies
        rec = next(studies.register["brennan2019"].iter())
        df = rec.events().copy()
    # machine-dependent tmp prefix -> keep the basename only
    if "filepath" in df.columns:
        df["filepath"] = df["filepath"].map(
            lambda p: Path(p).name if isinstance(p, str) and p else p)
    return df.reset_index(drop=True)


def test_brennan_events_golden(tmp_path):
    """The .mat/story parser's exact event output is pinned by a
    committed CSV (like broderick's) — any rewrite of the brennan
    trl/story alignment must keep it green."""
    df = _parse_brennan_golden_fixture(tmp_path)
    golden = pd.read_csv(BRENNAN_GOLDEN_CSV)
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


def test_brennan_pipeline(brennan_root):
    from brainmagick_tpu import studies

    recs = list(studies.register["brennan2019"].iter())
    assert len(recs) == 1
    rec = recs[0]
    raw = rec.raw()
    assert raw.data.shape[0] == 60  # EEG picks only
    assert raw.sample_rate == 500.0
    events = rec.events()
    assert {"word", "sound", "block"} <= set(events.kind)
    words = events[events.kind == "word"]
    assert len(words) == 2129
    assert words.word.iloc[0] == "alice"
    # trial start samples converted to seconds
    assert words.start.iloc[0] == pytest.approx(500 / 500.0)
    sounds = events[events.kind == "sound"]
    assert len(sounds) == 2
    for s in sounds.itertuples():
        assert Path(s.filepath).exists()


def test_brennan_montage_geometry(brennan_root):
    """The layout is the easycap-M10 equidistant montage, not a generic
    grid: vertex site 1 at the layout center, constant ring structure
    (6/12/18/24), reference site 29 absent from the data channels."""
    from brainmagick_tpu import studies
    from brainmagick_tpu.studies.brennan2019 import (easycap_m10,
                                                     m10_positions)

    table = easycap_m10()
    assert len(table) == 61
    assert table[1][0] == 0.0                     # vertex (phi moot)
    # ring membership: sites 2-7, 8-19, 20-37, 38-61
    assert all(table[s][0] == 23.0 for s in range(2, 8))
    assert all(table[s][0] == 46.0 for s in range(8, 20))
    assert all(table[s][0] == 69.0 for s in range(20, 38))
    assert all(table[s][0] == 92.0 for s in range(38, 62))
    # each ring starts at the front (phi=90)
    for first in (2, 8, 20, 38):
        assert table[first][1] == 90.0

    rec = next(iter(studies.register["brennan2019"].iter()))
    raw = rec.raw()
    assert "29" not in raw.ch_names               # online reference site
    pos = raw.positions
    assert ((0 <= pos) & (pos <= 1)).all()
    # vertex electrode "1" sits at the center of the normalized layout
    vertex = pos[raw.ch_names.index("1")]
    np.testing.assert_allclose(vertex, [0.5, 0.5], atol=0.02)
    # equidistance: nearest-neighbor spacing is tight around its median
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = d.min(axis=1)
    assert nn.max() / nn.min() < 2.0, "not an equidistant arrangement"
    # left/right symmetry: sites mirrored about the front-back axis
    x = pos[:, 0]
    assert abs(np.median(x) - 0.5) < 0.05
    # direct name->position consistency
    np.testing.assert_allclose(pos, m10_positions(raw.ch_names))


GOLDEN_CSV = Path(__file__).parent / "golden" / "broderick_events.csv"


def write_broderick_gentle_fixture(private: Path) -> None:
    """Deterministic gentle-JSON + transcript exercising every parser
    branch: failed alignments (case != success), ``<unk>`` aligned
    words, filler words absent from the transcript, a trailing
    unmatched word, and punctuation-only transcript tokens.

    Shared by the golden regression test and the golden regeneration
    hook (``python tests/test_brennan_broderick.py --regen``)."""
    private.mkdir(parents=True, exist_ok=True)
    nouns = ["man", "sea", "boat", "fish", "line", "sail", "wind", "boy",
             "shark", "hand"]
    verbs = ["saw", "held", "pulled", "watched", "loved", "caught",
             "lost", "found", "heard", "felt"]
    sentences = [f"The old {nouns[k % 10]} {verbs[(k * 3) % 10]} the "
                 f"big {nouns[(k * 7 + 3) % 10]}." for k in range(120)]
    # a punctuation-only token the transcript tokenizer must drop
    sentences[10] = sentences[10].replace(" saw ", " -- saw ")
    (private / "oldman_run1.txt").write_text(" ".join(sentences))

    t = 0.5
    entries = []
    for k, word in enumerate(" ".join(sentences)
                             .replace(".", "").replace("--", "").split()):
        dur = 0.05 * len(word) + 0.1
        phones = [dict(phone=f"{c}_B", duration=round(0.04 + 0.01 * (n % 3), 3))
                  for n, c in enumerate(word[:3])]
        entry = dict(case="success", word=word, alignedWord=word,
                     start=round(t, 3), end=round(t + dur, 3),
                     phones=phones, startOffset=7 * k, endOffset=7 * k + 3)
        if k % 37 == 5:
            entry["case"] = "not-found-in-audio"
        elif k % 41 == 7:
            entry["alignedWord"] = "<unk>"
        entries.append(entry)
        t += dur + 0.12
        if k == 50:  # filler word the transcript does not contain
            entries.append(dict(case="success", word="uh", alignedWord="uh",
                                start=round(t, 3), end=round(t + 0.2, 3),
                                phones=[dict(phone="ah_B", duration=0.2)],
                                startOffset=0, endOffset=2))
            t += 0.3
    # trailing word after the last transcript match
    entries.append(dict(case="success", word="applause",
                        alignedWord="applause", start=round(t, 3),
                        end=round(t + 0.5, 3),
                        phones=[dict(phone="ae_B", duration=0.5)],
                        startOffset=0, endOffset=8))
    (private / "align1.json").write_text(json.dumps(dict(words=entries)))


def _parse_golden_fixture(tmp_path: Path) -> pd.DataFrame:
    root = tmp_path / "broderick_golden"
    write_broderick_gentle_fixture(root / "download" / "private")
    with env.temporary(studies={"broderick2019": root}):
        from brainmagick_tpu.studies.broderick2019 import _BroderickMetadata
        df = _BroderickMetadata()("1")
    # machine-dependent tmp prefix -> keep the basename only
    df["filepath"] = df["filepath"].map(
        lambda p: Path(p).name if isinstance(p, str) else p)
    return df


def test_broderick_parser_golden(tmp_path):
    """The gentle parser's exact output is pinned by a committed CSV —
    any rewrite of _parse_json/_parse_txt/_process must keep it green."""
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


if __name__ == "__main__":
    import sys
    import tempfile
    if "--regen" in sys.argv:
        with tempfile.TemporaryDirectory() as td:
            out = _parse_golden_fixture(Path(td))
        GOLDEN_CSV.parent.mkdir(exist_ok=True)
        out.to_csv(GOLDEN_CSV, index=False)
        print(f"wrote {GOLDEN_CSV} ({len(out)} rows)")
        with tempfile.TemporaryDirectory() as td:
            out = _parse_brennan_golden_fixture(Path(td))
        out.to_csv(BRENNAN_GOLDEN_CSV, index=False)
        print(f"wrote {BRENNAN_GOLDEN_CSV} ({len(out)} rows)")


@pytest.fixture()
def broderick_root(tmp_path):
    root = tmp_path / "broderick"
    private = root / "download" / "private"
    private.mkdir(parents=True)
    eeg_dir = root / "download" / "Natural Speech" / "EEG" / "Subject1"
    eeg_dir.mkdir(parents=True)

    # the reference parser asserts >450 aligned words per run
    nouns = ["man", "sea", "boat", "fish", "line", "sail", "wind", "boy",
             "shark", "hand"]
    verbs = ["saw", "held", "pulled", "watched", "loved", "caught",
             "lost", "found", "heard", "felt"]
    sentences = [f"The old {nouns[k % 10]} {verbs[(k * 3) % 10]} the "
                 f"big {nouns[(k * 7 + 3) % 10]}." for k in range(100)]
    text = " ".join(sentences)
    (private / "oldman_run1.txt").write_text(text)

    # gentle-style alignment JSON
    t = 0.5
    entries = []
    for word in text.replace(".", "").split():
        dur = 0.05 * len(word) + 0.1
        phones = [dict(phone=f"{c}_B", duration=dur / 2) for c in word[:2]]
        entries.append(dict(case="success", word=word, alignedWord=word,
                            start=round(t, 3), end=round(t + dur, 3),
                            phones=phones, startOffset=0, endOffset=1))
        t += dur + 0.12
    (private / "align1.json").write_text(json.dumps(dict(words=entries)))
    _write_wav(private / "audio1.wav", seconds=t + 1)

    mat = dict(fs=np.array([[128.0]]),
               eegData=np.random.RandomState(0).randn(
                   int(128 * (t + 2)), 128).astype(np.float32),
               mastoids=np.zeros((int(128 * (t + 2)), 2)))
    savemat(eeg_dir / "Subject1_Run1.mat", mat)

    cache = tmp_path / "fake_cache"
    cache.mkdir()
    with env.temporary(studies={"broderick2019": root}, cache=cache):
        yield root


def test_broderick_pipeline(broderick_root):
    from brainmagick_tpu import studies

    recs = list(studies.register["broderick2019"].iter())
    assert len(recs) == 20  # 1 subject x 20 runs
    rec = recs[0]
    assert rec.recording_uid == "1_run1"
    raw = rec.raw()
    assert raw.data.shape[0] == 128
    assert raw.sample_rate == 128.0
    events = rec.events()
    assert {"word", "phoneme", "sound", "block"} <= set(events.kind)
    words = events[events.kind == "word"]
    assert words.word.iloc[0].lower() == "the"
    # sentence segmentation found multiple sequences
    assert words.sequence_id.nunique() >= 3
    blocks = events[events.kind == "block"]
    assert len(blocks) >= 3
