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

# -- rich golden corpus ------------------------------------------------------
# Multi-session / multi-story fixture exercising the annotation edge
# cases the eval(description)-style parse implies
# (/root/reference/bm/studies/gwilliams2022.py:111-136 +
# bm/events.py:198-258): punctuation/apostrophes/case in words, phoneme
# rows (phoneme_id derived per (sequence_id, word_index) group),
# PRE-SET word_index / phoneme_id that must NOT be overwritten, and
# mixed-case sound filenames going through the rsplit('.', 2) lowercase
# resolution.

RICH_STORIES = {
    "0": [
        "the Old lighthouse keeper lit his lamp at dusk",
        "don't you think it's rather late for visitors",
        "Mr. Brook's dog barked twice then fell asleep",
        "a well-known sailor waved from the rain-soaked pier",
        "Why did the bell ring asked the child",
        "nobody answered so she climbed the spiral stairs alone",
    ],
    "1": [
        "I'm certain the map was drawn before the war",
        "three ravens circled the tower's highest broken window",
        "she whispered hold fast and the rope held",
        "the tide turned early that cold October morning",
        "an old chart showed rocks where none existed",
    ],
}


def write_gwilliams_rich_fixture(root: Path) -> None:
    """sub-01 x sessions {0,1} x stories {0,1} (session 1 repeats story
    0, like the real MEG-MASC's two identical sessions) = 3 recordings."""
    download = root / "download"
    download.mkdir(parents=True)
    pd.DataFrame({"participant_id": ["sub-01"]}).to_csv(
        download / "participants.tsv", sep="\t", index=False)

    sound_names = {  # mixed-case payloads, lowercased on-disk files
        "0": "stimuli/audio/story0.WAV.wav",
        "1": "stimuli/audio/STORY1.Wav.wav",
    }
    for story, sentences in RICH_STORIES.items():
        n_words = sum(len(s.split()) for s in sentences)
        _write_wav(download / "stimuli" / "audio" / f"story{story}.wav",
                   n_words * 0.4 + len(sentences) * 2.0 + 4.0)

    recordings = [("0", "0"), ("0", "1"), ("1", "0")]
    for session, story in recordings:
        rows = []
        t = 1.0
        sentences = RICH_STORIES[story]
        rows.append(dict(onset=t, duration=30.0, trial_type=repr(dict(
            kind="sound", sound=sound_names[story]))))
        for seq_id, sentence in enumerate(sentences):
            words = sentence.split()
            # one sentence per story arrives with word_index ALREADY in
            # the annotations (must be preserved, not recomputed)
            preset_index = seq_id == 1
            for wi, word in enumerate(words):
                payload = dict(kind="word", word=word,
                               sequence_id=seq_id, condition="sentence")
                if preset_index:
                    payload["word_index"] = wi + 5  # deliberate offset
                rows.append(dict(onset=t, duration=0.25,
                                 trial_type=repr(payload)))
                # 2 phonemes per word; the first word of sentence 2
                # carries preset phoneme_id values
                for pi, ph in enumerate(("B", "AH0")):
                    pp = dict(kind="phoneme", phoneme=ph,
                              sequence_id=seq_id, word_index=wi)
                    if seq_id == 2 and wi == 0:
                        pp["phoneme_id"] = 10 + pi
                    rows.append(dict(onset=t + 0.05 + 0.1 * pi,
                                     duration=0.1, trial_type=repr(pp)))
                t += 0.4
            t += 2.0

        meg_dir = download / "sub-01" / f"ses-{session}" / "meg"
        meg_dir.mkdir(parents=True, exist_ok=True)
        stem = f"sub-01_ses-{session}_task-{story}"
        pd.DataFrame(rows).to_csv(meg_dir / f"{stem}_events.tsv",
                                  sep="\t", index=False)
        rng = np.random.RandomState(7)
        raw = RawData(
            data=rng.randn(4, int(1000 * (t + 2))).astype(np.float32),
            sample_rate=1000.0,
            ch_names=[f"MEG{k:03d}" for k in range(4)],
            positions=rng.rand(4, 2).astype(np.float32),
            ch_kinds=[1] * 4)
        write_fif(meg_dir / f"{stem}_meg.fif", raw)


def _parse_golden_fixture(tmp_path: Path) -> pd.DataFrame:
    root = tmp_path / "gwilliams_golden"
    write_gwilliams_rich_fixture(root)
    cache = tmp_path / "gwilliams_golden_cache"
    cache.mkdir(parents=True, exist_ok=True)
    dfs = []
    with env.temporary(studies={"gwilliams2022": root}, cache=cache):
        from brainmagick_tpu import studies
        recs = list(studies.register["gwilliams2022"].iter())
        assert len(recs) == 3  # ses-0 x {story0, story1} + ses-1 story0
        for rec in recs:
            df = rec.events().copy()
            df["recording_uid"] = rec.recording_uid
            dfs.append(df)
    df = pd.concat(dfs, ignore_index=True)
    # machine-dependent tmp prefix -> keep the basename only
    if "filepath" in df.columns:
        df["filepath"] = df["filepath"].map(
            lambda p: Path(p).name if isinstance(p, str) and p else p)
    return df.reset_index(drop=True)


def test_gwilliams_events_golden(tmp_path):
    """The BIDS events.tsv parser's exact typed-event output is pinned
    by a committed CSV (matching broderick/brennan's strength): 3
    recordings, punctuation, phonemes, preset-index preservation."""
    df = _parse_golden_fixture(tmp_path)
    golden = pd.read_csv(GOLDEN_CSV)
    assert sorted(df.columns) == sorted(golden.columns)
    assert len(df) == len(golden)
    # structural spot checks (guard the golden itself against a
    # silently-degenerate regen)
    words = df[df.kind == "word"]
    assert {"don't", "Mr.", "well-known", "I'm",
            "tower's"} <= set(words.word)
    # preset word_index preserved (sentence 1 of each story starts at 5)
    s1 = words[(words.word_sequence.str.startswith("don't"))
               & (words.recording_uid == "01_session0_story0")]
    assert list(s1.word_index) == list(range(5, 5 + len(s1)))
    # derived word_index restarts at 0 elsewhere
    s0 = words[(words.word_sequence.str.startswith("the Old"))
               & (words.recording_uid == "01_session0_story0")]
    assert list(s0.word_index) == list(range(len(s0)))
    # phoneme_id: derived 0,1 per word; preset 10,11 kept for the
    # flagged word (sentence 2, word 0)
    ph = df[df.kind == "phoneme"]
    assert set(ph.phoneme_id.unique()) == {0.0, 1.0, 10.0, 11.0}
    # mixed-case sound payloads resolved to lowercase on-disk files
    sounds = df[df.kind == "sound"]
    assert set(sounds.filepath) == {"story0.wav", "story1.wav"}
    # the two sessions of story 0 parse identically (minus uid)
    a = df[df.recording_uid == "01_session0_story0"]
    b = df[df.recording_uid == "01_session1_story0"]
    pd.testing.assert_frame_equal(
        a.drop(columns="recording_uid").reset_index(drop=True),
        b.drop(columns="recording_uid").reset_index(drop=True))
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
