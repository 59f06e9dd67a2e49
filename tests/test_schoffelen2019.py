"""Schoffelen/MOUS pipeline test with a fully synthesized on-disk layout
(mirrors the reference's deep filesystem mock,
bm/studies/schoffelen2019/mock.py + test_schoffelen2019.py)."""

import wave
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from brainmagick_tpu.env import env
from brainmagick_tpu.phonemes import ph_dict

SENTENCES = {1: "de kat slaapt nu", 2: "een hond rent snel weg",
             3: "het kind leest een boek vandaag",
             4: "zij zingt elke ochtend vroeg in de tuin",
             5: "de oude man loopt langzaam naar huis",
             6: "wij eten vanavond verse vis met brood"}
# WOORDEN (word-list) stimuli: scrambled unrelated words, also wavs in
# the audio modality (reference relabeling preproc.py:89-136; selection
# audio_mous_wl filters condition == "word_list")
WORD_LISTS = {7: "appel stoel fiets water lamp",
              8: "maan glas deur zand vogel"}
ALL_STIMULI = {**SENTENCES, **WORD_LISTS}
SFREQ = 1200.0

LOG_HEADER = ("Subject\tTrial\tEvent Type\tCode\tTime\tTTime\tUncertainty"
              "\tDuration\tUncertainty\tReqTime\tReqDur")
LOG2_HEADER = "Uncertainty\tStimInfo"


def _write_wav(path: Path, seconds: float = 5.0) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    n = int(16000 * seconds)
    sig = (np.sin(2 * np.pi * 220 * np.arange(n) / 16000) * 20000
           ).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(sig.tobytes())


def _write_textgrid(path: Path, sentence: str) -> None:
    """Long-format TextGrid with ORT-MAU (words) and MAU (phonemes)."""
    words = sentence.split()
    t = 0.0
    word_entries, ph_entries = [], []
    ph_names = list(ph_dict)
    for k, word in enumerate(words):
        dur = 0.2 + 0.05 * len(word)
        word_entries.append((t, t + dur, word))
        n_ph = max(2, len(word) // 2)
        for j in range(n_ph):
            p0 = t + dur * j / n_ph
            p1 = t + dur * (j + 1) / n_ph
            ph_entries.append((p0, p1, ph_names[(k * 7 + j) % len(ph_names)]))
        t += dur + 0.15
    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"', "",
             "xmin = 0", f"xmax = {t}", "tiers? <exists>", "size = 2",
             "item []:"]
    for tier_idx, (tier, entries) in enumerate(
            [("ORT-MAU", word_entries), ("MAU", ph_entries)], 1):
        lines += [f"    item [{tier_idx}]:",
                  '        class = "IntervalTier"',
                  f'        name = "{tier}"',
                  "        xmin = 0", f"        xmax = {t}",
                  f"        intervals: size = {len(entries)}"]
        for j, (a, b, name) in enumerate(entries, 1):
            lines += [f"        intervals [{j}]:",
                      f"            xmin = {a}",
                      f"            xmax = {b}",
                      f'            text = "{name}"']
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines))


def _t(seconds: float) -> str:
    return str(int(round(seconds * 1e4)))


def _make_log(path: Path, visual: bool = False) -> list:
    """Synthetic Presentation log: per sentence a fixation, a
    ZINNEN/WOORDEN context marker, then (audio) Start File / Audio
    onset / End of file or (visual) one Picture row per word. The last
    two stimuli are WOORDEN word lists (condition relabeling,
    reference preproc.py:89-136), and QUESTION / Response / pause /
    blank / PULSE MODE rows exercise the rest of the relabel table.
    Returns (time, code) pairs of fix/context trigger rows."""
    rows1, rows2 = [], []
    sync = []

    def add(event_type, code, t, duration=0.0):
        rows1.append(f"1\t1\t{event_type}\t{code}\t{_t(t)}\t0\t0"
                     f"\t{_t(duration)}\t0\t0\t0")
        if event_type in ("Picture", "Sound", "Nothing"):
            rows2.append("0\tx")

    t = 1.0
    for uid, sentence in ALL_STIMULI.items():
        context = "WOORDEN" if uid in WORD_LISTS else "ZINNEN"
        add("Picture", f"FIX {uid}", t)
        sync.append((t, 20))
        t += 0.5
        add("Picture", f"{context} {uid}", t)
        sync.append((t, 10))
        t += 0.5
        if visual:
            for k, word in enumerate(sentence.split()):
                add("Picture", f"{uid * 10 + k} {word}", t, duration=0.3)
                t += 0.4
        else:
            add("Sound", f"Start File {uid:03d}.wav", t)
            add("Nothing", "Audio onset", t + 0.01)
            t += 4.0
            add("Nothing", "End of file", t)
        t += 0.5
        if uid == 3:
            # non-stimulus rows between trials: every relabel branch
            add("Picture", "QUESTION 1", t)
            t += 0.3
            add("Response", "Response 1", t)
            t += 0.2
            add("Picture", "", t)            # blank (empty code)
            t += 0.2
            add("Picture", "pause", t)       # pause code
            t += 0.2
            add("Picture", "17 PULSE MODE", t)  # word row -> pulse
            t += 0.3
    block1 = "header\n" + LOG_HEADER + "\n" + "\n".join(rows1)
    block2 = LOG2_HEADER + "\n" + "\n".join(rows2)
    text = ("junk preamble\nScenario - mock\n" + block1 + "\n\n\n" + block2
            + "\n")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)
    return sync


def write_mous_fixture(root: Path) -> None:
    """MOUS on-disk layout with an audio subject (sub-A2002) AND a
    visual subject (sub-V1001), sentences + WOORDEN word lists."""
    download = root / "download"

    # stimuli + textgrids + wavs (word lists are wavs too)
    stim_lines = [f"{uid} {s}" for uid, s in ALL_STIMULI.items()]
    (download / "stimuli").mkdir(parents=True)
    (download / "stimuli" / "stimuli.txt").write_text(
        "\n".join(stim_lines) + "\n")
    for uid, sentence in ALL_STIMULI.items():
        _write_wav(download / "stimuli" / "audio_files" / f"{uid:03d}.wav")
        _write_textgrid(download / "derivatives" / "textgrids"
                        / ("EQ_Ramp_Int2_Int1LPF%.3i.TextGrid" % uid),
                        sentence)

    for subject, visual in (("sub-A2002", False), ("sub-V1001", True)):
        task = "Vis" if visual else "Aud"
        sync = _make_log(download / "sourcedata" / "meg_task"
                         / f"{subject}-MEG-MOUS-{task}.log",
                         visual=visual)
        # raw npz stand-in with triggers aligned to the log (+0.5s)
        shift = 0.5
        events = np.array(
            [[int((t + shift) * SFREQ), 0, code] for t, code in sync]
            + [[int(60 * SFREQ), 0, 5]], dtype=np.int64)
        rng = np.random.RandomState(0)
        data = rng.randn(12, int(61 * SFREQ)).astype(np.float32)
        positions = rng.rand(12, 2).astype(np.float32)
        meg_dir = download / subject / "meg"
        meg_dir.mkdir(parents=True)
        np.savez(meg_dir / "testmeg-raw.npz", data=data,
                 sample_rate=SFREQ, positions=positions, events=events)


@pytest.fixture()
def mous_root(tmp_path):
    root = tmp_path / "mous"
    write_mous_fixture(root)
    cache = tmp_path / "fake_cache"
    cache.mkdir()
    with env.temporary(studies={"schoffelen2019": root}, cache=cache):
        yield root


def test_events_pipeline(mous_root):
    from brainmagick_tpu import studies

    recs = list(studies.register["schoffelen2019"].iter(modality="audio"))
    assert len(recs) == 1
    rec = recs[0]
    assert rec.modality == "audio"
    events = rec.events()

    kinds = set(events.kind)
    assert {"word", "phoneme", "sound", "block"} <= kinds
    words = events[events.kind == "word"]
    expected_words = [w for s in ALL_STIMULI.values() for w in s.split()]
    assert list(words.word) == expected_words
    # word sequences match the stimuli and carry their uid
    assert set(words.word_sequence) == set(ALL_STIMULI.values())
    assert set(words.sequence_uid.astype(int)) == set(ALL_STIMULI)
    # condition relabeling: sentence trials vs WOORDEN word lists
    # (the audio_mous_wl selection filters on this)
    assert set(words.condition) == {"sentence", "word_list"}
    wl_words = words[words.condition == "word_list"]
    assert list(wl_words.word) == [w for s in WORD_LISTS.values()
                                   for w in s.split()]
    # QUESTION / Response / pause / blank / PULSE MODE rows never
    # become events
    assert "PULSE" not in " ".join(words.word)
    # MEG-clock alignment: triggers are shifted +0.5s vs the log clock,
    # so the audio onset at log t=2.01 must land at meg t=2.51
    first_word = words.iloc[0]
    assert first_word.start == pytest.approx(2.51, abs=0.02)
    # phonemes carry valid inventory ids
    phonemes = events[events.kind == "phoneme"]
    assert len(phonemes) > len(words)
    assert phonemes.phoneme_id.between(0, len(ph_dict) - 1).all()
    # blocks: one per sound, uid = sequence_uid
    blocks = events[events.kind == "block"]
    assert len(blocks) == len(ALL_STIMULI)
    assert {int(float(u)) for u in blocks.uid} == set(ALL_STIMULI)
    # sounds point at existing wavs with valid durations
    sounds = events[events.kind == "sound"]
    assert len(sounds) == len(ALL_STIMULI)
    for s in sounds.itertuples():
        assert Path(s.filepath).exists()
        assert 0 < s.duration <= 5.0


def test_events_pipeline_through_ds(mous_root):
    """Same pipeline with the raw stored as a native CTF .ds directory
    (the real MOUS on-disk format) instead of the npz stand-in."""
    from brainmagick_tpu import studies
    from brainmagick_tpu.studies import ctf
    from brainmagick_tpu.studies.api import RawData

    meg_dir = mous_root / "download" / "sub-A2002" / "meg"
    payload = np.load(meg_dir / "testmeg-raw.npz")
    events = payload["events"]
    data = payload["data"]
    n_times = data.shape[1]
    stim = np.zeros((1, n_times), dtype=np.float32)
    for sample, _, code in events:
        stim[0, sample:sample + 300] = code
    raw = RawData(
        data=np.concatenate([data * 1e-12, stim]),
        sample_rate=float(payload["sample_rate"]),
        ch_names=[f"MLC{k:02d}" for k in range(len(data))] + ["UPPT001"],
        positions=np.concatenate(
            [payload["positions"], [[-0.1, -0.1]]]).astype(np.float32),
        ch_kinds=[ctf.KIND_MEG] * len(data) + [ctf.KIND_STIM])
    ctf.write_ctf(meg_dir / "sub-A2002_task-auditory_meg.ds", raw,
                  trial_samples=int(payload["sample_rate"]))
    (meg_dir / "testmeg-raw.npz").unlink()

    rec = next(studies.register["schoffelen2019"].iter(modality="audio"))
    assert str(rec.paths.raw).endswith(".ds")
    got = rec.events()
    words = got[got.kind == "word"]
    assert list(words.word) == [w for s in ALL_STIMULI.values()
                                for w in s.split()]
    assert words.iloc[0].start == pytest.approx(2.51, abs=0.02)
    raw_back = rec.raw()
    assert raw_back.n_channels == len(data)
    assert raw_back.sample_rate == SFREQ


GOLDEN_CSV = Path(__file__).parent / "golden" / "schoffelen_events.csv"
GOLDEN_COLS = ["recording_uid", "start", "duration", "kind", "word",
               "word_index", "sequence_uid", "condition", "phoneme_id",
               "modality", "word_sequence"]


def _parse_golden_events(tmp_path: Path) -> pd.DataFrame:
    """Both modalities' full parses, concatenated (audio: textgrid
    word/phoneme alignment + word lists; visual: per-word Picture rows
    + relabel edge cases)."""
    from brainmagick_tpu import studies

    root = tmp_path / "mous_golden"
    write_mous_fixture(root)
    cache = tmp_path / "mous_golden_cache"
    cache.mkdir(parents=True, exist_ok=True)
    dfs = []
    with env.temporary(studies={"schoffelen2019": root}, cache=cache):
        recs = list(studies.register["schoffelen2019"].iter())
        assert len(recs) == 2  # sub-V1001 (visual) + sub-A2002 (audio)
        for rec in recs:
            df = rec.events().copy()
            df["recording_uid"] = rec.recording_uid
            dfs.append(df)
    out = pd.concat(dfs, ignore_index=True)
    for col in GOLDEN_COLS:
        if col not in out.columns:
            out[col] = np.nan
    return out[GOLDEN_COLS].round(4)


def test_events_golden(tmp_path):
    """Golden-file regression pinning the full two-modality parse:
    sentences, WOORDEN word lists, phoneme alignment, condition
    relabeling (regen: python tests/test_schoffelen2019.py --regen)."""
    got = _parse_golden_events(tmp_path)
    expected = pd.read_csv(GOLDEN_CSV)
    assert list(got.columns) == list(expected.columns)
    assert len(got) == len(expected), "event count changed vs golden file"
    for col in GOLDEN_COLS:
        g, w = got[col], expected[col]
        if pd.api.types.is_numeric_dtype(w):
            np.testing.assert_allclose(
                pd.to_numeric(g).to_numpy(np.float64),
                w.to_numpy(np.float64), atol=1e-3, equal_nan=True,
                err_msg=col)
        else:
            assert g.fillna("").astype(str).tolist() == \
                w.fillna("").astype(str).tolist(), f"{col} changed"
    # structural guards against a silently-degenerate regen
    assert (got.condition == "word_list").sum() >= 20
    vis = got[got.recording_uid == "sub-V1001"]
    assert (vis[vis.kind == "word"].modality == "visual").all()
    assert len(vis[vis.kind == "word"]) == sum(
        len(s.split()) for s in ALL_STIMULI.values())
    aud = got[got.recording_uid == "sub-A2002"]
    assert (aud.kind == "phoneme").sum() > (aud.kind == "word").sum()


def test_fif_converted_raw(mous_root, tmp_path):
    """A FIF-converted MOUS recording (MEG + stim channel) feeds the same
    pipeline: triggers extracted from the stim channel."""
    from brainmagick_tpu.studies import schoffelen2019 as sch
    from brainmagick_tpu.studies.api import RawData
    from brainmagick_tpu.studies.io import write_fif

    payload = np.load(mous_root / "download" / "sub-A2002" / "meg"
                      / "testmeg-raw.npz")
    events = payload["events"]
    n_times = payload["data"].shape[1]
    stim = np.zeros(n_times, dtype=np.float32)
    for sample, _, code in events:
        stim[sample:sample + 300] = code
    data = np.concatenate([payload["data"], stim[None]])
    raw = RawData(
        data=data, sample_rate=float(payload["sample_rate"]),
        ch_names=[f"M{k}" for k in range(len(payload["data"]))] + ["STI101"],
        positions=np.concatenate([payload["positions"],
                                  [[-0.1, -0.1]]]).astype(np.float32),
        ch_kinds=[1] * len(payload["data"]) + [3])
    fif_path = tmp_path / "converted-raw.fif"
    write_fif(fif_path, raw)

    got_raw, got_events = sch.read_raw(fif_path)
    assert got_raw.n_channels == len(payload["data"])  # stim split out
    assert got_raw.sample_rate == float(payload["sample_rate"])
    # trigger onsets recovered exactly (codes 20/10 + final marker)
    np.testing.assert_array_equal(got_events[:, 0], events[:, 0])
    np.testing.assert_array_equal(got_events[:, 2], events[:, 2])


def test_events_filter(mous_root):
    from brainmagick_tpu import studies

    rec = next(studies.register["schoffelen2019"].iter(
        modality="audio", events_filter='condition == "sentence"'))
    filtered = rec.events(clean=True)
    assert (filtered.condition == "sentence").all()


def test_events_filter_word_list(mous_root):
    """The audio_mous_wl selection semantics: events_filter keeps only
    word-list trials (selections_definitions.yaml:1-20)."""
    from brainmagick_tpu import studies

    rec = next(studies.register["schoffelen2019"].iter(
        modality="audio", events_filter='condition == "word_list"'))
    filtered = rec.events(clean=True)
    words = filtered[filtered.kind == "word"]
    assert len(words) and (words.condition == "word_list").all()
    assert set(words.sequence_uid.astype(int)) == set(WORD_LISTS)


def test_visual_pipeline(mous_root):
    """Visual-modality subject: words from per-word Picture rows with
    durations, no sounds/phonemes, condition relabeling applied."""
    from brainmagick_tpu import studies

    recs = list(studies.register["schoffelen2019"].iter(
        modality="visual"))
    assert len(recs) == 1
    rec = recs[0]
    assert rec.modality == "visual"
    events = rec.events()
    words = events[events.kind == "word"]
    assert list(words.word) == [w for s in ALL_STIMULI.values()
                                for w in s.split()]
    assert (words.modality == "visual").all()
    assert (words.duration.values > 0).all()
    assert set(words.condition) == {"sentence", "word_list"}
    assert "sound" not in set(events.kind)
    # visual blocks split on word_index==0 sentence starts
    blocks = events[events.kind == "block"]
    assert len(blocks) == len(ALL_STIMULI)


if __name__ == "__main__":
    import sys
    import tempfile
    if "--regen" in sys.argv:
        with tempfile.TemporaryDirectory() as td:
            out = _parse_golden_events(Path(td))
        GOLDEN_CSV.parent.mkdir(exist_ok=True)
        out.to_csv(GOLDEN_CSV, index=False)
        print(f"wrote {GOLDEN_CSV} ({len(out)} rows)")
