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

SENTENCES = {1: "de kat slaapt nu", 2: "een hond rent snel weg"}
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


def _make_log(path: Path) -> list:
    """Synthetic Presentation log for an audio run: per sentence a
    fixation, a ZINNEN context marker, Start File / Audio onset /
    End of file. Returns (time, code) pairs of fix/context rows."""
    rows1, rows2 = [], []
    sync = []

    def add(event_type, code, t):
        rows1.append(f"1\t1\t{event_type}\t{code}\t{_t(t)}\t0\t0\t0\t0\t0\t0")
        if event_type in ("Picture", "Sound", "Nothing"):
            rows2.append("0\tx")

    t = 1.0
    for uid, sentence in SENTENCES.items():
        add("Picture", f"FIX {uid}", t)
        sync.append((t, 20))
        t += 0.5
        add("Picture", f"ZINNEN {uid}", t)
        sync.append((t, 10))
        t += 0.5
        add("Sound", f"Start File {uid:03d}.wav", t)
        add("Nothing", "Audio onset", t + 0.01)
        t += 4.0
        add("Nothing", "End of file", t)
        t += 0.5
    block1 = "header\n" + LOG_HEADER + "\n" + "\n".join(rows1)
    block2 = LOG2_HEADER + "\n" + "\n".join(rows2)
    text = ("junk preamble\nScenario - mock\n" + block1 + "\n\n\n" + block2
            + "\n")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)
    return sync


@pytest.fixture()
def mous_root(tmp_path):
    root = tmp_path / "mous"
    download = root / "download"
    subject = "sub-A2002"

    # stimuli + textgrids + wavs
    stim_lines = [f"{uid} {s}" for uid, s in SENTENCES.items()]
    (download / "stimuli").mkdir(parents=True)
    (download / "stimuli" / "stimuli.txt").write_text(
        "\n".join(stim_lines) + "\n")
    for uid, sentence in SENTENCES.items():
        _write_wav(download / "stimuli" / "audio_files" / f"{uid:03d}.wav")
        _write_textgrid(download / "derivatives" / "textgrids"
                        / ("EQ_Ramp_Int2_Int1LPF%.3i.TextGrid" % uid),
                        sentence)

    # presentation log
    sync = _make_log(download / "sourcedata" / "meg_task"
                     / f"{subject}-MEG-MOUS-Aud.log")

    # raw npz stand-in with trigger events aligned to the log (+0.5s)
    shift = 0.5
    events = np.array(
        [[int((t + shift) * SFREQ), 0, code] for t, code in sync]
        + [[int(60 * SFREQ), 0, 5]], dtype=np.int64)
    rng = np.random.RandomState(0)
    data = rng.randn(12, int(61 * SFREQ)).astype(np.float32)
    positions = rng.rand(12, 2).astype(np.float32)
    meg_dir = download / subject / "meg"
    meg_dir.mkdir(parents=True)
    np.savez(meg_dir / "testmeg-raw.npz", data=data, sample_rate=SFREQ,
             positions=positions, events=events)

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
    assert list(words.word) == (SENTENCES[1].split()
                                + SENTENCES[2].split())
    # word sequences match the stimuli and carry their uid
    assert set(words.word_sequence) == set(SENTENCES.values())
    assert set(words.sequence_uid.astype(int)) == {1, 2}
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
    assert len(blocks) == 2
    assert set(blocks.uid.astype(str)) <= {"1", "2", "1.0", "2.0"}
    # sounds point at existing wavs with valid durations
    sounds = events[events.kind == "sound"]
    assert len(sounds) == 2
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
    assert list(words.word) == (SENTENCES[1].split()
                                + SENTENCES[2].split())
    assert words.iloc[0].start == pytest.approx(2.51, abs=0.02)
    raw_back = rec.raw()
    assert raw_back.n_channels == len(data)
    assert raw_back.sample_rate == SFREQ


def test_events_golden(mous_root):
    """Golden-file regression for the parsed events schema/content
    (bm/studies/test_api.py cached_assert_df_equal approach — the file
    self-bootstraps on first run and is committed)."""
    from brainmagick_tpu import studies

    rec = next(studies.register["schoffelen2019"].iter(modality="audio"))
    events = rec.events()
    keep = ["start", "duration", "kind", "word", "word_index",
            "sequence_uid"]
    got = events[keep].round(4)
    golden = Path(__file__).parent / "golden" / "schoffelen_events.csv"
    if not golden.exists():
        golden.parent.mkdir(exist_ok=True)
        got.to_csv(golden, index=False)
        pytest.skip("bootstrapped golden file — rerun to compare")
    expected = pd.read_csv(golden)
    assert len(got) == len(expected), "event count changed vs golden file"
    for col in ("kind", "word"):
        assert got[col].fillna("").astype(str).tolist() == \
            expected[col].fillna("").astype(str).tolist(), f"{col} changed"
    np.testing.assert_allclose(got.start.values, expected.start.values,
                               atol=1e-3)


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
