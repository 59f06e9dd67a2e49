"""Native CTF .ds reader/writer (studies/ctf.py) — the reference needs
MNE for these (bm/studies/schoffelen2019/schoffelen2019.py:27-34)."""

import hashlib

import numpy as np
import pytest

from brainmagick_tpu.studies import ctf
from brainmagick_tpu.studies.api import RawData
from brainmagick_tpu.studies.fake import grid_positions


def _mixed_raw(n_meg=9, n_times=3000, sfreq=1200.0, seed=0) -> RawData:
    """MEG + EEG + stim + ADC channels with realistic magnitudes."""
    rng = np.random.RandomState(seed)
    meg = rng.randn(n_meg, n_times).astype(np.float32) * 1e-12  # Tesla
    eeg = rng.randn(1, n_times).astype(np.float32) * 1e-5       # Volts
    stim = np.zeros((1, n_times), dtype=np.float32)
    stim[0, 500:800] = 20
    stim[0, 1500:1800] = 10
    adc = rng.randn(1, n_times).astype(np.float32)
    positions = np.concatenate(
        [grid_positions(n_meg + 1), [[-0.1, -0.1]] * 2]).astype(np.float32)
    return RawData(
        data=np.concatenate([meg, eeg, stim, adc]),
        sample_rate=sfreq,
        ch_names=[f"MLC{k:02d}-4304" for k in range(n_meg)]
        + ["EEG001", "UPPT001", "UADC001"],
        positions=positions,
        ch_kinds=[ctf.KIND_MEG] * n_meg + [ctf.KIND_EEG, ctf.KIND_STIM,
                                           ctf.KIND_OTHER])


def test_ds_roundtrip(tmp_path):
    raw = _mixed_raw()
    ds = tmp_path / "sub-A2002_task-auditory.ds"
    ctf.write_ctf(ds, raw, trial_samples=1000)  # 3 trials
    back = ctf.read_ctf(ds)
    assert back.sample_rate == raw.sample_rate
    assert back.ch_names == raw.ch_names
    assert back.ch_kinds == raw.ch_kinds
    # int quantization with gain 1e9 * 2^20 keeps ~1e-15 T resolution
    np.testing.assert_allclose(back.data[:9], raw.data[:9], atol=2e-15)
    np.testing.assert_allclose(back.data[9:], raw.data[9:], atol=0.5)
    np.testing.assert_array_equal(back.data[10], raw.data[10])  # stim ints
    # spatial layout recovered up to the azimuthal projection
    for axis in range(2):
        corr = np.corrcoef(back.positions[:10, axis],
                           raw.positions[:10, axis])[0, 1]
        assert abs(corr) > 0.9
    # non-spatial channels carry the invalid marker
    assert (back.positions[10:] == -0.1).all()


def test_ds_multifile_meg4(tmp_path):
    """Continuation files (.1_meg4, ...) concatenate along time."""
    raw = _mixed_raw(n_times=4000)
    ds = tmp_path / "big.ds"
    ctf.write_ctf(ds, raw, trial_samples=1000)  # 4 trials in one file
    meg4 = ds / "big.meg4"
    body = meg4.read_bytes()
    trial_bytes = (len(body) - 8) // 4
    # split: 1 trial in the main file, 3 in the continuation
    meg4.write_bytes(body[:8 + trial_bytes])
    (ds / "big.1_meg4").write_bytes(ctf.MEG4_MAGIC
                                    + body[8 + trial_bytes:])
    back = ctf.read_ctf(ds)
    np.testing.assert_allclose(back.data[:9], raw.data[:9], atol=2e-15)


def test_ds_truncated_meg4_rejected(tmp_path):
    raw = _mixed_raw(n_times=2000)
    ds = tmp_path / "trunc.ds"
    ctf.write_ctf(ds, raw, trial_samples=1000)
    meg4 = ds / "trunc.meg4"
    body = meg4.read_bytes()
    # drop half a trial: whole-trial accounting must name the bytes
    meg4.write_bytes(body[:len(body) - 1000])
    with pytest.raises(ValueError, match="trailing bytes"):
        ctf.read_ctf(ds)
    # whole missing trial: count mismatch vs the res4 promise
    trial_bytes = 4 * 12 * 1000
    meg4.write_bytes(body[:8 + trial_bytes])
    with pytest.raises(ValueError, match="1 trials.*promises 2"):
        ctf.read_ctf(ds)
    # EXTRA whole trial: also a clear diagnostic, not a broadcast crash
    meg4.write_bytes(body + body[8:8 + trial_bytes])
    with pytest.raises(ValueError, match="3 trials.*promises 2"):
        ctf.read_ctf(ds)


def test_res4_header_fields(tmp_path):
    raw = _mixed_raw(n_times=2000)
    ds = tmp_path / "hdr.ds"
    ctf.write_ctf(ds, raw, trial_samples=500, run_name="run-07")
    res4 = ctf.read_res4(ds / "hdr.res4")
    assert res4.no_samples == 500
    assert res4.no_trials == 4
    assert res4.no_channels == 12
    assert res4.sample_rate == 1200.0
    assert res4.run_name == "run-07"
    assert res4.ch_names[-2] == "UPPT001"
    assert res4.sensors["sensor_type"][0] == ctf.SENSOR_TYPE_MEG
    assert res4.sensors["sensor_type"][-2] == ctf.SENSOR_TYPE_STIM


def test_res4_bad_magic(tmp_path):
    p = tmp_path / "x.res4"
    p.write_bytes(b"NOTMEG4\x00" + b"\x00" * 4000)
    with pytest.raises(ValueError, match="magic"):
        ctf.read_res4(p)


def test_golden_layout_stability(tmp_path):
    """The writer's byte layout is pinned: reader and writer share the
    offset table, so only a deliberate layout change may alter this
    hash (then regenerate: see tests/golden/ctf_golden.txt)."""
    raw = _mixed_raw(n_meg=3, n_times=100, seed=42)
    ds = tmp_path / "golden.ds"
    ctf.write_ctf(ds, raw, trial_samples=50, run_name="golden")
    digest = hashlib.sha256(
        (ds / "golden.res4").read_bytes()
        + (ds / "golden.meg4").read_bytes()).hexdigest()
    from pathlib import Path
    expected = (Path(__file__).parent / "golden"
                / "ctf_golden.txt").read_text().strip()
    assert digest == expected, (
        "CTF on-disk layout changed; if intentional, update "
        f"tests/golden/ctf_golden.txt to {digest}")


def test_schoffelen_read_raw_ds(tmp_path):
    """read_raw on a .ds: stim triggers split out, MEG picks only."""
    from brainmagick_tpu.studies import schoffelen2019 as sch

    raw = _mixed_raw()
    ds = tmp_path / "meg.ds"
    ctf.write_ctf(ds, raw, trial_samples=1000)
    got_raw, events = sch.read_raw(ds)
    assert got_raw.n_channels == 9  # MEG only
    assert got_raw.sample_rate == 1200.0
    np.testing.assert_array_equal(events[:, 0], [500, 1500])
    np.testing.assert_array_equal(events[:, 2], [20, 10])
