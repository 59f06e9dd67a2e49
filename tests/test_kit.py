"""Native KIT/Yokogawa .con reader/writer (studies/kit.py) — the
reference needs MNE's KIT reader for the MEG-MASC raws
(bm/studies/gwilliams2022.py:96-106)."""

import hashlib
from pathlib import Path

import numpy as np
import pytest

from brainmagick_tpu.studies import kit
from brainmagick_tpu.studies.api import RawData
from brainmagick_tpu.studies.fake import grid_positions


def _mixed_raw(n_meg=10, n_times=2000, sfreq=1000.0, seed=0) -> RawData:
    rng = np.random.RandomState(seed)
    meg = rng.randn(n_meg, n_times).astype(np.float32) * 1e-13  # Tesla
    stim = np.zeros((1, n_times), dtype=np.float32)
    stim[0, 300:400] = 1.0
    misc = rng.randn(1, n_times).astype(np.float32) * 0.1  # volts
    positions = np.concatenate(
        [grid_positions(n_meg), [[-0.1, -0.1]] * 2]).astype(np.float32)
    return RawData(
        data=np.concatenate([meg, stim, misc]),
        sample_rate=sfreq,
        ch_names=[f"MEG {k:03d}" for k in range(n_meg)]
        + ["MISC 010", "MISC 011"],
        positions=positions,
        ch_kinds=[kit.KIND_MEG] * n_meg + [kit.KIND_STIM,
                                           kit.KIND_OTHER])


def test_con_roundtrip(tmp_path):
    raw = _mixed_raw()
    con = tmp_path / "sub-01_ses-0_task-0_meg.con"
    kit.write_kit(con, raw)
    back = kit.read_kit(con)
    assert back.sample_rate == raw.sample_rate
    assert back.ch_kinds == raw.ch_kinds
    # int16 quantization at sens 1e-12 T/V, 5V/2^16 -> ~7.6e-17 T steps
    np.testing.assert_allclose(back.data[:10], raw.data[:10], atol=1e-16)
    np.testing.assert_allclose(back.data[10:], raw.data[10:], atol=1e-4)
    for axis in range(2):
        corr = np.corrcoef(back.positions[:10, axis],
                           raw.positions[:10, axis])[0, 1]
        assert abs(corr) > 0.9
    assert (back.positions[10:] == -0.1).all()


def test_con_info_fields(tmp_path):
    raw = _mixed_raw()
    con = tmp_path / "x.con"
    kit.write_kit(con, raw, system_name="New York University 208ch")
    info = kit.read_con_info(con)
    assert info.channel_count == 12
    assert info.sample_count == 2000
    assert info.sample_rate == 1000.0
    assert info.system_name.startswith("New York University")
    assert (info.ch_types[:10] == kit.CH_AXIAL_GRADIOMETER).all()
    assert info.ch_types[10] == kit.CH_TRIGGER
    assert info.amp_gain == 1.0


def test_con_rejects_non_continuous(tmp_path):
    raw = _mixed_raw(n_times=100)
    con = tmp_path / "x.con"
    kit.write_kit(con, raw)
    buf = bytearray(con.read_bytes())
    import struct
    acq_off = struct.unpack_from("<i", buf, kit.SLOT_ACQ)[0]
    struct.pack_into("<i", buf, acq_off, 2)  # evoked
    con.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="continuous"):
        kit.read_kit(con)


def test_golden_layout_stability(tmp_path):
    raw = _mixed_raw(n_meg=3, n_times=50, seed=42)
    con = tmp_path / "golden.con"
    kit.write_kit(con, raw)
    digest = hashlib.sha256(con.read_bytes()).hexdigest()
    expected = (Path(__file__).parent / "golden"
                / "kit_golden.txt").read_text().strip()
    assert digest == expected, (
        "KIT on-disk layout changed; if intentional, update "
        f"tests/golden/kit_golden.txt to {digest}")
