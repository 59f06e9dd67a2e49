"""FIF reader/writer roundtrip tests."""

import numpy as np

from brainmagick_tpu.studies.api import RawData
from brainmagick_tpu.studies.fake import grid_positions
from brainmagick_tpu.studies.io import read_fif, write_fif


def test_fif_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    raw = RawData(data=rng.randn(7, 2500).astype(np.float32) * 1e-12,
                  sample_rate=1000.0,
                  ch_names=[f"MEG{k:03d}" for k in range(7)],
                  positions=grid_positions(7))
    path = tmp_path / "test-raw.fif"
    write_fif(path, raw, buffer_samples=700)  # multiple buffers + remainder
    back = read_fif(path)
    assert back.sample_rate == 1000.0
    assert back.ch_names == raw.ch_names
    np.testing.assert_allclose(back.data, raw.data, rtol=1e-6)
    # positions survive up to the azimuthal projection (same ordering)
    assert (back.positions >= 0).all() and (back.positions <= 1).all()
    for axis in range(2):
        corr = np.corrcoef(back.positions[:, axis],
                           raw.positions[:, axis])[0, 1]
        assert abs(corr) > 0.9


def test_fif_missing_info(tmp_path):
    import pytest

    bad = tmp_path / "bad.fif"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_fif(bad)
