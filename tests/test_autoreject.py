"""Interpolation-based artifact repair tests (bm/autoreject.py parity)."""

import numpy as np

from brainmagick_tpu.autoreject import AutoRejectDrop
from brainmagick_tpu.studies.fake import grid_positions


def _epochs_with_artifacts(n=60, c=16, t=50, seed=0):
    rng = np.random.RandomState(seed)
    epochs = rng.randn(n, c, t).astype(np.float32)
    # inject huge artifacts into a few (epoch, channel) pairs
    bad = [(3, 2), (10, 5), (11, 5), (20, 9)]
    for e, ch in bad:
        epochs[e, ch] += 50 * np.sin(np.linspace(0, 6, t))
    return epochs, bad


def test_fit_transform_repairs_artifacts():
    epochs, bad = _epochs_with_artifacts()
    positions = grid_positions(epochs.shape[1])
    ar = AutoRejectDrop()
    repaired, log = ar.fit(epochs, positions).transform(
        epochs, return_log=True)
    for e, ch in bad:
        assert log[e, ch], f"artifact at ({e},{ch}) not detected"
        # repaired channel is back to noise scale
        assert np.abs(repaired[e, ch]).max() < 10
    # false-positive repairs on pure noise stay rare (<5% of entries)
    clean = np.ones_like(log)
    for e, ch in bad:
        clean[e, ch] = False
    touched = (repaired != epochs).any(axis=-1)
    fp_rate = touched[clean].mean()
    assert fp_rate < 0.05, f"too many clean channels repaired: {fp_rate}"


def test_n_interpolate_caps_repairs_per_epoch():
    """Only the worst `n_interpolate` bad channels may be repaired
    (regression for the round-1 max/min bug that interpolated all)."""
    rng = np.random.RandomState(7)
    n, c, t = 40, 12, 50
    epochs = rng.randn(n, c, t).astype(np.float32)
    # epoch 5: six bad channels with increasing severity
    bad_channels = [1, 3, 4, 7, 8, 10]
    for rank, ch in enumerate(bad_channels):
        epochs[5, ch] += (30 + 10 * rank) * np.sin(np.linspace(0, 6, t))
    positions = grid_positions(c)
    ar = AutoRejectDrop(n_interpolate=2)
    repaired, log = ar.fit(epochs, positions).transform(
        epochs, return_log=True)
    assert log[5, bad_channels].all(), "artifacts not detected"
    touched = np.flatnonzero((repaired[5] != epochs[5]).any(axis=-1))
    assert len(touched) == 2, f"expected 2 repairs, got {list(touched)}"
    # and they are the two *worst* offenders (highest injected amplitude)
    assert set(touched) == {8, 10}


def test_dataset_autoreject_hook(tmp_cache):
    from brainmagick_tpu import dataset as dset

    recs = dset._extract_recordings([{"study": "fake"}], n_recordings=1)
    rec = dset._preload(recs[0], sample_rate=120)
    fact = dset.SegmentDataset.Factory(
        condition=3.0, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"], autoreject=True, meg_dimension=280)
    data = fact.apply(rec)
    assert data._meg_override is not None
    item = data[0]
    assert item.meg.shape == (280, 361)
    assert np.isfinite(item.meg).all()
