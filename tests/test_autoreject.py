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
