"""Native gatherer tests: correctness vs the item-wise path + throughput."""

import time

import numpy as np
import pytest

from brainmagick_tpu.native import (batch_gather_epochs,
                                    batch_gather_track, is_available)


def test_native_builds():
    assert is_available(), "g++ build of the native gatherer failed"


def test_gather_epochs_matches_numpy():
    rng = np.random.RandomState(0)
    raw = rng.randn(12, 5000).astype(np.float32)
    starts = rng.randint(0, 5000 - 100, 7)
    out = batch_gather_epochs(raw, starts, n_times=100, out_channels=16,
                              baseline_len=20)
    assert out.shape == (7, 16, 100)
    for b, s in enumerate(starts):
        epoch = raw[:, s:s + 100]
        epoch = epoch - epoch[:, :20].mean(axis=1, keepdims=True)
        np.testing.assert_allclose(out[b, :12], epoch, rtol=1e-5,
                                   atol=1e-6)
        assert (out[b, 12:] == 0).all()


def test_gather_bounds_checked():
    raw = np.zeros((4, 100), dtype=np.float32)
    with pytest.raises(IndexError):
        batch_gather_epochs(raw, np.array([90]), n_times=20)


def test_gather_track():
    rng = np.random.RandomState(0)
    track = rng.randn(5, 1000).astype(np.float32)
    starts = np.array([0, 100, 900 - 50])
    out = batch_gather_track(track, starts, n_times=50)
    for b, s in enumerate(starts):
        np.testing.assert_array_equal(out[b], track[:, s:s + 50])


def test_dataset_batched_fetch_matches_itemwise(tmp_cache):
    from brainmagick_tpu import dataset as dset

    recs = dset._extract_recordings([{"study": "fake"}], n_recordings=2)
    recs = [dset._preload(r, sample_rate=120) for r in recs]
    fact = dset.SegmentDataset.Factory(
        condition=1.0, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"], meg_dimension=280, event_mask=True)
    ds = dset.ConcatDataset([fact.apply(r) for r in recs])
    idx = np.array([0, 5, len(ds) - 1, 3, len(ds) - 4])
    batch = ds.get_batch(idx, with_events=True)
    items = dset.SegmentBatch.collate([ds[int(i)] for i in idx])
    np.testing.assert_allclose(batch.meg, items.meg, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batch.features, items.features, atol=1e-6)
    np.testing.assert_array_equal(batch.features_mask, items.features_mask)
    np.testing.assert_array_equal(batch.subject_index, items.subject_index)
    np.testing.assert_array_equal(batch.recording_index,
                                  items.recording_index)
    np.testing.assert_allclose(batch.positions, items.positions)
    assert len(batch._event_lists) == len(items._event_lists)
    for a, b in zip(batch._event_lists, items._event_lists):
        # both start with the DataSlice epoch marker, then the events
        assert [e.kind for e in a] == [e.kind for e in b]
        assert a[0].kind == "dataslice"
        assert a[0].start == b[0].start


@pytest.mark.slow
def test_gather_throughput():
    rng = np.random.RandomState(0)
    raw = rng.randn(273, 200_000).astype(np.float32)
    starts = rng.randint(0, 200_000 - 361, 256)
    batch_gather_epochs(raw, starts, 361, 280, baseline_len=61)  # warmup
    t0 = time.perf_counter()
    for _ in range(5):
        out = batch_gather_epochs(raw, starts, 361, 280, baseline_len=61)
    native_dt = (time.perf_counter() - t0) / 5
    gbps = out.nbytes / native_dt / 1e9
    print(f"native gather: {native_dt * 1e3:.1f} ms/batch "
          f"({gbps:.1f} GB/s)")
    assert gbps > 0.5  # loose sanity bound (CI machines vary)