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


def test_gather_epochs_bf16_is_rne_of_fp32():
    """bf16 assembly == assemble-fp32-then-round (bit exact, incl.
    baseline correction, channel padding, and NaN)."""
    rng = np.random.RandomState(1)
    raw = (rng.randn(12, 5000) * np.logspace(-6, 3, 12)[:, None]
           ).astype(np.float32)
    raw[3, 77] = np.nan
    starts = rng.randint(0, 5000 - 100, 7)
    f32 = batch_gather_epochs(raw, starts, n_times=100, out_channels=16,
                              baseline_len=20)
    bf16 = batch_gather_epochs(raw, starts, n_times=100, out_channels=16,
                               baseline_len=20, dtype="bfloat16")
    assert str(bf16.dtype) == "bfloat16"
    expect = f32.astype("bfloat16")
    nan = np.isnan(f32)
    assert np.array_equal(bf16.view(np.uint16)[~nan],
                          expect.view(np.uint16)[~nan])
    assert np.isnan(bf16.astype(np.float32))[nan].all()
    assert (bf16[:, 12:].astype(np.float32) == 0).all()


def test_gather_track_bf16_is_rne_of_fp32():
    rng = np.random.RandomState(2)
    track = rng.randn(5, 1000).astype(np.float32)
    starts = np.array([0, 100, 900 - 50])
    f32 = batch_gather_track(track, starts, n_times=50)
    bf16 = batch_gather_track(track, starts, n_times=50, dtype="bfloat16")
    assert np.array_equal(bf16.view(np.uint16),
                          f32.astype("bfloat16").view(np.uint16))


def test_gather_bf16_numpy_fallback_matches_native():
    """The numpy fallback (non-contiguous / no lib) rounds identically."""
    rng = np.random.RandomState(3)
    raw = rng.randn(4, 500).astype(np.float32)
    starts = np.array([0, 250], dtype=np.int64)
    native = batch_gather_epochs(raw, starts, 64, out_channels=6,
                                 baseline_len=8, dtype="bfloat16")
    # float64 raw forces the numpy path (raw_ok fails on dtype)
    fallback = batch_gather_epochs(raw.astype(np.float64), starts, 64,
                                   out_channels=6, baseline_len=8,
                                   dtype="bfloat16")
    assert str(fallback.dtype) == "bfloat16"
    np.testing.assert_array_equal(native.view(np.uint16),
                                  fallback.view(np.uint16))


def test_gather_bounds_checked():
    raw = np.zeros((4, 100), dtype=np.float32)
    with pytest.raises(IndexError):
        batch_gather_epochs(raw, np.array([90]), n_times=20)


def test_gather_bounds_checked_numpy_fallback():
    """The fallback must match native semantics: IndexError, not a
    silent short read / broadcast error (float64 forces the fallback)."""
    raw = np.zeros((4, 100), dtype=np.float64)
    with pytest.raises(IndexError):
        batch_gather_epochs(raw, np.array([90]), n_times=20)
    with pytest.raises(IndexError):
        batch_gather_epochs(raw, np.array([-1]), n_times=20)
    with pytest.raises(IndexError):
        batch_gather_track(raw, np.array([95]), n_times=20)


def test_concurrent_build_race_safe(tmp_path):
    """N processes all building from a cold .so must all succeed (the
    regression: a shared tmp filename made racing builders corrupt or
    miss each other's rename and fall back to numpy for the process
    lifetime)."""
    import subprocess
    import sys
    from brainmagick_tpu.native import gather as g
    lib = g._LIB
    backup = lib.read_bytes() if lib.exists() else None
    if lib.exists():
        lib.unlink()
    try:
        code = ("from brainmagick_tpu.native import is_available; "
                "import sys; sys.exit(0 if is_available() else 1)")
        procs = [subprocess.Popen([sys.executable, "-c", code])
                 for _ in range(4)]
        rcs = [p.wait(timeout=180) for p in procs]
        assert rcs == [0, 0, 0, 0], f"racing builders failed: {rcs}"
        assert lib.exists()
    finally:
        if backup is not None and not lib.exists():
            lib.write_bytes(backup)


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


def test_dataset_get_batch_bf16(tmp_cache):
    """dataset.get_batch(dtype='bfloat16') == fp32 batch rounded, and the
    mask/positions/indices stay exact."""
    from brainmagick_tpu import dataset as dset

    recs = dset._extract_recordings([{"study": "fake"}], n_recordings=1)
    recs = [dset._preload(r, sample_rate=120) for r in recs]
    fact = dset.SegmentDataset.Factory(
        condition=1.0, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"], meg_dimension=280, event_mask=True)
    ds = dset.ConcatDataset([fact.apply(r) for r in recs])
    idx = np.array([0, 3, len(ds) - 1])
    f32 = ds.get_batch(idx)
    bf16 = ds.get_batch(idx, dtype="bfloat16")
    assert str(bf16.meg.dtype) == "bfloat16"
    assert str(bf16.features.dtype) == "bfloat16"
    np.testing.assert_array_equal(bf16.meg.view(np.uint16),
                                  f32.meg.astype("bfloat16").view(np.uint16))
    np.testing.assert_array_equal(
        bf16.features.view(np.uint16),
        f32.features.astype("bfloat16").view(np.uint16))
    np.testing.assert_array_equal(bf16.features_mask, f32.features_mask)
    np.testing.assert_array_equal(bf16.positions, f32.positions)


def test_loader_assemble_dtype(tmp_cache):
    """Loader(assemble_dtype='bfloat16') yields wire-format batches whose
    to_device(transfer_dtype='bfloat16') is a no-op cast."""
    from brainmagick_tpu import dataset as dset
    from brainmagick_tpu.loader import Loader

    recs = dset._extract_recordings([{"study": "fake"}], n_recordings=1)
    recs = [dset._preload(r, sample_rate=120) for r in recs]
    fact = dset.SegmentDataset.Factory(
        condition=1.0, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"], meg_dimension=280, event_mask=True)
    ds = dset.ConcatDataset([fact.apply(r) for r in recs])
    loader = Loader(ds, batch_size=4, num_workers=1,
                    assemble_dtype="bfloat16")
    batch, pad_w = next(iter(loader))
    assert str(batch.meg.dtype) == "bfloat16"
    assert str(batch.features.dtype) == "bfloat16"
    arrays = batch.to_device("bfloat16")
    assert str(arrays["meg"].dtype) == "bfloat16"
    # fp32 loader on the same rows rounds to the same wire bits
    ref = Loader(ds, batch_size=4, num_workers=1)
    ref_batch, _ = next(iter(ref))
    np.testing.assert_array_equal(
        np.asarray(batch.meg).view(np.uint16),
        ref_batch.meg.astype("bfloat16").view(np.uint16))


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