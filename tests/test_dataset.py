"""Dataset layer tests (mirrors bm/test_dataset.py coverage)."""

import numpy as np
import pytest

from brainmagick_tpu import dataset as dset
from brainmagick_tpu import studies


@pytest.fixture()
def fake_recordings(tmp_cache):
    recs = dset._extract_recordings([{"study": "fake"}], n_recordings=2)
    return [dset._preload(r, sample_rate=120) for r in recs]


def test_extract_recordings_indexes(tmp_cache):
    recs = dset._extract_recordings([{"study": "fake"}], n_recordings=4)
    assert [r.recording_index for r in recs] == [0, 1, 2, 3]
    assert [r.subject_index for r in recs] == [0, 1, 2, 3]


def test_factory_stride(fake_recordings):
    rec = fake_recordings[0]
    fact = dset.SegmentDataset.Factory(
        condition=3.0, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"], meg_dimension=280)
    data = fact.apply(rec)
    assert data is not None
    item = data[0]
    assert item.meg.shape == (280, 361)
    assert item.features.shape == (1, 361)
    assert item.features_mask.shape == (1, 361)
    assert item.positions.shape == (280, 2)
    # padded channels marked invalid
    assert (item.positions[273:] == studies.INVALID_POSITION).all()
    assert (item.positions[:273] != studies.INVALID_POSITION).any()


def test_factory_condition_query(fake_recordings):
    rec = fake_recordings[0]
    fact = dset.SegmentDataset.Factory(
        condition="word", tmin=-0.1, tmax=0.5, sample_rate=120,
        features=["WordLength"])
    data = fact.apply(rec)
    assert len(data) > 10
    item = data[0]
    assert item.meg.shape[-1] == item.features.shape[-1] == 73


def test_baseline_correction(fake_recordings):
    rec = fake_recordings[0]
    kwargs = dict(condition=3.0, tmin=-0.5, tmax=2.5, sample_rate=120,
                  features=["WordLength"])
    with_bl = dset.SegmentDataset.Factory(baseline=(None, 0), **kwargs)
    without = dset.SegmentDataset.Factory(baseline=None, **kwargs)
    a = with_bl.apply(rec)[0].meg
    b = without.apply(rec)[0].meg
    # baseline window mean removed per channel
    assert np.abs(a[:, :61].mean(axis=1)).max() < 1e-4
    assert np.abs(b[:, :61].mean(axis=1)).max() > 1e-4


def test_block_containment(fake_recordings):
    rec = fake_recordings[0]
    events = rec.events()
    blocks_df = events[events.kind == "block"]
    blocks = [(b.start, b.start + b.duration)
              for b in blocks_df.itertuples()][:3]
    blocks = [(s, min(e, rec.raw().duration)) for s, e in blocks]
    fact = dset.SegmentDataset.Factory(
        condition=0.5, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"])
    data = fact.apply(rec, blocks=blocks)
    if data is not None:
        for idx in range(len(data)):
            start, stop = data._bounds_times(idx)
            assert any(s <= start and stop <= e + 0.5 for s, e in blocks)


def test_collate_and_slicing(fake_recordings):
    rec = fake_recordings[0]
    fact = dset.SegmentDataset.Factory(
        condition=3.0, tmin=-0.5, tmax=2.5, sample_rate=120,
        features=["WordLength"], meg_dimension=273)
    data = fact.apply(rec)
    batch = dset.SegmentBatch.collate([data[i] for i in range(4)])
    assert batch.meg.shape[0] == 4
    assert len(batch._event_lists) == 4
    sub = batch[np.array([True, False, True, False])]
    assert len(sub) == 2
    assert len(sub._event_lists) == 2
    one = batch[1:2]
    assert one.meg.shape[0] == 1


def test_get_datasets(tmp_cache):
    datasets = dset.get_datasets(
        selections=[{"study": "fake"}], n_recordings=2,
        test_ratio=0.3, valid_ratio=0.2, sample_rate=120,
        condition=1.0, tmin=-0.5, tmax=2.5,
        features=["WordLength"], extra_test_features=["WordHash"],
        min_n_blocks_per_split=1, num_workers=1,
        test={"condition": "word"})
    assert len(datasets.train) > 0
    assert len(datasets.valid) > 0
    assert len(datasets.test) > 0
    # test split uses word-aligned epochs + the extra feature
    test_item = datasets.test[0]
    assert test_item.features.shape[0] == 2
    train_item = datasets.train[0]
    assert train_item.features.shape[0] == 1
    # all recordings padded to the same channel count
    assert train_item.meg.shape[0] == test_item.meg.shape[0] == 273


def test_split_determinism(tmp_cache):
    kwargs = dict(
        selections=[{"study": "fake"}], n_recordings=2, test_ratio=0.3,
        valid_ratio=0.2, sample_rate=120, condition=0.5, tmin=-0.2,
        tmax=1.0, features=["WordLength"], min_n_blocks_per_split=1,
        num_workers=1)
    a = dset.get_datasets(**kwargs)
    b = dset.get_datasets(**kwargs)
    for split in ("train", "valid", "test"):
        da, db = getattr(a, split), getattr(b, split)
        assert len(da) == len(db)
        np.testing.assert_array_equal(da.datasets[0].event_samples,
                                      db.datasets[0].event_samples)
