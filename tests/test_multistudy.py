"""Heterogeneous multi-study training: 273ch MEG + 64ch EEG jointly,
with channel padding and spatial-attention masking of padded sensors
(the paper's multi-dataset capability)."""

import numpy as np
import pytest

from brainmagick_tpu import dataset as dset
from brainmagick_tpu import train as bm_train

from test_solver import tiny_args


@pytest.mark.slow
def test_roundrobin_multistudy(tmp_cache):
    datasets = dset.get_datasets(
        selections=[{"study": "fake"}, {"study": "fakeeeg"}],
        n_recordings=4, test_ratio=0.3, valid_ratio=0.2, sample_rate=120,
        condition=1.0, tmin=-0.2, tmax=1.0, features=["WordLength"],
        min_n_blocks_per_split=1, num_workers=1)
    recs = [d.recording for d in datasets.train.datasets]
    studies = [r.study_name() for r in recs]
    # round-robin interleave of the two selections
    assert studies == ["fake", "fakeeeg", "fake", "fakeeeg"]
    # subject indices unique across studies
    assert len({(r.study_name(), r.subject_uid) for r in recs}) == 4
    assert sorted(r.subject_index for r in recs) == [0, 1, 2, 3]

    item_meg = datasets.train.datasets[0][0]
    item_eeg = datasets.train.datasets[1][0]
    # both padded to the max sensor count (273)
    assert item_meg.meg.shape[0] == item_eeg.meg.shape[0] == 273
    # EEG rows beyond 64 are zero-padded with invalid positions
    assert (item_eeg.meg[64:] == 0).all()
    assert (item_eeg.positions[64:] == -0.1).all()
    assert (item_eeg.positions[:64] != -0.1).any()


@pytest.mark.slow
def test_joint_training(tmp_cache, tmp_path):
    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.selections["fakeeeg"] = {"study": "fakeeeg"}
    args.dset.selections = ["fake", "fakeeeg"]
    args.dset.n_recordings = 4
    solver = bm_train.get_solver(args)
    # subjects span both studies
    assert solver.model.n_subjects == 4
    best = solver.train()
    assert np.isfinite(best)
    assert "test" in solver.history[-1]
