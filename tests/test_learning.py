"""End-to-end learning sanity: when the MEG actually contains a linear
projection of the target features, the CLIP pipeline must learn to
retrieve segments far above chance. Catches sign/alignment/loss-wiring
bugs that shape tests cannot."""

import dataclasses

import numpy as np
import pytest

from brainmagick_tpu import train as bm_train
from brainmagick_tpu.config import MainConfig
from brainmagick_tpu.dataset import (ConcatDataset, Datasets,
                                     SegmentBatch, SegmentDataset)
from brainmagick_tpu.utils import Frequency


N_FEAT = 8


class _FakeFeature:
    """Module-level so the fitted scaler stays picklable."""
    name = "synthetic"
    dimension = N_FEAT
    output_dimension = N_FEAT
    categorical = False
    normalizable = True


class _FakeBuilder(dict):
    dimension = N_FEAT
    output_dimension = N_FEAT
    event_mask = False

    def get_slice(self, name, model_output=False):
        return slice(0, N_FEAT)

    def __reduce__(self):
        return (_rebuild_fake_builder, ())


def _rebuild_fake_builder():
    b = _FakeBuilder()
    b["synthetic"] = _FakeFeature()
    return b


class SyntheticDataset:
    """Plants features into the 'meg' via a fixed random projection."""

    def __init__(self, n: int, n_chan: int = 24, n_feat: int = 8,
                 n_times: int = 48, snr: float = 1.0, seed: int = 0,
                 recording_index: int = 0):
        rng = np.random.RandomState(seed)
        self.mix = np.random.RandomState(777).randn(
            n_chan, n_feat).astype(np.float32)  # shared across splits
        self.feats = rng.randn(n, n_feat, n_times).astype(np.float32)
        noise = rng.randn(n, n_chan, n_times).astype(np.float32)
        self.meg = snr * np.einsum(
            "cf,nft->nct", self.mix, self.feats) + noise
        self.positions = np.random.RandomState(5).rand(
            n_chan, 2).astype(np.float32)
        self.recording_index = recording_index
        # minimal FeaturesBuilder stand-in for solver.used_features
        from brainmagick_tpu.features import FeaturesBuilder
        import pandas as pd
        self.featbuilder_events = pd.DataFrame(
            [dict(kind="word", start=0.1, duration=0.2, modality="audio",
                  language="en", word="x", word_index=0,
                  word_sequence="x", condition="sentence")])

    def __len__(self):
        return len(self.meg)

    def get_batch(self, indices, with_events=False):
        indices = np.asarray(indices, dtype=np.int64)
        n = len(indices)
        return SegmentBatch(
            meg=self.meg[indices], features=self.feats[indices],
            features_mask=np.ones((n, 1, self.feats.shape[-1]),
                                  dtype=bool),
            subject_index=np.zeros(n, dtype=np.int32),
            recording_index=np.full(n, self.recording_index,
                                    dtype=np.int32),
            positions=np.broadcast_to(
                self.positions, (n,) + self.positions.shape).copy())

    def __getitem__(self, i):
        return self.get_batch([i])[0]


@pytest.mark.slow
def test_clip_learns_planted_projection(tmp_cache, tmp_path):
    import jax

    n_feat, n_chan, n_times = N_FEAT, 24, 48
    train_set = SyntheticDataset(256, n_chan, n_feat, n_times, seed=1)
    valid_set = SyntheticDataset(64, n_chan, n_feat, n_times, seed=2)
    test_set = SyntheticDataset(64, n_chan, n_feat, n_times, seed=3)

    args = MainConfig()
    args.cache = str(tmp_cache)
    args.out_dir = str(tmp_path / "outputs")
    args.optim.loss = "clip"
    args.optim.epochs = 6
    args.optim.batch_size = 32
    args.optim.lr = 3e-3
    args.dset.tmin = 0.0
    args.dset.tmax = n_times / 120.0
    args.task.offset_meg_ms = 0
    args.early_stop_patience = 10
    args.eval_every = 100  # skip the WER stage (needs WordHash)
    args.simpleconv.update(
        hidden=32, depth=2, kernel_size=3, skip=True, batch_norm=True,
        gelu=True, subject_layers=True, subject_dim=0, complex_out=True,
        merger=False, initial_linear=16)

    # hand-build the solver around the synthetic datasets
    from brainmagick_tpu.models import SimpleConv
    from brainmagick_tpu.solver import Solver
    import optax

    builder = _FakeBuilder()
    builder["synthetic"] = _FakeFeature()

    datasets = Datasets(train=_wrap(train_set, builder),
                        valid=_wrap(valid_set, builder),
                        test=_wrap(test_set, builder))
    model = SimpleConv(in_channels=dict(meg=n_chan), out_channels=n_feat,
                       hidden=dict(meg=32), n_subjects=1,
                       **{k: v for k, v in args.simpleconv.items()
                          if k != "hidden"})
    solver = Solver(args=args, datasets=datasets, model=model,
                    optimizer=optax.adam(args.optim.lr))
    solver.train()

    losses = [h["valid"]["loss"] for h in solver.history]
    chance = np.log(32)  # -log(1/batch) for random retrieval
    assert losses[-1] < 0.55 * chance, (
        f"CLIP failed to learn planted projection: valid loss "
        f"{losses[-1]:.3f} vs chance {chance:.3f}")
    # retrieval accuracy on held-out data beats chance by a wide margin
    batch, _ = next(iter(solver.loaders["test"]))
    est, out, _, _ = solver.process_batch(batch)
    import jax.numpy as jnp
    probs = solver.clip_loss.apply(
        {"params": solver.state["params"]["loss"]}, jnp.asarray(est),
        jnp.asarray(out), method=solver.clip_loss.get_probabilities)
    top1 = (np.asarray(probs).argmax(1) == np.arange(len(est))).mean()
    assert top1 > 0.3, f"top-1 retrieval {top1:.2f} ~ chance (1/32)"


def _wrap(dset, builder):
    concat = ConcatDataset.__new__(ConcatDataset)
    concat.datasets = [dset]
    concat.cumulative_sizes = np.cumsum([0, len(dset)])
    dset.features = builder

    class _Rec:
        subject_index = 0
        recording_index = dset.recording_index
        subject_uid = "synthetic"

        @staticmethod
        def study_name():
            return "synthetic"

        def empty_copy(self):
            return self

    dset.recording = _Rec()
    return concat
