"""Notebook/eval API: load trained solvers, streaming test metrics,
sentence-feature synthesis, evoked-response prediction.

Reference parity: bm/play.py:38-327. Loading by signature rebuilds the
full dataset/model from the stored config delta and loads the best
state; `get_test_metrics` streams per-recording metrics;
`SentenceFeatures` paints features for a typed sentence; `predict`
contrasts a sentence's prediction against a zero-features baseline.
"""

from __future__ import annotations

import logging
import pickle
import random
import typing as tp
from pathlib import Path

import numpy as np
import pandas as pd

from . import dataset as dset
from . import features as _features
from .config import MainConfig
from .solver import Solver
from .utils import Frequency

logger = logging.getLogger(__name__)


def get_solver_from_args(args: MainConfig, training: bool = False) -> Solver:
    from .train import get_solver
    return get_solver(args, training=training)


def _apply_delta(args: MainConfig, delta: tp.Dict[str, tp.Any]) -> MainConfig:
    from .train import parse_overrides
    tokens = [f"{k}={v!r}" for k, v in delta.items()]
    return parse_overrides(tokens, args)


def get_solver_from_sig(sig: str, out_dir: str = "./outputs",
                        override_args: tp.Optional[dict] = None,
                        training: bool = False) -> Solver:
    """Rebuild a solver from an XP signature: read the stored config
    delta from the checkpoint and reconstruct everything
    (bm/play.py:63-70)."""
    folder = Path(out_dir) / "xps" / sig
    ckpt = folder / "checkpoint.pkl"
    assert ckpt.exists(), f"No checkpoint at {ckpt}"
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    args = MainConfig(out_dir=out_dir)
    delta = dict(payload.get("delta", {}))
    for key, value in (override_args or {}).items():
        delta[key] = value
    args = _apply_delta(args, delta)
    args.out_dir = out_dir
    return get_solver_from_args(args, training=training)


def get_test_metrics(solver: Solver, trim_offset: int = 0,
                     metrics_constructor: tp.Optional[tp.List] = None,
                     reduce: bool = True,
                     datasets: tp.Optional[tp.List] = None
                     ) -> tp.Dict[str, tp.Any]:
    """Per-recording streaming metrics over the test set
    (bm/play.py:88-175; the DDP recording-sharding/broadcast machinery
    collapses — a single host streams all recordings, and each forward
    runs through the jitted mesh-sharded `solver.forward_batch`, so
    with a mesh every device works the test stage)."""
    test_datasets = datasets or solver.datasets.test.datasets
    order = list(range(len(test_datasets)))
    random.shuffle(order)
    if metrics_constructor is None:
        metrics_constructor = solver.get_metric_constructors()
    results: tp.Dict[str, tp.List[tp.Any]] = {
        ctor().name: [None] * len(test_datasets)
        for ctor in metrics_constructor}

    for dset_index in order:
        recording_dset = test_datasets[dset_index]
        loader = solver.make_loader(recording_dset)
        metrics = [ctor() for ctor in metrics_constructor]
        for batch, pad_weight in loader:
            estimate, gt, features_mask, keep = solver.forward_batch(
                batch, pad_weight)
            if not keep.any():
                continue
            estimate = estimate[keep][..., trim_offset:]
            gt = gt[keep][..., trim_offset:]
            features_mask = features_mask[keep][..., trim_offset:]
            for metric in metrics:
                metric.update(estimate.astype(np.float64),
                              gt.astype(np.float64), features_mask)
        for metric in metrics:
            results[metric.name][dset_index] = metric.get()

    for ctor in metrics_constructor:
        metric = ctor()
        vals = results[metric.name]
        assert all(v is not None for v in vals)
        if reduce:
            results[metric.name] = metric.reduce(vals)
        else:
            results[metric.name] = np.stack(vals)
    if reduce:
        # multi-process meshes: every process streamed only its own
        # rows — average the reduced scalars like the reference's
        # all-reduce (bm/solver.py:395; same as wer.py). Unreduced
        # per-recording arrays stay per-process.
        from .parallel import average_metrics_across_processes
        scalar = {k: v for k, v in results.items()
                  if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        results.update(average_metrics_across_processes(
            {k: float(v) for k, v in scalar.items()}))
    return results


class SentenceFeatures:
    """Paint features for a typed sentence: first word at 1s, duration
    0.1s/letter in [0.3, 0.8], 0.3s between words, 1s appended
    (bm/play.py:178-270)."""

    @classmethod
    def from_solver(cls, solver: Solver, **kwargs: tp.Any
                    ) -> "SentenceFeatures":
        dst = solver.args.dset
        return cls(dst.features, dict(dst.features_params),
                   sample_rate=dst.sample_rate, highpass=dst.highpass,
                   **kwargs)

    def __init__(self, features: tp.List[str], features_params: dict,
                 sample_rate: float, highpass: float = 0.0,
                 modality: str = "visual",
                 additional_time: float = 1.0) -> None:
        self._highpass = highpass
        self._sample_rate = Frequency(sample_rate)
        self._features = features
        self._features_params = features_params
        self._modality = modality
        self._additional_time = additional_time

    def _generate_events(self,
                         word_durations: tp.List[tp.Tuple[str, float]],
                         interword: float = 0.3) -> pd.DataFrame:
        time = 1.0
        events: tp.List[dict] = []
        sentence = " ".join(w for w, _ in word_durations)
        for k, (word, duration) in enumerate(word_durations):
            events.append(dict(
                kind="word", word=word, sequence_uid=12,
                modality=self._modality, start=time, duration=duration,
                word_index=k, word_sequence=sentence, language="nl"))
            time += duration + interword
        return pd.DataFrame(events).event.validate()

    def generate(self, word_durations: tp.List[tp.Tuple[str, float]],
                 interword: float = 0.3) -> np.ndarray:
        events = self._generate_events(word_durations, interword)
        last = events.iloc[-1]
        duration = last.start + last.duration + self._additional_time
        builder = _features.FeaturesBuilder(
            events, self._features, features_params=self._features_params,
            sample_rate=self._sample_rate)
        return builder(0, duration)[0]

    def __call__(self, sentence: str) -> np.ndarray:
        word_durations = [(word, max(0.3, min(0.8, 0.1 * len(word))))
                          for word in sentence.strip().split()]
        return self.generate(word_durations)

    def extract_basal_states(self, recording, duration: float = 0.5):
        """Pre-sentence resting-state segments (bm/play.py:272-295)."""
        query = "kind=='word' & word_index==0"
        fact = dset.SegmentDataset.Factory(
            condition=query, tmin=-duration, tmax=0.0,
            highpass=self._highpass, sample_rate=self._sample_rate)
        ds = fact.apply(recording)
        assert ds is not None
        return ds


def attention_map(solver: Solver
                  ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Merger spatial-attention weights for every recording.

    Returns (weights [R, O, C], positions [R, C, 2]): each virtual
    output channel's softmax attention over the physical sensors, for
    plotting over the 2D layout — the reference's Table-1 notebook
    computes the same map by hand
    (notebook_templates/'Table 1 of NMI paper'.ipynb get_attention_map).
    """
    import jax
    import jax.numpy as jnp

    na = solver.norm_arrays
    if na.get("pos_emb") is None:
        raise ValueError("attention_map requires a SimpleConv with "
                         "merger=True")

    def find_heads(tree: tp.Any) -> tp.Optional[np.ndarray]:
        if isinstance(tree, tp.Mapping):
            if "heads" in tree and not isinstance(tree["heads"],
                                                  tp.Mapping):
                return np.asarray(jax.device_get(tree["heads"]))
            for val in tree.values():
                found = find_heads(val)
                if found is not None:
                    return found
        return None

    heads = find_heads(jax.device_get(solver.state["params"]["model"]))
    assert heads is not None, "no merger heads parameter found"
    if heads.ndim == 3:  # per-subject heads: average over subjects
        heads = heads.mean(axis=0)
    table = np.asarray(jax.device_get(na["pos_emb"]))        # [R, C, D]
    positions = np.asarray(jax.device_get(na["rec_positions"]))
    scores = np.einsum("rcd,od->roc", table, heads)
    from .studies.api import invalid_position_mask
    invalid = invalid_position_mask(positions)
    scores = np.where(invalid[:, None, :], -np.inf, scores)
    weights = np.asarray(jax.nn.softmax(jnp.asarray(scores), axis=2))
    return weights, positions


def predict(solver: Solver, features: np.ndarray,
            subject_index: tp.Optional[int] = None,
            meg_init: bool = False) -> np.ndarray:
    """Evoked-like response: prediction difference between the given
    features and a zero-features baseline, averaged over recordings
    (bm/play.py:298-327; returns the raw [C, T] array instead of an
    mne.EvokedArray)."""
    dst = solver.args.dset
    selections = [solver.args.selections[x] for x in dst.selections]
    recordings = list(dset._extract_recordings(
        selections, n_recordings=dst.n_recordings))
    indices = (list(range(len(recordings))) if subject_index is None
               else [subject_index])
    recordings = [recordings[k] for k in indices]
    outs = []
    base = 0 * features
    n_chan = solver.datasets.train[0].meg.shape[0]
    for recording in recordings:
        meg = np.zeros((n_chan, features.shape[1]), dtype=np.float32)
        if meg_init:
            builder = SentenceFeatures.from_solver(solver)
            basal = builder.extract_basal_states(
                recording, duration=solver.args.task.meg_init)
            chunk = basal[0].meg
            meg[:chunk.shape[0], :chunk.shape[1]] = chunk
        predictions = [
            solver.predict(features=f, meg=meg,
                           subject_index=recording.subject_index)
            for f in (features, base)]
        outs.append(predictions[1] - predictions[0])
    return sum(outs) / len(outs)
