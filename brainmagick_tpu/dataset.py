"""Segment datasets: fixed-shape training windows from recordings.

Reference parity: bm/dataset.py — same segmentation semantics (condition
query or fixed stride, tmin/tmax windows, baseline correction, block
containment masks, channel padding to the max sensor count, per-split
factories) and the same `get_datasets` assembly (round-robin recording
interleave, subject-index assignment, deterministic block splits,
n_subjects caps).

TPU-native design differences:

  * no MNE: epochs are direct [C, T] slices of the cached preprocessed
    memmap; baseline correction is a vectorized mean-subtract,
  * features are rendered ONCE per recording into a dense [D+1, T] track
    (last row = event mask) cached as a disk memmap; per-epoch feature
    fetches are pure slices. The reference repaints features per epoch in
    DataLoader workers — its documented input bottleneck
    (bm/dataset.py:349-364, SURVEY.md §3.1),
  * batches carry sensor positions as arrays so the model needs no
    host-side layout lookups (fixed shapes, jit-friendly).
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import typing as tp
from collections import namedtuple
from concurrent import futures

import numpy as np

from . import studies
from .cache import Cache
from .events import assign_blocks, split_wav_as_block
from .features import FeaturesBuilder
from .studies.api import INVALID_POSITION
from .utils import Frequency, roundrobin

logger = logging.getLogger(__name__)

#: serializes ALL cold feature-track renders (see _get_track)
_TRACK_RENDER_LOCK = threading.Lock()

Datasets = namedtuple("Datasets", "train valid test")


# ---------------------------------------------------------------------------
# Batch container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SegmentBatch:
    """Collatable training sample/batch (bm/dataset.py:209-278 parity,
    numpy/jax arrays instead of torch tensors, plus `positions`)."""

    meg: np.ndarray             # [B, C, T] or [C, T]
    features: np.ndarray        # [B, F, T'] or [F, T']
    features_mask: np.ndarray   # [B, 1, T'] or [1, T']
    subject_index: np.ndarray   # [B] or scalar
    recording_index: np.ndarray  # [B] or scalar
    positions: np.ndarray       # [B, C, 2] or [C, 2]
    _recordings: tp.List[tp.Any] = dataclasses.field(default_factory=list)
    _event_lists: tp.List[tp.List[tp.Any]] = dataclasses.field(
        default_factory=list)

    ARRAY_FIELDS = ("meg", "features", "features_mask", "subject_index",
                    "recording_index", "positions")

    def replace(self, **kwargs: tp.Any) -> "SegmentBatch":
        return dataclasses.replace(self, **kwargs)

    def __len__(self) -> int:
        return len(self.meg)

    def __getitem__(self, index: tp.Any) -> "SegmentBatch":
        idx = np.arange(len(self))[index]
        kw: tp.Dict[str, tp.Any] = {}
        for field in dataclasses.fields(self):
            data = getattr(self, field.name)
            if isinstance(data, list):
                kw[field.name] = [data[i] for i in idx.tolist()] if data else []
            else:
                kw[field.name] = data[index]
        return SegmentBatch(**kw)

    @classmethod
    def collate(cls, items: tp.Sequence["SegmentBatch"]) -> "SegmentBatch":
        kw: tp.Dict[str, tp.Any] = {}
        for field in dataclasses.fields(cls):
            data = [getattr(it, field.name) for it in items]
            if field.name in cls.ARRAY_FIELDS:
                kw[field.name] = np.stack(data)
            else:
                kw[field.name] = [x for sub in data for x in sub]
        batch = cls(**kw)
        for field in ("_recordings", "_event_lists"):
            val = getattr(batch, field)
            assert len(val) in (0, len(batch)), f"Incorrect size for {field}"
        return batch

    def to_device(self, transfer_dtype: tp.Optional[str] = None
                  ) -> tp.Dict[str, tp.Any]:
        """Arrays-only view for feeding jitted functions.

        transfer_dtype='bfloat16' casts the float payloads (meg,
        features) before the host->device copy — halves the wire bytes,
        which matters when the accelerator sits behind a slow
        interconnect; compute upcasts to float32 on device."""
        import jax.numpy as jnp
        out = {}
        for name in self.ARRAY_FIELDS:
            val = getattr(self, name)
            if (transfer_dtype and name in ("meg", "features")
                    and np.issubdtype(np.asarray(val).dtype, np.floating)):
                # no-op (no copy) when the loader already assembled the
                # wire format (parallel.assemble_dtype)
                val = np.asarray(val).astype(transfer_dtype, copy=False)
            out[name] = jnp.asarray(val)
        return out


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

class SegmentDataset:
    """Fixed windows over one recording: meg slices + feature-track slices.

    Instantiate through `SegmentDataset.Factory` (set below).
    """

    def __init__(self, recording: studies.Recording, raw: studies.RawData,
                 sample_positions: np.ndarray,
                 events, features: tp.Sequence[str],
                 features_params: tp.Optional[dict],
                 tmin: float, tmax: float,
                 baseline: tp.Optional[tp.Tuple[tp.Optional[float], float]],
                 event_mask: bool,
                 meg_dimension: tp.Optional[int]) -> None:
        self.recording = recording
        self.raw = raw
        self.sample_rate = Frequency(raw.sample_rate)
        self.event_samples = sample_positions  # [N] int, event onsets
        self.events = events
        self.tmin = tmin
        self.tmax = tmax
        self.baseline = baseline
        self.meg_dimension = meg_dimension
        if meg_dimension is not None:
            assert meg_dimension >= raw.n_channels
        self.features_params = dict(features_params or {})
        self.features = FeaturesBuilder(
            events, features, features_params=self.features_params,
            sample_rate=self.sample_rate, event_mask=event_mask,
            study=recording.study_name())
        self.blocks: tp.Optional[tp.List[tp.Tuple[float, float]]] = None

        self._start_offset = self.sample_rate.to_ind(tmin)
        self._n_times = self.sample_rate.to_ind(tmax - tmin) + 1
        self._track: tp.Optional[np.ndarray] = None  # [D+1, T] features+mask
        self._track_sr: tp.Optional[Frequency] = None
        self._meg_override: tp.Optional[np.ndarray] = None  # autoreject

    # -- feature track -------------------------------------------------------

    def _get_track(self) -> tp.Tuple[np.ndarray, Frequency]:
        """Dense per-recording feature track (memmap-cached). Guarded by
        a process-wide lock: renders dispatch JAX (resample, mel,
        wav2vec) and load feature models, neither of which tolerates
        concurrent dispatch from multiple host threads (relayed-TPU
        backends reject it; MemoryCache's check-then-act would load the
        ~1.2 GB wav2vec checkpoint once per thread). Loader workers and
        the parallel scaler fit may hit cold tracks of DIFFERENT
        datasets at once, so the lock must be global, not per-dataset;
        warm item fetches (memmap slices) never take it."""
        if self._track is None:
            with _TRACK_RENDER_LOCK:
                if self._track is None:
                    self._render_track()
        return self._track, self._track_sr

    def _render_track(self) -> None:
        track_sr = self.features.render_sample_rate
        duration = self.raw.duration

        def compute() -> np.ndarray:
            data, mask, _ = self.features(0.0, duration)
            return np.concatenate([data, mask.astype(np.float32)], axis=0)

        from .ops.dsp import DSP_VERSION  # deferred: jax-free import path
        cache = Cache("feature_tracks", args=dict(
            dsp_version=DSP_VERSION,
            study=self.recording.study_name(),
            recording=self.recording.recording_uid,
            features=list(self.features.keys()),
            features_params=self.features_params,
            sample_rate=float(track_sr),
            event_mask=self.features.event_mask,
            events_fingerprint=_events_fingerprint(self.events),
        ), mode="memmap")
        self._track_sr = track_sr
        self._track = cache.get(compute)

    # -- epochs ---------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.event_samples)

    def _bounds_times(self, idx: int) -> tp.Tuple[float, float]:
        start = int(self.event_samples[idx]) + self._start_offset
        stop = start + self._n_times
        return self.sample_rate.to_sec(start), self.sample_rate.to_sec(stop)

    def _get_meg(self, idx: int) -> np.ndarray:
        if self._meg_override is not None:
            return self._meg_override[idx]
        start = int(self.event_samples[idx]) + self._start_offset
        meg = np.array(self.raw.data[:, start:start + self._n_times],
                       dtype=np.float32)
        if self.baseline is not None:
            b0, b1 = self.baseline
            i0 = 0 if b0 is None else self.sample_rate.to_ind(b0 - self.tmin)
            i1 = self.sample_rate.to_ind(b1 - self.tmin) + 1
            meg = meg - meg[:, i0:i1].mean(axis=1, keepdims=True)
        if self.meg_dimension is not None:
            pad = self.meg_dimension - meg.shape[0]
            if pad:
                meg = np.pad(meg, ((0, pad), (0, 0)))
        return meg

    def _get_positions(self) -> np.ndarray:
        pos = self.raw.positions
        if self.meg_dimension is not None:
            pad = self.meg_dimension - pos.shape[0]
            if pad:
                pos = np.concatenate([
                    pos, np.full((pad, 2), INVALID_POSITION,
                                 dtype=np.float32)])
        return pos.astype(np.float32)

    def _event_records(self) -> tp.Tuple[np.ndarray, np.ndarray,
                                         tp.List[tp.Any]]:
        """Typed event records + start/stop arrays, built ONCE per
        dataset: the `.event` pandas accessor re-validates whatever
        frame it is constructed on, so running it inside __getitem__
        (as a per-window `.loc[select].event.iter()`) made every item
        fetch re-validate its event rows — measured as the dominant
        term of the scaler fit (~7s of a 21s fit on 800 fetches)."""
        cached = getattr(self, "_event_records_cache", None)
        if cached is None:
            frame = self.features.events
            cached = (frame["start"].to_numpy(np.float64),
                      frame["_stop"].to_numpy(np.float64),
                      list(frame.event.iter()))
            self._event_records_cache = cached
        return cached

    def _get_feature(self, idx: int) -> tp.Tuple[np.ndarray, np.ndarray,
                                                 tp.List[tp.Any]]:
        start, stop = self._bounds_times(idx)
        track, track_sr = self._get_track()
        i0 = track_sr.to_ind(start)
        n = track_sr.to_ind(stop - start)
        t_total = track.shape[-1]
        # windows always fit (bounds are pre-masked), but guard rounding
        i0 = max(0, min(i0, t_total - n))
        chunk = np.array(track[:, i0:i0 + n], dtype=np.float32)
        data, mask = chunk[:-1], chunk[-1:] > 0.5
        starts, stops, records = self._event_records()
        select = np.flatnonzero((stops >= start) & (starts < stop))
        from .events import DataSlice
        marker = DataSlice(start=start, duration=stop - start,
                           sample_rate=float(track_sr), language=None,
                           modality=None)
        event_list = [marker] + [records[k] for k in select]
        return data, mask, event_list

    def __getitem__(self, index: tp.Any) -> tp.Any:
        if not isinstance(index, (int, np.integer)):
            sub = SegmentDataset.__new__(SegmentDataset)
            sub.__dict__.update(self.__dict__)
            sub.event_samples = self.event_samples[index]
            if self._meg_override is not None:
                sub._meg_override = self._meg_override[index]
            return sub
        meg = self._get_meg(index)
        data, mask, event_list = self._get_feature(index)
        return SegmentBatch(
            meg=meg, features=data, features_mask=mask,
            subject_index=np.int32(self.recording.subject_index),
            recording_index=np.int32(self.recording.recording_index),
            positions=self._get_positions(),
            _recordings=[self.recording.empty_copy()],
            _event_lists=[event_list])

    def __iter__(self) -> tp.Iterator[SegmentBatch]:
        return (self[k] for k in range(len(self)))

    def get_batch(self, indices: np.ndarray,
                  with_events: bool = False,
                  dtype: tp.Optional[str] = None) -> SegmentBatch:
        """Assemble a whole batch with the native gatherer (one
        multithreaded strided-copy pass for meg + one for the feature
        track, instead of B python items + a collate re-copy).
        dtype='bfloat16' assembles meg/features directly in the wire
        format (parallel.assemble_dtype)."""
        from .native import batch_gather_epochs, batch_gather_track

        dtype = dtype or "float32"
        indices = np.asarray(indices, dtype=np.int64)
        n = len(indices)
        if self._meg_override is not None:
            meg = np.asarray(self._meg_override[indices], dtype=np.float32)
            if dtype != "float32":
                meg = meg.astype(dtype)
        else:
            b0, b1 = (0, 0)
            baseline_len = 0
            if self.baseline is not None:
                bl0, bl1 = self.baseline
                assert bl0 is None, "native path supports (None, t1) baseline"
                baseline_len = self.sample_rate.to_ind(bl1 - self.tmin) + 1
            starts = self.event_samples[indices] + self._start_offset
            meg = batch_gather_epochs(
                self.raw.data, starts, self._n_times,
                out_channels=self.meg_dimension or self.raw.n_channels,
                baseline_len=baseline_len, dtype=dtype)

        track, track_sr = self._get_track()
        if float(track_sr) == float(self.sample_rate):
            t_starts = self.event_samples[indices] + self._start_offset
            n_track = self._n_times
        else:
            t_starts = np.array([
                track_sr.to_ind(self._bounds_times(int(i))[0])
                for i in indices], dtype=np.int64)
            n_track = track_sr.to_ind(self._n_times / float(self.sample_rate))
        t_starts = np.clip(t_starts, 0, track.shape[-1] - n_track)
        # two gathers -> CONTIGUOUS features/mask: slicing one gathered
        # [B, F+1, n] leaves a strided features view, and numpy's
        # strided-source fancy scatter in ConcatDataset.get_batch (and
        # jnp.asarray at transfer) is ~100x slower than contiguous
        features = batch_gather_track(track[:-1], t_starts, n_track,
                                      dtype=dtype)
        mask = batch_gather_track(track[-1:], t_starts, n_track) > 0.5

        event_lists = []
        if with_events:
            from .events import DataSlice
            starts_arr, stops_arr, records = self._event_records()
            for i in indices:
                start, stop = self._bounds_times(int(i))
                select = np.flatnonzero(
                    (stops_arr >= start) & (starts_arr < stop))
                # leading DataSlice marks the epoch bounds — consumers
                # read events[0].start as the epoch start (eval.py)
                marker = DataSlice(start=start, duration=stop - start,
                                   sample_rate=float(track_sr),
                                   language=None, modality=None)
                event_lists.append([marker] + [records[k] for k in select])
        positions = self._get_positions()
        return SegmentBatch(
            meg=meg, features=features, features_mask=mask,
            subject_index=np.full(n, self.recording.subject_index,
                                  dtype=np.int32),
            recording_index=np.full(n, self.recording.recording_index,
                                    dtype=np.int32),
            positions=np.broadcast_to(positions, (n,) + positions.shape
                                      ).copy(),
            _recordings=[self.recording.empty_copy()] * n,
            _event_lists=event_lists)


def _events_fingerprint(events) -> str:
    """Cheap content hash of an events frame for cache keying."""
    import hashlib
    h = hashlib.sha1()
    h.update(str(len(events)).encode())
    h.update(np.ascontiguousarray(
        events.start.values.astype(np.float64)).tobytes())
    h.update(np.ascontiguousarray(
        events.duration.values.astype(np.float64)).tobytes())
    if "offset" in events.columns:
        h.update(np.nan_to_num(
            events.offset.values.astype(np.float64)).tobytes())
    return h.hexdigest()[:16]


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

class _DatasetFactory:
    """Defines how to slice a recording into epochs
    (bm/dataset.py:36-206 parity)."""

    def __init__(self,
                 condition: tp.Union[str, float] = 3.0,
                 tmin: float = -0.5,
                 tmax: float = 2.5,
                 baseline: tp.Any = (None, 0),
                 decim: int = 1,
                 sample_rate: float = 1200,
                 highpass: float = 0,
                 features: tp.Sequence[str] = ("WordLength", "WordFrequency"),
                 features_params: tp.Optional[dict] = None,
                 ignore_end_in_block: bool = False,
                 ignore_start_in_block: bool = False,
                 event_mask: bool = False,
                 split_wav_as_block: bool = False,
                 meg_dimension: tp.Optional[int] = None,
                 autoreject: bool = False) -> None:
        assert tmin < tmax
        assert decim == 1, "Decimation factor is not supported"
        self.features = list(features)
        self.features_params = features_params
        self.condition = condition
        self.baseline = baseline
        self.sample_rate = int(round(sample_rate))
        self.highpass = highpass
        self.ignore_end_in_block = ignore_end_in_block
        self.ignore_start_in_block = ignore_start_in_block
        self.event_mask = event_mask
        self.meg_dimension = meg_dimension
        self.split_wav_as_block = split_wav_as_block
        self.autoreject = autoreject
        self.tmin = tmin
        self.tmax = tmax

    def apply(self, recording: studies.Recording,
              blocks: tp.Optional[tp.List[tp.Tuple[float, float]]] = None
              ) -> tp.Optional[SegmentDataset]:
        if blocks is not None and not blocks:
            raise ValueError("No blocks provided.")
        raw = recording.preprocessed(self.sample_rate, highpass=self.highpass)
        sample_rate = Frequency(raw.sample_rate)
        assert int(sample_rate) == int(self.sample_rate)
        raw_end = (raw.n_times - 1) / sample_rate

        if isinstance(self.condition, str):
            query = (self.condition if "=" in self.condition
                     else f"kind=={self.condition!r}")
            meta = recording.events().query(query)
            times = meta.start.values
        elif isinstance(self.condition, (int, float)):
            times = np.arange(0, raw_end, float(self.condition))
        else:
            raise TypeError(
                f"condition must be a query string or a stride in seconds, "
                f"got {self.condition!r}")

        events = recording.events().copy().sort_values("start")
        if self.split_wav_as_block:
            assert blocks is not None
            events = split_wav_as_block(events, blocks)

        delta = 0.5 / sample_rate
        mask = np.logical_and(times + self.tmin >= 0,
                              times + self.tmax < raw_end + delta)
        if blocks is not None:
            in_any = np.zeros(len(times), dtype=bool)
            for start, stop in blocks:
                if self.ignore_start_in_block:
                    in_split = times >= start
                else:
                    in_split = times + self.tmin >= start
                margin = delta if self.ignore_end_in_block else self.tmax - delta
                in_split &= times + margin < stop
                in_any |= in_split
            mask &= in_any
        if not mask.any():
            logger.warning("Empty dataset %r", recording)
            return None

        samples = sample_rate.to_ind(times[mask])
        if len(np.unique(samples)) != len(samples):
            logger.warning("Found %d duplicate events out of %d",
                           len(samples) - len(np.unique(samples)),
                           len(samples))

        dset = SegmentDataset(
            recording, raw, sample_positions=samples, events=events,
            features=self.features, features_params=self.features_params,
            tmin=self.tmin, tmax=self.tmax, baseline=self.baseline,
            event_mask=self.event_mask, meg_dimension=self.meg_dimension)
        dset.blocks = blocks
        if self.autoreject:
            self._apply_autoreject(dset, raw)
        return dset

    def _apply_autoreject(self, dset: "SegmentDataset",
                          raw: studies.RawData) -> None:
        """Fit an interpolation-based repair on 200 random epochs
        (cached) and repair every epoch (bm/dataset.py:177-199)."""
        from .autoreject import AutoRejectDrop

        cache = Cache("autoreject", args=(
            dict(recording=dset.recording.recording_uid,
                 sample_rate=self.sample_rate, tmin=self.tmin,
                 tmax=self.tmax, highpass=self.highpass),
            dset.blocks))
        epochs = np.stack([dset._get_meg(k)[:raw.n_channels]
                           for k in range(len(dset))])
        positions = raw.positions

        def _fit() -> AutoRejectDrop:
            logger.info("Fitting autoreject, cachefile %s",
                        cache.cache_path({}))
            rng = np.random.RandomState(1234)
            idx = rng.permutation(len(epochs))[:200]
            return AutoRejectDrop().fit(epochs[idx], positions)

        autoreject = cache.get(_fit)
        repaired = autoreject.transform(epochs, positions)
        if self.meg_dimension is not None:
            pad = self.meg_dimension - repaired.shape[1]
            if pad:
                repaired = np.pad(repaired, ((0, 0), (0, pad), (0, 0)))
        dset._meg_override = repaired


SegmentDataset.Factory = _DatasetFactory


# ---------------------------------------------------------------------------
# Concatenation (torch-free)
# ---------------------------------------------------------------------------

def _concat_batches(batches: tp.Sequence[SegmentBatch]) -> SegmentBatch:
    """Concatenate collated batches along the batch dim."""
    if len(batches) == 1:
        return batches[0]
    kw: tp.Dict[str, tp.Any] = {}
    for field in dataclasses.fields(SegmentBatch):
        vals = [getattr(b, field.name) for b in batches]
        if field.name in SegmentBatch.ARRAY_FIELDS:
            kw[field.name] = np.concatenate(vals)
        else:
            kw[field.name] = [x for sub in vals for x in sub]
    return SegmentBatch(**kw)


class ConcatDataset:
    """Concatenation of SegmentDatasets (index-mapped)."""

    def __init__(self, datasets: tp.Sequence[SegmentDataset]) -> None:
        self.datasets = list(datasets)
        sizes = [len(d) for d in self.datasets]
        self.cumulative_sizes = np.cumsum([0] + sizes)

    def __len__(self) -> int:
        return int(self.cumulative_sizes[-1])

    def __getitem__(self, index: int) -> SegmentBatch:
        if index < 0:
            index += len(self)
        d = int(np.searchsorted(self.cumulative_sizes, index,
                                side="right")) - 1
        return self.datasets[d][index - int(self.cumulative_sizes[d])]

    def get_batch(self, indices: np.ndarray,
                  with_events: bool = False,
                  dtype: tp.Optional[str] = None) -> SegmentBatch:
        """Batched fetch: group indices per sub-dataset, gather each
        group natively, scatter rows straight into preallocated output
        arrays (one copy — concat-then-reorder would pay two)."""
        indices = np.asarray(indices, dtype=np.int64)
        which = np.searchsorted(self.cumulative_sizes, indices,
                                side="right") - 1
        parts: tp.List[tp.Tuple[np.ndarray, SegmentBatch]] = []
        for d in np.unique(which):
            sel = np.flatnonzero(which == d)
            local = indices[sel] - int(self.cumulative_sizes[d])
            # dtype only when set: duck-typed test datasets provide
            # get_batch without the kwarg
            kw = {"dtype": dtype} if dtype else {}
            parts.append((sel, self.datasets[int(d)].get_batch(
                local, with_events=with_events, **kw)))
        if len(parts) == 1:
            return parts[0][1]
        kw: tp.Dict[str, tp.Any] = {}
        for field in dataclasses.fields(SegmentBatch):
            first = getattr(parts[0][1], field.name)
            if field.name in SegmentBatch.ARRAY_FIELDS:
                out = np.empty((len(indices),) + first.shape[1:],
                               dtype=first.dtype)
                for sel, batch in parts:
                    out[sel] = getattr(batch, field.name)
                kw[field.name] = out
            elif any(getattr(b, field.name) for _, b in parts):
                items: tp.List[tp.Any] = [None] * len(indices)
                for sel, batch in parts:
                    for i, val in zip(sel.tolist(),
                                      getattr(batch, field.name)):
                        items[i] = val
                kw[field.name] = items
            else:
                kw[field.name] = []
        return SegmentBatch(**kw)


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _preload(recording: studies.Recording, **kwargs: tp.Any
             ) -> studies.Recording:
    """Materialize the per-recording caches (events + preprocessed)."""
    recording.events()
    recording.preprocessed(**kwargs)
    return recording


def _extract_recordings(selections: tp.List[tp.Dict[str, tp.Any]],
                        n_recordings: int, skip_recordings: int = 0,
                        shuffle_recordings_seed: int = -1
                        ) -> tp.Sequence[studies.Recording]:
    """Round-robin interleave of the selections, with subject/recording
    index assignment (bm/dataset.py:386-409)."""
    recording_lists = [list(studies.from_selection(sel)) for sel in selections]
    if shuffle_recordings_seed > 0:
        rng = np.random.RandomState(seed=shuffle_recordings_seed)
        for lst in recording_lists:
            rng.shuffle(lst)
    all_recordings = list(roundrobin(*recording_lists))
    all_recordings = all_recordings[skip_recordings:
                                    skip_recordings + n_recordings]
    if len(all_recordings) < n_recordings:
        logger.warning("Requested %d recordings but only found %d",
                       n_recordings, len(all_recordings))
    uids = sorted({(r.__class__.__name__, r.subject_uid)
                   for r in all_recordings})
    uid_index = {uid: k for k, uid in enumerate(uids)}
    for r_index, rec in enumerate(all_recordings):
        index = uid_index[(rec.__class__.__name__, rec.subject_uid)]
        assert rec._subject_index in (None, index), \
            "Cannot assign a different index"
        rec._subject_index = index
        rec._recording_index = r_index
    return all_recordings


def get_datasets(
        selections: tp.List[tp.Dict[str, tp.Any]],
        n_recordings: int,
        test_ratio: float,
        valid_ratio: float,
        sample_rate: int = 120,
        highpass: float = 0,
        num_workers: int = 10,
        apply_baseline: bool = True,
        progress: bool = False,
        skip_recordings: int = 0,
        min_block_duration: float = 0.0,
        force_uid_assignement: bool = True,
        shuffle_recordings_seed: int = -1,
        split_assign_seed: int = 12,
        min_n_blocks_per_split: int = 20,
        features: tp.Optional[tp.List[str]] = None,
        extra_test_features: tp.Optional[tp.List[str]] = None,
        test: tp.Optional[dict] = None,
        allow_empty_split: bool = False,
        n_subjects: tp.Optional[int] = None,
        n_subjects_test: tp.Optional[int] = None,
        remove_ratio: float = 0.,
        **factory_kwargs: tp.Any) -> Datasets:
    """End-to-end dataset assembly (bm/dataset.py:412-545 parity)."""
    features = list(features or [])
    extra_test_features = list(extra_test_features or [])
    test = dict(test or {})

    num_workers = max(1, min(n_recordings, num_workers))
    all_recordings = _extract_recordings(
        selections, n_recordings, skip_recordings=skip_recordings,
        shuffle_recordings_seed=shuffle_recordings_seed)

    if num_workers <= 1 or len(all_recordings) <= 1:
        all_recordings = [
            _preload(r, sample_rate=sample_rate, highpass=highpass)
            for r in all_recordings]
    else:
        with futures.ThreadPoolExecutor(num_workers) as pool:
            jobs = [pool.submit(_preload, r, sample_rate=sample_rate,
                                highpass=highpass) for r in all_recordings]
            all_recordings = [j.result() for j in jobs]

    meg_dimension = max(r.meg_dimension for r in all_recordings)
    factory_kwargs.update(sample_rate=sample_rate, highpass=highpass,
                          meg_dimension=meg_dimension,
                          baseline=(None, 0) if apply_baseline else None)
    fact = SegmentDataset.Factory(features=features, **factory_kwargs)
    for key, value in test.items():
        if value is not None:
            factory_kwargs[key] = value
    fact_test = SegmentDataset.Factory(
        features=features + extra_test_features, **factory_kwargs)
    factories = [fact_test, fact, fact]  # split order: test, valid, train

    dsets_per_split: tp.List[tp.List[SegmentDataset]] = [[], [], []]
    for i, recording in enumerate(all_recordings):
        events = recording.events()
        blocks = events[events.kind == "block"]
        if min_block_duration > 0 and not force_uid_assignement:
            if recording.study_name() not in ["schoffelen2019"]:
                blocks = blocks.event.merge_blocks(
                    min_block_duration_s=min_block_duration)
        blocks = assign_blocks(
            blocks, [test_ratio, valid_ratio], remove_ratio=remove_ratio,
            seed=split_assign_seed,
            min_n_blocks_per_split=min_n_blocks_per_split)
        for j, (factory, dsets) in enumerate(zip(factories, dsets_per_split)):
            split_blocks = blocks[blocks.split == j]
            if split_blocks.empty:
                logger.warning("No blocks for split %d of recording %d",
                               j, i)
                continue
            start_stops = [(b.start, b.start + b.duration)
                           for b in split_blocks.itertuples()]
            dset = factory.apply(recording, blocks=start_stops)
            if dset is not None:
                dsets.append(dset)
            else:
                logger.warning("Empty blocks for split %d of recording %d",
                               j, i)

    if not allow_empty_split:
        empty = [name for name, dsets in zip(
            ["train", "valid", "test"], dsets_per_split[::-1])
            if len(dsets) == 0]
        if empty:
            raise ValueError(f"The following splits are empty: {empty}.")

    testset, validset, trainset = dsets_per_split
    if n_subjects:
        seen: tp.Set[str] = set()
        count = 0
        for dset in trainset:
            seen.add(dset.recording.subject_uid)
            if len(seen) > n_subjects:
                break
            count += 1
        validset = validset[:count]
        trainset = trainset[:count]
    if n_subjects_test:
        seen = set()
        count = 0
        for dset in testset:
            seen.add(dset.recording.subject_uid)
            if len(seen) > n_subjects_test:
                break
            count += 1
        testset = testset[:count]

    splits = [ConcatDataset(d) for d in (trainset, validset, testset)]
    logger.info("# Examples (train | valid | test): %s",
                " | ".join(str(len(s)) for s in splits))
    return Datasets(*splits)
