"""FeaturesBuilder: renders named features into a dense [D, T] array for
any [start, stop) time window of a recording.

Reference parity: bm/features/base.py:23-270 — identical contract:

  * channel layout is the ordered concatenation of each feature's
    `dimension` channels; `get_slice(name)` returns a feature's rows, and
    `get_slice(name, model_output=True)` the rows in the *model output*
    where categorical features expand to `cardinality` logits,
  * `__call__(start, stop) -> (data [D,T] float32, mask [1,T] bool,
    event_list)`; `data` is initialized to each feature's default value,
    events overlapping the window are painted at sample positions
    computed with the same rounding as the recording timeline,
  * `event_mask=True` paints a word-occupancy mask channel.

TPU-native design difference: painting is numpy on the host, and the
intended hot path is `render_track` — paint each *full recording* once,
cache as a memmap, then per-epoch fetches are pure slices (the reference
repaints per epoch in DataLoader workers, its main input bottleneck,
bm/dataset.py:349-364).
"""

from __future__ import annotations

import logging
import typing as tp
from collections import OrderedDict

import numpy as np
import pandas as pd

from ..events import DataSlice, Event
from ..utils import Frequency

logger = logging.getLogger(__name__)


class Feature:
    """Base feature: maps one event kind to channel values.

    Subclasses are auto-registered by class name
    (bm/features/base.py:190-197).
    """

    event_kind = ""
    dimension = 1
    cardinality: tp.Optional[int] = None  # set -> categorical feature
    default_value: float = 0.
    sample_rate = Frequency(float("nan"))

    @classmethod
    def __init_subclass__(cls) -> None:
        super().__init_subclass__()
        assert cls.event_kind, "Missing event_kind"
        if cls.__name__.startswith("_"):
            return
        FeaturesBuilder._FEATURE_CLASSES[cls.__name__] = cls

    def __init__(self, sample_rate: Frequency, **kwargs: tp.Any) -> None:
        self.sample_rate = sample_rate
        self._params = dict(kwargs)
        assert self.dimension >= 1
        assert self.cardinality is None or self.dimension == 1, \
            "categorical features must be single-channel"

    @property
    def name(self) -> str:
        return self.__class__.__name__

    @property
    def output_dimension(self) -> int:
        """Channels this feature occupies in the model output (categorical
        features are predicted as `cardinality` logits)."""
        return self.dimension if self.cardinality is None else self.cardinality

    @property
    def categorical(self) -> bool:
        return self.cardinality is not None

    @property
    def normalizable(self) -> bool:
        return not self.categorical

    def __repr__(self) -> str:
        return f"{self.name}({float(self.sample_rate)})"

    def get(self, event: tp.Any) -> tp.Union[float, int, np.ndarray]:
        """Value(s) for the whole event, ignoring the window overlap."""
        raise NotImplementedError

    def get_on_overlap(self, event: Event, overlap: DataSlice
                       ) -> tp.Union[float, int, np.ndarray]:
        """Value(s) trimmed/padded to the overlapping part of the window.

        Default: truncate 2D [D, L] outputs of `get` to the overlap, with
        single-sample replicate padding for rounding differences
        (bm/features/base.py:238-267 semantics).
        """
        val = self.get(event)
        if isinstance(val, np.ndarray):
            if val.ndim == 2:
                assert val.shape[-1] > 0
                first = max(0, -overlap._sample_rate.to_ind(
                    event.start - overlap.start))
                first = min(first, val.shape[-1] - 1)
                val = val[:, first: first + overlap.duration_ind]
                if overlap.duration_ind - val.shape[-1] == 1:
                    val = np.concatenate([val, val[:, -1:]], axis=-1)
                else:
                    assert val.shape[-1] == overlap.duration_ind, \
                        (val.shape, overlap.duration_ind)
            while val.ndim < 2:
                val = val[..., None]
            if val.ndim > 2:
                raise RuntimeError(f"Unexpected shape {val.shape}")
        elif not isinstance(val, (int, float, np.integer, np.floating)):
            raise TypeError(f"Invalid type {type(val)} for feature {self}")
        return val

    def post_process(self, block: np.ndarray) -> None:
        """In-place transform of the painted block (e.g. pulse edges)."""


class FeaturesBuilder(OrderedDict):
    """Ordered mapping name -> Feature with the dense-rendering engine."""

    _FEATURE_CLASSES: tp.Dict[str, tp.Type[Feature]] = {}

    #: studies whose features may silently fall back to offline stand-ins
    #: (hash embeddings, rule-based POS) when a model is missing on disk
    _FALLBACK_STUDIES = ("fake", "fakeeeg")

    def __init__(self, events: pd.DataFrame, features: tp.Sequence[str],
                 features_params: tp.Optional[dict],
                 sample_rate: Frequency, event_mask: bool = False,
                 study: tp.Optional[str] = None) -> None:
        super().__init__()
        features = list(features)
        self.features_params = dict(features_params or {})
        self.sample_rate = sample_rate
        self.event_mask = event_mask
        try:
            self.update([
                (name, self._FEATURE_CLASSES[name](
                    sample_rate=self.sample_rate,
                    **self.features_params.get(name, {})))
                for name in features])
        except KeyError as e:
            available = set(self._FEATURE_CLASSES)
            missing = ", ".join(set(features) - available)
            options = ", ".join(sorted(available - set(features)))
            raise KeyError(f"Could not find feature(s): {missing}. "
                           f"Available: {options}") from e

        # resolve each feature's offline-fallback permission: an explicit
        # features_params.<name>.allow_fallback wins; otherwise fall back
        # only for synthetic studies or direct library use (study=None,
        # e.g. SentenceFeatures) — a real study with a missing embedding
        # model must fail loudly, not train on hash embeddings
        auto_allowed = (study is None
                        or study in self._FALLBACK_STUDIES)
        for feature in self.values():
            if getattr(feature, "allow_fallback", False) is None:
                feature.allow_fallback = auto_allowed

        event_kinds = {f.event_kind for f in self.values()}
        if self.event_mask:
            from .basic import WordSegment
            self.word_seg_feature = WordSegment(self.sample_rate)
            event_kinds.add(self.word_seg_feature.event_kind)

        self.events = events.loc[events.kind.isin(event_kinds)].copy()
        self.events["_stop"] = self.events.start + self.events.duration
        missing_kinds = event_kinds - set(events.kind) - {"sound"}
        if missing_kinds and len(events) > 0:
            logger.warning("No events found for feature kind(s): %s",
                           missing_kinds)

    # -- channel layout ----------------------------------------------------

    @property
    def dimension(self) -> int:
        return sum(f.dimension for f in self.values())

    @property
    def output_dimension(self) -> int:
        return sum(f.output_dimension for f in self.values())

    def get_slice(self, name: str, model_output: bool = False) -> slice:
        if name not in self:
            raise KeyError(f"Could not find feature {name}.")
        start = 0
        for key, feature in self.items():
            dim = feature.output_dimension if model_output else feature.dimension
            if name == key:
                return slice(start, start + dim)
            start += dim
        raise AssertionError  # unreachable

    def extract_features(self, features: np.ndarray,
                         feature_names: tp.Sequence[str]) -> np.ndarray:
        """Select [*, D, T] rows of the given named features, in order."""
        assert features.shape[1] == self.dimension, \
            "Input should contain all features"
        assert all(name in self for name in feature_names)
        chunks = [features[:, self.get_slice(name)] for name in feature_names]
        return np.concatenate(chunks, axis=1)

    # -- rendering ----------------------------------------------------------

    @property
    def render_sample_rate(self) -> Frequency:
        """With a single feature, honor its own sample rate (e.g.
        Wav2VecChunk renders at 16kHz — bm/features/base.py:70-75)."""
        if len(self) == 1:
            return next(iter(self.values())).sample_rate
        return self.sample_rate

    def __call__(self, start: float, stop: float
                 ) -> tp.Tuple[np.ndarray, np.ndarray, tp.List[Event]]:
        sample_rate = self.render_sample_rate
        n_times = sample_rate.to_ind(stop - start)
        data = np.zeros((self.dimension, n_times), dtype=np.float32)
        mask = np.zeros((1, n_times), dtype=bool)

        for feature in self.values():
            data[self.get_slice(feature.name)] = feature.default_value

        select = (self.events["_stop"] >= start) & (self.events.start < stop)
        window_events = self.events.loc[select]
        dslice = DataSlice(start=start, duration=stop - start,
                           sample_rate=sample_rate, language=None,
                           modality=None)
        event_list: tp.List[Event] = [dslice]
        for event in window_events.event.iter():
            event_list.append(event)
            overlap = dslice.overlap(event)
            if overlap.duration_ind < 1:
                continue
            for feature in self.values():
                if feature.event_kind == event.kind:
                    val = feature.get_on_overlap(event, overlap)
                    data[self.get_slice(feature.name),
                         overlap.slice_in_parent()] = val
            if self.event_mask and \
                    self.word_seg_feature.event_kind == event.kind:
                mask[:, overlap.slice_in_parent()] = bool(
                    self.word_seg_feature.get(event))

        for feature in self.values():
            feature.post_process(data[self.get_slice(feature.name)])

        if not self.event_mask:
            mask[:, :] = True
        return data, mask, event_list

    def __reduce__(self) -> tp.Any:
        """Pickle as a plain object (OrderedDict subclasses otherwise
        re-enter __init__ without arguments)."""
        return object.__reduce__(self)

    def render_track(self, duration: float
                     ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """Render the full [0, duration) feature track + mask once.

        Per-epoch windows are then pure slices of this track (see
        dataset.SegmentDataset) — sample positions agree with per-window
        painting because both round event times on the global timeline.
        """
        data, mask, _ = self(0.0, duration)
        return data, mask
