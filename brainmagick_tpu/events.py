"""Typed event model over pandas DataFrames: validation, blocks, splits.

Reference parity: bm/events.py. The split-assignment semantics here are
correctness-critical and reproduce the reference exactly:

  * blocks are built from block-start events (sentence starts / sounds),
    with a unique id (uid) derived from the words or filepaths they
    contain (bm/events.py:261-357),
  * train/valid/test assignment hashes each block uid with sha256 and
    seeds `random.Random(hash + seed)` (bm/events.py:401-461) so the
    split of a given block is deterministic across runs, subjects and
    machines,
  * sound events are split at block boundaries (bm/events.py:464-522) so
    audio-derived features (wav2vec/mel) cannot leak across splits.

Events live in a pandas DataFrame with a `kind` column; the `.event`
accessor provides validation and iteration as typed records.
"""

from __future__ import annotations

import hashlib
import random
import typing as tp
from dataclasses import asdict, dataclass, fields
from pathlib import Path

import numpy as np
import pandas as pd

from .utils import Frequency


# ---------------------------------------------------------------------------
# Typed event records
# ---------------------------------------------------------------------------

@dataclass
class Event:
    """Base event: a [start, start+duration) span with modality/language."""
    start: float
    duration: float
    modality: tp.Optional[str]
    language: tp.Optional[str]

    def __post_init__(self) -> None:
        if self.duration < 0:
            raise ValueError("Negative durations are not allowed for events.")

    @classmethod
    def from_dict(cls, row: tp.Mapping[str, tp.Any]) -> "Event":
        names = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in row.items() if k in names})

    @classmethod
    def kind_name(cls) -> str:
        return cls.__name__.lower()

    @property
    def kind(self) -> str:
        return self.kind_name()

    @property
    def stop(self) -> float:
        return self.start + self.duration


@dataclass
class DataSlice(Event):
    """A slice of the recording timeline, with overlap helpers used by the
    feature painter (reference: bm/events.py:70-111)."""
    sample_rate: float

    def __post_init__(self) -> None:
        super().__post_init__()
        self._sample_rate = Frequency(self.sample_rate)
        self._parent: tp.Optional["DataSlice"] = None

    def overlap(self, event: Event) -> "DataSlice":
        start = max(self.start, event.start)
        stop = min(self.stop, event.stop)
        out = DataSlice(start=start, duration=stop - start,
                        sample_rate=self.sample_rate,
                        language=self.language, modality=self.modality)
        out._sample_rate = self._sample_rate
        out._parent = self
        return out

    def slice_in_parent(self) -> slice:
        assert self._parent is not None
        start = self.start_ind - self._parent.start_ind
        return slice(start, start + self.duration_ind)

    @property
    def start_ind(self) -> int:
        return self._sample_rate.to_ind(self.start)

    @property
    def stop_ind(self) -> int:
        return self._sample_rate.to_ind(self.stop)

    @property
    def duration_ind(self) -> int:
        return self.stop_ind - self.start_ind


def _wav_duration(filepath: str) -> float:
    """Duration in seconds of an audio file (wav via stdlib, else soundfile)."""
    import wave
    try:
        with wave.open(filepath, "rb") as f:
            return f.getnframes() / f.getframerate()
    except (wave.Error, EOFError):
        import soundfile as sf  # optional fallback for non-PCM formats
        info = sf.info(filepath)
        return info.frames / info.samplerate


@dataclass
class Sound(Event):
    """Audio stimulus from a file; duration is clamped to the actual file
    length minus offset (reference: bm/events.py:114-137)."""
    filepath: str
    offset: float = 0.0

    def __post_init__(self) -> None:
        super().__post_init__()
        self.filepath = str(Path(self.filepath).absolute())
        if self.offset is None or (isinstance(self.offset, float) and np.isnan(self.offset)):
            self.offset = 0.0
        if "MOCK_CACHE" in self.filepath:
            assert self.duration is not None
        else:
            assert Path(self.filepath).exists(), f"{self.filepath} does not exist."
            actual = _wav_duration(self.filepath) - self.offset
            if self.duration is None or self.duration == 0:
                self.duration = actual
            else:
                self.duration = min(actual, self.duration)


@dataclass
class Word(Event):
    word: str
    word_index: int
    word_sequence: str

    def __post_init__(self) -> None:
        super().__post_init__()
        assert self.modality in ("audio", "visual")
        self.word_index = int(self.word_index)


@dataclass
class Phoneme(Event):
    phoneme_id: int


@dataclass
class MultipleWords(Event):
    words: str


@dataclass
class Motor(Event):
    """A behavioral event."""


@dataclass
class Special(Event):
    name: str


@dataclass
class Block(Event):
    uid: str

    def __post_init__(self) -> None:
        super().__post_init__()
        self.uid = str(self.uid)


CLASS_KIND_MAPPING: tp.Dict[str, tp.Type[Event]] = {
    "word": Word,
    "multiplewords": MultipleWords,
    "multiple_words": MultipleWords,
    "sound": Sound,
    "phoneme": Phoneme,
    "motor": Motor,
    "special": Special,
    "block": Block,
}

WORD_CONDITIONS = {"sentence", "context", "question", "fixation", "word_list"}
VALID_BLOCK_TYPES = {"sentence", "sound", "sentence_or_sound"}


# ---------------------------------------------------------------------------
# Sequence info
# ---------------------------------------------------------------------------

def extract_sequence_info(events: pd.DataFrame, word: bool = True,
                          phoneme: bool = True) -> pd.DataFrame:
    """Fill word_index / word_sequence / phoneme_id columns from sequence_id.

    Reference: bm/events.py:198-258.
    """
    def is_missing(df: pd.DataFrame, key: str) -> bool:
        return key not in df.columns or bool(df[key].isnull().all())

    out = events.copy()

    if word and (events.kind == "word").any():
        missing = [c for c in ("sequence_id", "word") if c not in events.columns]
        if missing:
            raise ValueError(f'Columns "{missing}" are required but were not found.')
        is_word = events.kind.isin(["word", "multiplewords"])
        words = events.loc[is_word]
        if words.sequence_id.nunique() < 2:
            raise ValueError("Only one word sequence ID found.")
        for _, group in words.groupby("sequence_id"):
            if is_missing(group, "word_index"):
                # cumulative word counts handle multi-word entries
                indices = np.cumsum([0] + [len(str(w).split()) for w in group.word])
                out.loc[group.index, "word_index"] = indices[:-1]
            if is_missing(group, "word_sequence"):
                out.loc[group.index, "word_sequence"] = " ".join(
                    group.word.astype(str).values)

    if phoneme and (events.kind == "phoneme").any():
        phonemes = out[out.kind == "phoneme"]
        if is_missing(phonemes, "word_index"):
            raise ValueError('Column "word_index" is required but was not found.')
        for _, group in phonemes.groupby(["sequence_id", "word_index"]):
            if is_missing(group, "phoneme_id"):
                out.loc[group.index, "phoneme_id"] = range(len(group))

    return out


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _get_block_uid(events: pd.DataFrame) -> str:
    """Unique id of a block from its contents (bm/events.py:261-285)."""
    if "sequence_uid" in events.columns:
        unique = events.sequence_uid.unique()
        if len(unique) == 1:
            return unique[0]
    has_words = events.condition.isin(WORD_CONDITIONS) & (events.kind != "phoneme")
    if not has_words.any():
        parts = [f for f in events.filepath.unique() if isinstance(f, str)]
        assert parts, "No filepath information available for defining block unique ID."
        parts = parts + [str(events.start.min())]
    else:
        parts = list(events.loc[has_words].word.astype(str))
    return " ".join(parts)


def create_blocks(events: pd.DataFrame, groupby: str) -> pd.DataFrame:
    """Insert `block` rows delimiting leak-safe split units.

    Reference: bm/events.py:288-357. Block starts: first word of each
    sentence, each sound, or either (sentence_or_sound).
    """
    assert groupby in VALID_BLOCK_TYPES, \
        f"by={groupby} not supported, must be one of {VALID_BLOCK_TYPES}."

    kinds = events.kind.values
    if groupby == "sentence":
        start_mask = (kinds == "word") & (events.get("word_index", pd.Series(
            np.full(len(events), -1))).values == 0)
    elif groupby == "sound":
        start_mask = kinds == "sound"
    else:  # sentence_or_sound
        word_starts = (kinds == "word")
        if "word_index" in events.columns and "modality" in events.columns:
            word_starts &= (events.modality.values == "visual")
            word_starts &= (events.word_index.values == 0)
        else:
            word_starts[:] = False
        start_mask = (kinds == "sound") | word_starts

    block_rows = events.loc[start_mask]
    eps = 1e-7
    stops = (events.start + events.duration)
    events_end = stops.max() + eps
    block_starts = block_rows.start.values
    assert (np.diff(block_starts) > 0).all(), "events not sorted"
    block_stops = np.concatenate([block_starts[1:], [events_end]])

    block_events = []
    for row, stop in zip(block_rows.itertuples(), block_stops):
        mask = (events.start >= row.start) & (stops < stop)
        uid = _get_block_uid(events[mask])
        info = asdict(Block(start=row.start, duration=stop - row.start, uid=uid,
                            language=getattr(row, "language", None),
                            modality=getattr(row, "modality", None)))
        block_events.append(info)

    blocks_df = pd.DataFrame(block_events)
    blocks_df["kind"] = "block"
    # the last block extends to the end of the recording
    blocks_df.loc[blocks_df.index[-1], "duration"] = float("inf")

    out = pd.concat([events, blocks_df], axis=0, ignore_index=True)
    # nudge blocks before their first event for a stable sort, then restore
    out.loc[out.kind == "block", "start"] -= eps
    out = out.sort_values("start", ignore_index=True)
    out.loc[out.kind == "block", "start"] += eps
    return out


def merge_blocks(blocks: pd.DataFrame, min_block_duration_s: float = 60
                 ) -> pd.DataFrame:
    """Merge consecutive blocks until each reaches the minimum duration.

    Reference: bm/events.py:360-398. The last block may remain shorter.
    """
    new_blocks: tp.List[dict] = []
    uids: tp.List[str] = []
    start = 0.0
    n = len(blocks)
    for k, row in enumerate(blocks.itertuples()):
        uids.append(str(row.uid))
        is_last = k == n - 1
        stop = row.start + row.duration
        if is_last or stop > start + min_block_duration_s:
            info = asdict(Block(start=start, duration=stop - start,
                                uid=",".join(uids),
                                language=getattr(row, "language", None),
                                modality=getattr(row, "modality", None)))
            new_blocks.append(info)
            uids, start = [], stop
    assert not uids, "All blocks should have been included"
    out = pd.DataFrame(new_blocks)
    out["kind"] = "block"
    if (out.duration[:-1] < min_block_duration_s).any():
        raise ValueError(f"Some blocks are smaller than {min_block_duration_s}.")
    return out


def assign_blocks(blocks: pd.DataFrame, ratios: tp.List[float], seed: int,
                  remove_ratio: float = 0.,
                  min_n_blocks_per_split: int = 20) -> pd.DataFrame:
    """Deterministically assign blocks to len(ratios)+1 splits.

    Each block's split is a pure function of (uid, seed): sha256(uid) is
    mixed into a python Random stream whose first draw picks the split
    from the ratio CDF (reference: bm/events.py:401-461). This guarantees
    the same block lands in the same split across subjects and runs.
    """
    ratios = list(ratios)
    if remove_ratio > 0.:
        ratios = ratios + [remove_ratio]
    assert all(r > 0 for r in ratios)
    assert sum(ratios) < 1., "last dataset has negative ratio size"
    ratios.append(1. - sum(ratios))
    cdf = np.cumsum(ratios)

    split = []
    for uid in blocks.uid.astype(str):
        hashed = int(hashlib.sha256(uid.encode()).hexdigest(), 16)
        score = random.Random(hashed + seed).random()
        split.append(int(np.searchsorted(cdf, score, side="right")))
    assert len(split) == len(blocks)

    out = blocks.copy()
    out["split"] = split
    if (out.split.value_counts() < min_n_blocks_per_split).any():
        raise ValueError(
            f"At least one of the splits has fewer than {min_n_blocks_per_split} blocks.")

    if remove_ratio > 0.:
        removed = len(ratios) - 2
        out = out[out.split != removed]
        out.split = out.split.map(lambda x: x - 1 if x > removed else x)
    return out


def split_wav_as_block(events: pd.DataFrame,
                       blocks: tp.List[tp.Tuple[float, float]],
                       margin: float = 0.1) -> pd.DataFrame:
    """Split sound events at block boundaries (anti-leak for audio features).

    Reference: bm/events.py:464-522. Each sound event overlapping a block
    boundary is cut, with the remainder's `offset` advanced so the audio
    content still lines up.
    """
    events = events.copy()
    if "offset" not in events:
        events["offset"] = 0.

    sound_mask = events.kind == "sound"
    other_events = events[~sound_mask]

    # Boundary candidates, ordered. A block *start* may cut a piece that
    # begins exactly `margin` before it; a block *stop* requires a
    # strictly larger gap (it only cuts pieces that began inside the
    # block, i.e. before stop - margin).
    boundaries: tp.List[tp.Tuple[float, bool]] = sorted(
        {(float(b[0]), True) for b in blocks}
        | {(float(b[1]), False) for b in blocks})

    def cut_points(e_start: float, e_stop: float) -> tp.List[float]:
        """Boundaries falling far enough inside [e_start, e_stop)."""
        cuts: tp.List[float] = []
        cursor = e_start
        for point, is_block_start in boundaries:
            if e_stop <= point + margin:
                break  # nothing at/after this boundary can cut
            inside = (cursor <= point - margin if is_block_start
                      else cursor < point - margin)
            if inside and point != cursor:
                cuts.append(point)
                cursor = point
        return cuts

    pieces = []
    for _, event in events[sound_mask].iterrows():
        e_start = float(event.start)
        e_stop = e_start + float(event.duration)
        edges = [e_start] + cut_points(e_start, e_stop) + [e_stop]
        for lo, hi in zip(edges[:-1], edges[1:]):
            piece = event.copy(deep=True)
            piece.start = lo
            piece.duration = hi - lo
            # advance into the wav so audio content stays aligned
            piece.offset = event.offset + (lo - e_start)
            pieces.append(piece)

    out = pd.concat([pd.DataFrame(pieces), other_events])
    return out.sort_values("start", ignore_index=True)


# ---------------------------------------------------------------------------
# DataFrame accessor
# ---------------------------------------------------------------------------

@pd.api.extensions.register_dataframe_accessor("event")
class EventAccessor:
    """Validation + typed iteration over an events DataFrame.

    Reference: bm/events.py:525-643. Construction validates every row by
    instantiating the corresponding Event record (which normalizes fields
    and applies checks).
    """

    def __init__(self, frame: pd.DataFrame) -> None:
        self._frame = self.validate_frame(frame)

    @staticmethod
    def _validate_event(event: pd.Series) -> dict:
        kind = event["kind"]
        if kind not in CLASS_KIND_MAPPING:
            raise ValueError(
                f'Unexpected kind "{kind}". Add a new Event class in '
                "brainmagick_tpu.events to support it.")
        obj = CLASS_KIND_MAPPING[kind].from_dict(event)
        return {**event, **asdict(obj)}

    @classmethod
    def validate_frame(cls, frame: pd.DataFrame) -> pd.DataFrame:
        if frame.empty:
            return frame.copy()
        return pd.DataFrame(frame.apply(cls._validate_event, axis=1).tolist())

    def validate(self) -> pd.DataFrame:
        return self._frame

    def iter(self) -> tp.Iterator[Event]:
        for row in self._frame.itertuples(index=False):
            yield CLASS_KIND_MAPPING[row.kind].from_dict(row._asdict())

    def create_blocks(self, groupby: str) -> pd.DataFrame:
        return create_blocks(self._frame, groupby=groupby)

    def merge_blocks(self, min_block_duration_s: float = 60) -> pd.DataFrame:
        blocks = self._frame[self._frame.kind == "block"]
        return merge_blocks(blocks, min_block_duration_s=min_block_duration_s)

    def plot(self, **kwargs: tp.Any):
        from .viz import plot_events
        return plot_events(self._frame, **kwargs)
