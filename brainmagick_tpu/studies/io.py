"""Raw MEG/EEG binary file readers — native-format ingestion.

The reference delegates all binary formats to MNE; this is a
from-scratch reader for FIF (the Elekta/MNE tagged binary format used by
gwilliams2022 BIDS data and the reference's preprocessed caches), plus a
minimal writer for tests/caching.

FIF structure: a flat sequence of tags, each a 16-byte big-endian header
(kind, type, size, next) followed by `size` data bytes. Measurement
metadata (nchan=200, sfreq=201, ch_info=203, first_sample=208) lives in
the meas-info block; the continuous signal is a sequence of DATA_BUFFER
(300) tags inside a raw-data block, stored samples-major [n_samp, n_chan]
and scaled per channel by cal * range.

Channel 2D positions come from an azimuthal projection of the ch_info
coil locations, normalized to [0, 1]^2 — the same role mne.find_layout
plays for the reference (bm/models/common.py:183-236).

CTF .ds reading (MOUS, schoffelen2019) lives in studies/ctf.py and is
re-exported here as `read_ctf`.
"""

from __future__ import annotations

import struct
import typing as tp
from pathlib import Path

import numpy as np

from .api import INVALID_POSITION, RawData

# tag kinds
FIFF_NCHAN = 200
FIFF_SFREQ = 201
FIFF_CH_INFO = 203
FIFF_FIRST_SAMPLE = 208
FIFF_DATA_BUFFER = 300
FIFF_DATA_SKIP = 301
FIFF_BLOCK_START = 104
FIFF_BLOCK_END = 105

# block kinds
FIFFB_RAW_DATA = 102
FIFFB_CONTINUOUS_DATA = 112
FIFFB_IAS_RAW_DATA = 119
_RAW_BLOCKS = {FIFFB_RAW_DATA, FIFFB_CONTINUOUS_DATA, FIFFB_IAS_RAW_DATA}

# tag data types
FIFFT_INT16 = 2
FIFFT_INT32 = 3
FIFFT_FLOAT = 4
FIFFT_DOUBLE = 5
FIFFT_CH_INFO = 30

_DTYPES = {FIFFT_INT16: ">i2", FIFFT_INT32: ">i4", FIFFT_FLOAT: ">f4",
           FIFFT_DOUBLE: ">f8"}

_CH_INFO = struct.Struct(">iiiffi12fii16s")  # 96 bytes


class _ChannelInfo(tp.NamedTuple):
    name: str
    kind: int
    cal: float
    range: float
    loc: np.ndarray  # [12] floats; loc[0:3] = position


def _iter_tags(buf: memoryview) -> tp.Iterator[tp.Tuple[int, int, memoryview]]:
    pos = 0
    n = len(buf)
    while pos + 16 <= n:
        kind, dtype, size, next_ptr = struct.unpack_from(">iiii", buf, pos)
        pos += 16
        if size < 0 or pos + size > n:
            break
        yield kind, dtype, buf[pos:pos + size]
        if next_ptr > 0:
            pos = next_ptr
        elif next_ptr == -1:
            break
        else:
            pos += size


def _positions_from_locs(locs: np.ndarray) -> np.ndarray:
    """Azimuthal-equidistant projection of 3D coil positions to a
    normalized 2D layout (mne.find_layout role)."""
    pos3 = locs[:, :3]
    valid = np.linalg.norm(pos3, axis=1) > 1e-9
    out = np.full((len(locs), 2), INVALID_POSITION, dtype=np.float32)
    if valid.sum() < 3:
        return out
    p = pos3[valid]
    center = p.mean(axis=0)
    q = p - center
    r = np.linalg.norm(q, axis=1)
    r = np.maximum(r, 1e-9)
    theta = np.arccos(np.clip(q[:, 2] / r, -1, 1))   # polar from +z
    phi = np.arctan2(q[:, 1], q[:, 0])
    x = theta * np.cos(phi)
    y = theta * np.sin(phi)
    x = (x - x.min()) / max(x.max() - x.min(), 1e-9)
    y = (y - y.min()) / max(y.max() - y.min(), 1e-9)
    out[valid, 0] = x
    out[valid, 1] = y
    return out


def read_fif(path: tp.Union[str, Path]) -> RawData:
    """Read a raw FIF file into RawData (data scaled to physical units)."""
    data_bytes = Path(path).read_bytes()
    buf = memoryview(data_bytes)

    nchan: tp.Optional[int] = None
    sfreq: tp.Optional[float] = None
    channels: tp.List[_ChannelInfo] = []
    buffers: tp.List[np.ndarray] = []
    in_raw_block = 0

    for kind, dtype, payload in _iter_tags(buf):
        if kind == FIFF_BLOCK_START and dtype == FIFFT_INT32:
            block = struct.unpack(">i", payload)[0]
            if block in _RAW_BLOCKS:
                in_raw_block += 1
        elif kind == FIFF_BLOCK_END and dtype == FIFFT_INT32:
            block = struct.unpack(">i", payload)[0]
            if block in _RAW_BLOCKS and in_raw_block:
                in_raw_block -= 1
        elif kind == FIFF_NCHAN:
            nchan = int(np.frombuffer(payload, ">i4")[0])
        elif kind == FIFF_SFREQ:
            sfreq = float(np.frombuffer(payload, ">f4")[0])
        elif kind == FIFF_CH_INFO and dtype == FIFFT_CH_INFO:
            (scan_no, log_no, ch_kind, rng, cal, coil_type, *rest
             ) = _CH_INFO.unpack(bytes(payload))
            loc = np.array(rest[:12], dtype=np.float32)
            name = rest[14].split(b"\x00")[0].decode("latin1")
            channels.append(_ChannelInfo(name=name, kind=ch_kind, cal=cal,
                                         range=rng, loc=loc))
        elif kind == FIFF_DATA_BUFFER and in_raw_block:
            if dtype not in _DTYPES:
                raise ValueError(f"Unsupported FIF buffer dtype {dtype}")
            buffers.append(np.frombuffer(payload, _DTYPES[dtype]))

    if nchan is None or sfreq is None or not channels:
        raise ValueError(f"{path}: missing measurement info "
                         f"(nchan={nchan}, sfreq={sfreq}, "
                         f"{len(channels)} channels)")
    assert len(channels) == nchan, (len(channels), nchan)
    if not buffers:
        raise ValueError(f"{path}: no raw data buffers found")

    samples = np.concatenate(buffers)
    assert samples.size % nchan == 0, "truncated data buffer"
    data = samples.reshape(-1, nchan).T.astype(np.float32)
    scale = np.array([c.cal * c.range for c in channels],
                     dtype=np.float32)[:, None]
    data = data * scale
    locs = np.stack([c.loc for c in channels])
    return RawData(data=data, sample_rate=sfreq,
                   ch_names=[c.name for c in channels],
                   positions=_positions_from_locs(locs),
                   ch_kinds=[c.kind for c in channels])


def write_fif(path: tp.Union[str, Path], raw: RawData,
              buffer_samples: int = 1000) -> None:
    """Minimal raw-FIF writer (float buffers, unit cal) for tests and
    cache interchange."""
    chunks: tp.List[bytes] = []

    def tag(kind: int, dtype: int, payload: bytes) -> None:
        chunks.append(struct.pack(">iiii", kind, dtype, len(payload), 0))
        chunks.append(payload)

    tag(FIFF_NCHAN, FIFFT_INT32,
        struct.pack(">i", raw.n_channels))
    tag(FIFF_SFREQ, FIFFT_FLOAT,
        struct.pack(">f", float(raw.sample_rate)))
    for k, name in enumerate(raw.ch_names):
        loc = np.zeros(12, dtype=np.float32)
        px, py = raw.positions[k]
        if px != INVALID_POSITION:
            # embed the normalized layout on a unit hemisphere so the
            # azimuthal read-back projection recovers it monotonically
            loc[0], loc[1], loc[2] = px - 0.5, py - 0.5, 0.5
        kind = raw.ch_kinds[k] if raw.ch_kinds is not None else 1
        payload = _CH_INFO.pack(
            k, k, kind, 1.0, 1.0, 0, *loc.tolist(), 112, 0,
            name.encode("latin1")[:16].ljust(16, b"\x00"))
        tag(FIFF_CH_INFO, FIFFT_CH_INFO, payload)
    tag(FIFF_BLOCK_START, FIFFT_INT32,
        struct.pack(">i", FIFFB_RAW_DATA))
    data = np.asarray(raw.data, dtype=np.float32)
    for lo in range(0, data.shape[1], buffer_samples):
        block = data[:, lo:lo + buffer_samples].T.astype(">f4")
        tag(FIFF_DATA_BUFFER, FIFFT_FLOAT, block.tobytes())
    tag(FIFF_BLOCK_END, FIFFT_INT32, struct.pack(">i", FIFFB_RAW_DATA))
    Path(path).write_bytes(b"".join(chunks))


FIFFV_MEG_CH = 1
FIFFV_EEG_CH = 2
FIFFV_STIM_CH = 3


def find_events(stim: np.ndarray, shortest_event: int = 1) -> np.ndarray:
    """Trigger onsets from a stim channel: [T] -> [N, 3] rows of
    (sample, previous_value, new_value) at 0->nonzero transitions
    (mne.find_events role for the MOUS pipeline)."""
    vals = np.rint(stim).astype(np.int64)
    change = np.flatnonzero(np.diff(vals) != 0) + 1
    events = []
    for idx in change:
        if vals[idx] != 0:
            # require the value to hold for shortest_event samples
            stop = min(idx + shortest_event, len(vals))
            if np.all(vals[idx:stop] == vals[idx]):
                events.append((idx, vals[idx - 1], vals[idx]))
    return np.asarray(events, dtype=np.int64).reshape(-1, 3)


def read_ctf(path: Path) -> RawData:
    """Native CTF .ds reader (res4 + meg4) — see studies/ctf.py."""
    from .ctf import read_ctf as _read_ctf
    return _read_ctf(path)
