"""ctypes bindings + build for the native batch gatherer (gather.cpp)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import typing as tp
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "gather.cpp"
_LIB = Path(__file__).parent / "_libgather.so"
_lib: tp.Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> tp.Optional[ctypes.CDLL]:
    global _build_failed
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_LIB))
    try:
        # pid-unique tmp + atomic replace: concurrent processes (pytest
        # workers, CLI subprocesses spawned by tests/grids) may all race
        # to build the first time; each compiles privately and the last
        # replace wins with an always-complete file.
        tmp = _LIB.with_suffix(f".so.tmp.{os.getpid()}")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", str(_SRC), "-o", str(tmp)],
            check=True, capture_output=True, text=True, timeout=120)
        os.replace(tmp, _LIB)
        return ctypes.CDLL(str(_LIB))
    except (subprocess.SubprocessError, OSError) as e:
        # a concurrent builder may have finished meanwhile — use its .so
        try:
            if _LIB.exists():
                return ctypes.CDLL(str(_LIB))
        except OSError:
            pass
        logger.warning("native gather build failed (%s); using numpy "
                       "fallback", e)
        _build_failed = True
        return None


def _get_lib() -> tp.Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        lib = _build()
        if lib is not None:
            for name in ("gather_epochs", "gather_epochs_bf16"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_int]
            for name in ("gather_track", "gather_track_bf16"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_int]
        _lib = lib
    return _lib


def _bf16_dtype():
    import ml_dtypes
    return np.dtype(ml_dtypes.bfloat16)


def is_available() -> bool:
    return _get_lib() is not None


def _check_bounds(starts, n_times, total, what):
    if len(starts) and (starts.min() < 0
                        or starts.max() + n_times > total):
        raise IndexError(f"{what} window outside the recording")


def _numpy_gather_epochs(raw, starts, n_times, out_channels, baseline_len):
    n_channels = raw.shape[0]
    _check_bounds(starts, n_times, raw.shape[1], "epoch")
    out = np.zeros((len(starts), out_channels, n_times), dtype=np.float32)
    for b, s in enumerate(starts):
        epoch = np.array(raw[:, s:s + n_times], dtype=np.float32)
        if baseline_len > 0:
            epoch -= epoch[:, :baseline_len].mean(axis=1, keepdims=True)
        out[b, :n_channels] = epoch
    return out


def batch_gather_epochs(raw: np.ndarray, starts: np.ndarray, n_times: int,
                        out_channels: tp.Optional[int] = None,
                        baseline_len: int = 0,
                        n_threads: int = 0,
                        dtype: str = "float32") -> np.ndarray:
    """[C, T_total] raw + [B] start samples -> [B, out_channels, n_times]
    batch with per-epoch baseline correction. dtype='bfloat16' assembles
    the wire format directly (half the host memory traffic vs assemble-
    fp32-then-cast when parallel.transfer_dtype is bf16)."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out_channels = out_channels or raw.shape[0]
    bf16 = dtype == "bfloat16"
    lib = _get_lib()
    raw_ok = (isinstance(raw, np.ndarray) and raw.dtype == np.float32
              and raw.strides[1] == 4)
    if lib is None or not raw_ok:
        out = _numpy_gather_epochs(raw, starts, n_times, out_channels,
                                   baseline_len)
        return out.astype(_bf16_dtype()) if bf16 else out
    if not raw.flags.c_contiguous:
        raw = np.ascontiguousarray(raw)  # keep alive through the call
    out = np.empty((len(starts), out_channels, n_times),
                   dtype=_bf16_dtype() if bf16 else np.float32)
    fn = lib.gather_epochs_bf16 if bf16 else lib.gather_epochs
    rc = fn(raw.ctypes.data, raw.shape[0], raw.shape[1],
            starts.ctypes.data, len(starts), n_times, out_channels,
            baseline_len, out.ctypes.data, n_threads)
    if rc != 0:
        raise IndexError("epoch window outside the recording")
    return out


def batch_gather_track(track: np.ndarray, starts: np.ndarray,
                       n_times: int, n_threads: int = 0,
                       dtype: str = "float32") -> np.ndarray:
    """[D, T_total] track + [B] starts -> [B, D, n_times]."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    bf16 = dtype == "bfloat16"
    lib = _get_lib()
    track_ok = (isinstance(track, np.ndarray)
                and track.dtype == np.float32 and track.strides[1] == 4)
    if lib is None or not track_ok:
        _check_bounds(starts, n_times, track.shape[1], "track")
        out = np.stack([
            np.array(track[:, s:s + n_times], dtype=np.float32)
            for s in starts])
        return out.astype(_bf16_dtype()) if bf16 else out
    if not track.flags.c_contiguous:
        track = np.ascontiguousarray(track)
    out = np.empty((len(starts), track.shape[0], n_times),
                   dtype=_bf16_dtype() if bf16 else np.float32)
    fn = lib.gather_track_bf16 if bf16 else lib.gather_track
    rc = fn(track.ctypes.data, track.shape[0],
            track.shape[1], starts.ctypes.data, len(starts),
            n_times, out.ctypes.data, n_threads)
    if rc != 0:
        raise IndexError("track window outside the recording")
    return out
