"""Shared utilities.

Reference parity: bm/utils.py:26-57 (Frequency), :142-154 (roundrobin),
:173-187 (write_and_rename), :157-170 (flatten_dict), :190-199 (identify_host).
"""

from __future__ import annotations

import itertools
import os
import socket
import time
import typing as tp
from contextlib import contextmanager
from pathlib import Path

import numpy as np

X = tp.TypeVar("X")


class Frequency(float):
    """A float sample rate with second<->sample-index conversion helpers.

    The rounding convention (round-half-to-even through np.round / builtin
    round) is load-bearing: segment boundaries and feature alignment depend
    on it, so it must stay consistent across the whole pipeline.
    """

    def to_ind(self, seconds: tp.Any) -> tp.Any:
        """Convert a time in seconds (scalar or array) to a sample index."""
        if isinstance(seconds, np.ndarray):
            return np.round(seconds * self).astype(int)
        return int(round(seconds * self))

    def to_sec(self, index: tp.Any) -> tp.Any:
        """Convert a sample index (scalar or array) to a time in seconds."""
        return index / self


def roundrobin(*iterables: tp.Iterable[X]) -> tp.Iterator[X]:
    """roundrobin('ABC', 'D', 'EF') --> A D E B F C (itertools recipe)."""
    num_active = len(iterables)
    nexts = itertools.cycle(iter(it).__next__ for it in iterables)
    while num_active:
        try:
            for nxt in nexts:
                yield nxt()
        except StopIteration:
            num_active -= 1
            nexts = itertools.cycle(itertools.islice(nexts, num_active))


def flatten_dict(nested: tp.Dict[str, tp.Dict[str, tp.Any]]) -> tp.Dict[str, tp.Any]:
    """{"a": {"x": 1}, "b": {"y": 2}} -> {"a/x": 1, "b/y": 2}."""
    out: tp.Dict[str, tp.Any] = {}
    for group, sub in nested.items():
        out.update({f"{group}/{key}": val for key, val in sub.items()})
    return out


@contextmanager
def write_and_rename(path: tp.Union[str, Path], mode: str = "wb",
                     suffix: str = ".tmp", pid: bool = True):
    """Write to a temp file then atomically rename onto `path`.

    Guards concurrent writers (pid-suffixed temp names) and avoids
    half-written cache/checkpoint files if the process is killed.
    """
    tmp_path = str(path) + suffix
    if pid:
        # thread id too: concurrent threads of one process must not
        # collide on the temp name
        import threading
        tmp_path += f".{os.getpid()}.{threading.get_ident()}"
    with open(tmp_path, mode) as f:
        yield f
    os.rename(tmp_path, str(path))


def identify_host() -> str:
    """Identify the host machine (used for host-dependent study paths)."""
    return socket.gethostname()


def timer(prefix: str):
    """Tiny wall-clock step timer for ad-hoc profiling."""
    current = time.time()

    def _step(name: str) -> float:
        nonlocal current
        now = time.time()
        delta = now - current
        current = now
        print(f"{prefix}{name}: {delta * 1000:.1f}ms")
        return delta

    return _step
