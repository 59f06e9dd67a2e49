"""Content-addressed disk/memory caches.

Reference parity: bm/cache.py:26-117. Keys are SHA1 signatures of
JSON-able arguments; payloads are pickled pytrees or numpy memmaps,
written atomically (write + rename) so concurrent jobs never observe a
half-written file.
"""

from __future__ import annotations

import hashlib
import json
import logging
import pickle
import typing as tp
from pathlib import Path

import numpy as np

from .env import env
from .utils import write_and_rename

logger = logging.getLogger(__name__)


def jsonable(value: tp.Any) -> tp.Any:
    """Normalize a value into a deterministic JSON-able structure."""
    if isinstance(value, dict):
        items = [(jsonable(k), jsonable(v)) for k, v in value.items()]
        items.sort(key=lambda kv: json.dumps(kv[0]))
        return dict(items)
    if isinstance(value, (list, tuple)):
        return [jsonable(v) for v in value]
    if isinstance(value, Path):
        return str(value)
    if value is None or isinstance(value, (int, float, str, bool)):
        return value
    if hasattr(value, "items"):  # config containers
        return jsonable(dict(value))
    if hasattr(value, "__dataclass_fields__"):
        import dataclasses
        return jsonable(dataclasses.asdict(value))
    raise ValueError(f"{value!r} is not jsonable.")


def signature(value: tp.Any) -> str:
    """Deterministic 16-hex-char signature of a JSON-able value."""
    return hashlib.sha1(json.dumps(jsonable(value)).encode()).hexdigest()[:16]


class Cache:
    """Disk cache rooted at env.cache/<name>/<sig(args)>/.

    mode='pickle' stores arbitrary picklable payloads; mode='memmap'
    stores numpy arrays loaded back as read-only memmaps (zero-copy for
    large precomputed feature tracks).
    """

    def __init__(self, name: str, args: tp.Any = None, *, mode: str = "pickle"):
        assert mode in ("pickle", "memmap")
        self._suffix = {"pickle": ".pkl", "memmap": ".npy"}[mode]
        if env.cache is None:
            self.path: tp.Optional[Path] = None
        else:
            self.path = env.cache / name / signature(args)
            self.path.mkdir(exist_ok=True, parents=True)

    def cache_path(self, key: tp.Any) -> tp.Optional[Path]:
        if self.path is None:
            return None
        return self.path / (signature(key) + self._suffix)

    def get(self, _computation: tp.Callable[..., tp.Any], **kwargs: tp.Any) -> tp.Any:
        path = self.cache_path(kwargs)
        if path is not None and path.exists():
            try:
                if self._suffix == ".pkl":
                    with open(path, "rb") as f:
                        return pickle.load(f)
                return np.lib.format.open_memmap(path, mode="r")
            except (OSError, pickle.UnpicklingError, ValueError) as error:
                logger.warning("Error loading cache file %s: %r", path, error)
        result = _computation(**kwargs)
        if path is not None:
            with write_and_rename(path) as tmp:
                if self._suffix == ".pkl":
                    pickle.dump(result, tmp)
                else:
                    assert isinstance(result, np.ndarray), \
                        "memmap cache only stores np.ndarray"
                    np.save(tmp, result)
        return result


class MemoryCache:
    """In-process cache for sharing heavy objects (e.g. feature models)."""

    _CACHE: tp.Dict[str, tp.Dict[str, tp.Dict[str, tp.Any]]] = {}

    def __init__(self, name: str, args: tp.Any = None):
        self.args_sig = signature(args)
        self.name = name
        self._CACHE.setdefault(name, {}).setdefault(self.args_sig, {})

    @property
    def _cache_dict(self) -> tp.Dict[str, tp.Any]:
        return self._CACHE[self.name][self.args_sig]

    def get(self, _computation: tp.Callable[..., tp.Any],
            *args: tp.Any, **kwargs: tp.Any) -> tp.Any:
        key = signature((self.args_sig, list(args), kwargs))
        if key not in self._cache_dict:
            self._cache_dict[key] = _computation(*args, **kwargs)
        return self._cache_dict[key]
