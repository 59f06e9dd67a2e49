"""Global environment: study paths, cache dir, feature-model dir.

Reference parity: bm/_env.py:21-127. Paths can be set directly, via
environment variables (BM_TPU_CACHE, BM_TPU_STUDY_<NAME>), or temporarily
overridden with `env.temporary(...)` / `env.temporary_from_args(args)`.
"""

from __future__ import annotations

import contextlib
import os
import typing as tp
from pathlib import Path


class Env:
    """Singleton holding global data paths."""

    _instance: tp.Optional["Env"] = None

    def __new__(cls) -> "Env":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __init__(self) -> None:
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self._studies: tp.Dict[str, Path] = self._study_paths_from_env()
        self.cache: tp.Optional[Path] = self._path_from_env("BM_TPU_CACHE")
        # directory for models used to build features (e.g. wav2vec2 weights)
        self.feature_models: tp.Optional[Path] = self._path_from_env(
            "BM_TPU_FEATURE_MODELS")

    @staticmethod
    def _path_from_env(key: str) -> tp.Optional[Path]:
        val = os.environ.get(key)
        return Path(val) if val else None

    @staticmethod
    def _study_paths_from_env() -> tp.Dict[str, Path]:
        prefix = "BM_TPU_STUDY_"
        out = {}
        for key, val in os.environ.items():
            if key.startswith(prefix) and val:
                out[key[len(prefix):].lower()] = Path(val)
        return out

    @property
    def studies(self) -> tp.Dict[str, Path]:
        return dict(self._studies)

    @studies.setter
    def studies(self, paths: tp.Dict[str, tp.Union[str, Path]]) -> None:
        self._studies = {name: Path(p) for name, p in paths.items()}

    @contextlib.contextmanager
    def temporary(self, **kwargs: tp.Any) -> tp.Iterator[None]:
        """Temporarily replace attributes (cache, studies, feature_models)."""
        saved: tp.Dict[str, tp.Any] = {}
        for key, val in kwargs.items():
            if isinstance(val, str):
                val = Path(val)
            saved[key] = getattr(self, key)
            setattr(self, key, val)
        try:
            yield
        finally:
            for key, val in saved.items():
                setattr(self, key, val)

    @contextlib.contextmanager
    def temporary_from_args(self, args: tp.Any) -> tp.Iterator[None]:
        """Push cache/feature_models/study paths from a config object."""
        kwargs: tp.Dict[str, tp.Any] = {}
        cache = getattr(args, "cache", None)
        if cache is not None:
            kwargs["cache"] = Path(cache)
        feature_models = getattr(args, "feature_models", None)
        if feature_models is not None:
            kwargs["feature_models"] = Path(feature_models)
        study_paths = getattr(args, "study_paths", None)
        if study_paths:
            merged = self.studies
            merged.update({name: Path(p) for name, p in dict(study_paths).items()})
            kwargs["studies"] = merged
        with self.temporary(**kwargs):
            yield

    def __repr__(self) -> str:
        vals = {k: v for k, v in self.__dict__.items() if not k.startswith("_")}
        vals["studies"] = self._studies
        body = ",".join(f"{k}={v}" for k, v in sorted(vals.items()))
        return f"Env({body})"


env = Env()
