"""Observability: metric sinks (history.json is canonical; TensorBoard /
wandb optional) and JAX profiler traces.

Reference parity: bm/solver.py:55-59 (tensorboard/wandb init),
conf/config.yaml wandb group; SURVEY.md §5.1 recommends JAX profiler
traces as the tracing story the reference lacks.
"""

from __future__ import annotations

import contextlib
import logging
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)


class MetricSinks:
    """Fan-out of per-epoch stage metrics to optional backends."""

    def __init__(self, folder: Path, use_wandb: bool = False,
                 wandb_kwargs: tp.Optional[dict] = None,
                 use_tensorboard: bool = False) -> None:
        self.folder = folder
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(dir=str(folder), **(wandb_kwargs or {}))
            except ImportError:
                logger.warning("wandb requested but not installed")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(folder / "tb"))
            except ImportError:
                logger.warning("tensorboard requested but not installed")

    def log(self, epoch: int, stages: tp.Dict[str, tp.Dict[str, float]]
            ) -> None:
        flat = {f"{stage}/{k}": v for stage, metrics in stages.items()
                for k, v in metrics.items()
                if isinstance(v, (int, float))}
        if self._wandb is not None:
            self._wandb.log(flat, step=epoch)
        if self._tb is not None:
            for key, val in flat.items():
                self._tb.add_scalar(key, val, epoch)

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def maybe_profile(folder: Path, enabled: bool) -> tp.Iterator[None]:
    """Capture an xplane trace of the wrapped region (view with
    tensorboard-plugin-profile / xprof)."""
    if not enabled:
        yield
        return
    import jax
    trace_dir = folder / "profile"
    trace_dir.mkdir(parents=True, exist_ok=True)
    logger.info("Capturing JAX profiler trace into %s", trace_dir)
    with jax.profiler.trace(str(trace_dir)):
        yield
