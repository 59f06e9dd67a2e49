"""Multi-chip scaling over a jax.sharding.Mesh.

The reference's only parallelism is data-parallel DDP over NCCL
(SURVEY.md §2.4): per-rank batch split, gradient all-reduce, per-GPU
contrastive negatives. The TPU-native equivalent here:

  * one 1-D mesh over ICI (`make_mesh`),
  * the Solver's train step sharded with shard_map: batch split over the
    mesh axis, loss/grads pmean'd (implicit all-reduce), BN stats
    pmean'd, and — crucially — CLIP negatives kept per-shard so the loss
    dynamics match the reference's per-GPU pools (README.md:139-143),
  * barriers/broadcasts from the reference (scaler fit, cache build)
    disappear: the scaler is fitted once on the host and enters the step
    as replicated arrays.
"""

from __future__ import annotations

import os
import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: tp.Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D device mesh over the first n_devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, found {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_array(value: tp.Any, mesh: Mesh,
                spec: tp.Optional[PartitionSpec] = None) -> jax.Array:
    """Commit one array to the mesh, batch-sharded on the leading dim by
    default.

    Single process: a plain device_put. Multi-host pods (SURVEY.md §2.4
    TPU-equivalent paragraph): each process runs its own input pipeline
    and supplies only its LOCAL rows — `value` is this host's shard of
    the global batch, assembled into the global array with
    `jax.make_array_from_process_local_data` (global batch =
    n_processes x local rows, exactly the reference's per-rank batch
    split, bm/train.py:37-39). DCN never sees the batch; only gradients
    cross hosts."""
    if spec is None:
        spec = PartitionSpec(mesh.axis_names[0])
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(value))
    return jax.device_put(value, sharding)


def shard_batch(arrays: tp.Dict[str, tp.Any], mesh: Mesh
                ) -> tp.Dict[str, jax.Array]:
    """Place batch arrays sharded on the mesh axis (leading dim);
    per-host local data on multi-host pods (see shard_array)."""
    return {k: shard_array(v, mesh) for k, v in arrays.items()}


def process_rows(n_global: int) -> slice:
    """This process's contiguous row block of a globally-identical
    batch. Every process's loader draws the SAME seeded global batch
    (the reference's DistributedSampler equivalently partitions one
    seeded index order across ranks, bm/solver.py:120-130); each
    process keeps only its rows and feeds them to
    `make_array_from_process_local_data`, which requires strictly
    process-local data. Valid because a 1-D mesh over `jax.devices()`
    assigns contiguous row blocks to each process's devices (devices
    are ordered by process index)."""
    n_proc = jax.process_count()
    assert n_global % n_proc == 0, (
        f"global batch {n_global} must divide over {n_proc} processes")
    local = n_global // n_proc
    i = jax.process_index()
    return slice(i * local, (i + 1) * local)


def slice_global_batch(arrays: tp.Dict[str, tp.Any],
                       pad_weight: tp.Any
                       ) -> tp.Tuple[tp.Dict[str, tp.Any], tp.Any]:
    """Reduce a globally-identical batch to this process's local rows
    (identity on single-process)."""
    if jax.process_count() == 1:
        return arrays, pad_weight
    n_global = len(pad_weight)
    rows = process_rows(n_global)
    arrays = {k: v[rows] for k, v in arrays.items()}
    return arrays, pad_weight[rows]


def replicate(tree: tp.Any, mesh: Mesh) -> tp.Any:
    """Commit a pytree fully replicated over the mesh (works from every
    process on multi-host pods — each supplies the identical value)."""
    return jax.tree_util.tree_map(
        lambda v: shard_array(v, mesh, spec=PartitionSpec()), tree)


def step_compiler_options(args) -> tp.Optional[tp.Dict[str, str]]:
    """Per-compile XLA options for the training/eval step jits.

    `parallel.scoped_vmem_limit_kib` caps XLA's scoped-VMEM budget on
    TPU backends — measured on v5e at the paper shapes (bench.py A/B,
    doc/perf_playbook.md): 64 MiB compiles the conv-heavy step ~6%
    faster than the default (34.3 -> 31.8 ms/step). TPU-only flag, so
    None is returned on CPU/GPU backends ('axon' is this container's
    relayed-TPU platform). Applied via jit(compiler_options=...) —
    env XLA_FLAGS also works on production hosts but does not reach a
    relayed compile server."""
    lim = getattr(getattr(args, "parallel", None),
                  "scoped_vmem_limit_kib", None)
    if lim and jax.default_backend() in ("tpu", "axon"):
        return {"xla_tpu_scoped_vmem_limit_kib": str(int(lim))}
    return None


def enable_compilation_cache(cache_dir: tp.Optional[tp.Union[str, "Path"]]
                             = None,
                             min_compile_time_secs: float = 1.0) -> "Path":
    """Point JAX's persistent compilation cache at a durable directory.

    The paper-shape training step costs ~37 s to compile; a grid of 48
    XPs (or an eval sweep re-loading each of them) repays that tax per
    process unless compiles persist across runs. The reference has no
    equivalent (torch eager); on TPU this is the difference between a
    grid spending minutes or hours in XLA. Identical configs hit the
    cache exactly because the step jits close over static shapes only.

    Resolution order for the directory: explicit argument, then the
    BM_TPU_XLA_CACHE environment variable, then ``<env.cache>/xla``
    next to the feature/dataset caches, then ``~/.cache/brainmagick_tpu
    /xla``. Safe to call repeatedly (jax.config updates are idempotent)
    and concurrently (the cache writes via atomic rename). CLIs call
    this at startup, gated on ``parallel.compilation_cache``; library
    users opt in by calling it themselves.
    """
    from pathlib import Path

    from ..env import env
    if cache_dir is None:
        cache_dir = os.environ.get("BM_TPU_XLA_CACHE")
    if cache_dir is None:
        base = env.cache if env.cache is not None else (
            Path.home() / ".cache" / "brainmagick_tpu")
        cache_dir = Path(base) / "xla"
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    return cache_dir


def average_metrics_across_processes(metrics: tp.Dict[str, float]
                                     ) -> tp.Dict[str, float]:
    """Mean of each scalar metric over all processes (the reference's
    flashy.distrib.average_metrics all-reduce, bm/wer.py:121,
    bm/solver.py:395). Single process: identity."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    vals = np.asarray([float(metrics[k]) for k in keys],
                      dtype=np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(vals))
    return dict(zip(keys, gathered.mean(axis=0).tolist()))
