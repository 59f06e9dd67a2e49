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


def shard_batch(arrays: tp.Dict[str, jax.Array], mesh: Mesh
                ) -> tp.Dict[str, jax.Array]:
    """Place batch arrays sharded on the mesh axis (leading dim)."""
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}


def replicate(tree: tp.Any, mesh: Mesh) -> tp.Any:
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(tree, sharding)
