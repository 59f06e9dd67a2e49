"""Pallas TPU kernel: fused per-recording normalization + clamp + peak
reduction over MEG batches.

This is the first op of every training step (bm/norm.py RobustScaler
transform + ScaleReject clamp + the reject peak reduction,
bm/solver.py:245-248): for each sample b with recording r(b),

    out[b] = clip((meg[b] - center[r(b)]) / scale[r(b)], -limit, limit)
    peak[b] = max_{c,t} |(meg[b] - center) / scale|   (pre-clamp)

Fusing the three into one VMEM pass reads the [B, C, T] batch from HBM
exactly once and writes it once — the op is purely HBM-bandwidth-bound,
so this is its speed-of-light. The jitted fallback (`_reference_impl`)
is used off-TPU and under `interpret=True` in CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(meg_ref, center_ref, scale_ref, limit_ref, out_ref, peak_ref):
    """One grid step = one batch row: [1, C, T] meg block in VMEM;
    center/scale stay whole ([B, C], ~KBs) and are indexed by row —
    TPU tiling forbids sub-8 blocks on their leading dim."""
    b = pl.program_id(0)
    x = meg_ref[...]                  # [1, C, T]
    center = center_ref[b]            # [C]
    scale = scale_ref[b]              # [C]
    limit = limit_ref[0]
    normed = (x - center[None, :, None]) / scale[None, :, None]
    peak_ref[b] = jnp.max(jnp.abs(normed))
    out_ref[...] = jnp.clip(normed, -limit, limit)


def _reference_impl(meg, center, scale, limit, clip):
    normed = (meg - center[:, :, None]) / scale[:, :, None]
    peak = jnp.max(jnp.abs(normed), axis=(1, 2))
    if clip:
        normed = jnp.clip(normed, -limit, limit)
    return normed, peak


@partial(jax.jit, static_argnames=("clip", "interpret", "impl"))
def normalize_clamp_peak(meg: jax.Array, center: jax.Array,
                         scale: jax.Array, limit: float,
                         clip: bool = True,
                         interpret: bool = False,
                         impl: str = "auto"):
    """meg [B, C, T], center/scale [B, C] (already gathered per sample)
    -> (normalized+clamped meg [B, C, T], pre-clamp peak [B]).

    Uses the fused Pallas kernel on TPU; the plain XLA composition
    elsewhere (identical numerics). `impl='xla'` forces the portable
    composition regardless of backend — required when the trace must
    stay Mosaic-free (multi-platform / symbolic-batch `jax.export`
    serving artifacts, serve.export_forward).
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if impl == "xla" or not clip or (not on_tpu and not interpret):
        return _reference_impl(meg, center, scale, limit, clip)

    B, C, T = meg.shape
    limit_arr = jnp.full((1,), limit, dtype=meg.dtype)
    out, peak = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, T), meg.dtype),
            jax.ShapeDtypeStruct((B,), meg.dtype),
        ],
        interpret=interpret,
    )(meg, center, scale, limit_arr)
    return out, peak
