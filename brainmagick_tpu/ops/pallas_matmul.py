"""Flattened A @ B^T for retrieval scoring (+ a Pallas kernel variant).

The offline-eval / WER hot op is scores[M, N] = sum_k A[M, K] B[N, K]
with M = a pred block (256), N = a candidate block (2048) and a HUGE
contraction K = features x time (~351k for wav2vec targets): each
candidate row is one flattened segment.

Measured on v5e (M=256, N=2048, K=351232, loop-carried timing):

  3D einsum "bct,oct->bo" (ClipLoss path)   ~16.5 ms  (t=343 pads to
                                             384 inside the contraction)
  FLATTENED 2D dot_general (this module)      8.65 ms  fp32
                                              7.19 ms  bf16 operands
  hand-blocked Pallas kernel (below)          9.65 ms  fp32 (best of
                                              two tilings; XLA's own
                                              pipelining wins)

So the production path is the flattened XLA dot — flattening is legal
here because scoring is no-grad and both operands are contiguous, which
ClipLoss's differentiable einsum cannot assume. The Pallas kernel is
kept behind use_kernel=True as the measured-slower alternative (and the
tiling scaffold for future shapes XLA handles badly).

Kernel tiling: grid (N / Nt, K / Kt) with K innermost; the output block
is revisited across the K steps and accumulated in place (fp32). Kt/Nt
are the largest divisors within a VMEM budget; shapes whose K or N has
no 128-aligned divisor fall back to the 2D dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _pick_tile(total: int, cap: int, step: int) -> int:
    """Largest multiple of `step` that divides `total` and is <= cap
    (0 if none)."""
    best = 0
    t = step
    while t <= cap:
        if total % t == 0:
            best = t
        t += step
    return best


@functools.partial(jax.jit, static_argnames=("interpret", "use_kernel"))
def nt_matmul(a: jax.Array, b: jax.Array, interpret: bool = False,
              use_kernel: bool = False) -> jax.Array:
    """[M, K] x [N, K] -> [M, N] in fp32 (A @ B^T).

    Inputs may be fp32 or bf16 (mixed operands: the smaller one is cast
    to the pool's dtype; fp32 accumulation either way). Default is the
    flattened XLA dot (fastest measured form — see module docstring);
    use_kernel=True runs the Pallas blocked kernel instead. Shapes that
    don't tile fall back to the dot.
    """
    M, K = a.shape
    N, Kb = b.shape
    assert K == Kb, (a.shape, b.shape)
    if a.dtype != b.dtype:
        # mixed operands (fp32 preds vs a bf16-stored pool): feed the
        # MXU one dtype; the small operand pays the cast
        a = a.astype(b.dtype)

    def fallback():
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    platform = jax.devices()[0].platform if not interpret else "tpu"
    if platform != "tpu" or not (use_kernel or interpret):
        return fallback()

    # VMEM budget ~12 MB across double-buffered a/b tiles + accumulator
    itemsize = max(a.dtype.itemsize, 2)
    # full-width N block when it fits: the pred operand is then read
    # once instead of N/nt times; K tiles sized to a ~4 MB pool tile
    nt = _pick_tile(N, 2048, _LANE)
    kt = _pick_tile(K, max(_LANE, (4 << 20) // (nt * itemsize) // _LANE * _LANE), _LANE)
    if kt == 0 or nt == 0 or M % 8 != 0 or M > 1024:
        return fallback()

    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    grid = (N // nt, K // kt)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, kt), lambda n, k: (0, k)),
            pl.BlockSpec((nt, kt), lambda n, k: (n, k)),
        ],
        out_specs=pl.BlockSpec((M, nt), lambda n, k: (0, n)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + N * K) * a.dtype.itemsize + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(a, b)
