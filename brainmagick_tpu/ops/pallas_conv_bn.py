"""Fused dilated-conv + BatchNorm-statistics Pallas kernel.

The paper encoder's hot stack is 10 layers of
``conv1d(k=3, dilation 2^(k%5)) -> BatchNorm -> GELU`` over
[B=256, T=343, C=320] (bm/models/common.py:142-151). XLA lowers this as
(a) the conv, writing y to HBM, (b) a stats reduction pass RE-READING y,
(c) a fused normalize+GELU pass reading y again. The measured BN cost is
~2.4 ms of the 35 ms step (doc/perf_playbook.md).

This kernel computes the conv as k in-VMEM shifted matmuls — each
program holds one batch row's padded [T+2p, C] tile, so the taps hit
VMEM, not HBM (the XLA-level 'dots' lowering loses exactly because its
taps re-read the activation from HBM, scripts/exp_conv_impl.py) — and
accumulates the per-channel sum / sum-of-squares in the SAME pass, so
the stats reduction never re-reads y.

The backward is a custom VJP in plain XLA conv/einsum ops (exactly the
contractions XLA's own conv backward emits, measured 66-87 % MFU
per-HLO), with the sum/sumsq cotangents folded into dY first.

Verdict from the chip (scripts/exp_conv_bn.py, fwd+bwd over the paper
dilation schedule): **XLA wins 1.6x** (26.97 vs 42.35 ms) — its conv
lowering beats in-VMEM shifted matmuls at M=343/K=320, and deeper-M
variants hit Mosaic "unsupported shape cast" limits on strided-slice
reshapes. Full table in doc/perf_playbook.md. The kernel stays behind
`simpleconv.fused_conv_bn=true` as the measured negative result, with
its correctness suite green (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# a block of batch rows per program: [rows, T + 2*pad, C] stays small
# at the paper shapes, and the k taps become static in-VMEM slices (no
# halo DMA machinery needed)


def _ref_conv_stats(x: jax.Array, w: jax.Array, dilation: int
                    ) -> tp.Tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-XLA reference: dilated SAME conv + per-channel totals.
    x [B, T, C], w [k, C, O] -> (y [B, T, O], s [O], ss [O]).
    y in x.dtype (bf16 path), sums in fp32 from the fp32 accumulator."""
    k = w.shape[0]
    pad = (k // 2) * dilation
    y32 = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    y = y32.astype(x.dtype)
    s = jnp.sum(y32, axis=(0, 1))
    ss = jnp.sum(y32 * y32, axis=(0, 1))
    return y, s, ss


def _kernel(x_ref, w_ref, y_ref, s_ref, ss_ref, *, k: int, dilation: int,
            t_out: int, rows: int):
    """A block of `rows` batch rows: y[r, t] = sum_j x[r, t + j*d] @ w[j]
    (x pre-padded per row, so slicing each row's tap then flattening the
    rows into one [rows*T, C] matmul is exact), plus the per-channel
    sum / sum-of-squares of the fp32 accumulator."""
    O = w_ref.shape[2]
    # strictly 2-D dots (Mosaic rejects both reshaping the strided tap
    # slice to [rows*T, C] and the 3-D dot_general form); several rows
    # per program amortize the per-program grid overhead that dominated
    # the rows=1 variant
    s_acc = jnp.zeros((1, O), dtype=jnp.float32)
    ss_acc = jnp.zeros((1, O), dtype=jnp.float32)
    for r in range(rows):
        acc = jnp.zeros((t_out, O), dtype=jnp.float32)
        for j in range(k):
            tap = x_ref[r, j * dilation: j * dilation + t_out, :]
            acc = acc + jnp.dot(tap, w_ref[j],
                                preferred_element_type=jnp.float32)
        y_ref[r] = acc.astype(y_ref.dtype)
        s_acc = s_acc + jnp.sum(acc, axis=0, keepdims=True)
        ss_acc = ss_acc + jnp.sum(acc * acc, axis=0, keepdims=True)
    s_ref[0] = s_acc
    ss_ref[0] = ss_acc


def _pallas_conv_stats(x: jax.Array, w: jax.Array, dilation: int,
                       interpret: bool = False
                       ) -> tp.Tuple[jax.Array, jax.Array, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    k, _, O = w.shape
    pad = (k // 2) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t_pad = T + 2 * pad

    # several batch rows per program: one [rows*T, C] x [C, O] matmul
    # per tap keeps the MXU M-dimension deep (M=343 alone measured 1.6x
    # slower than XLA's conv); VMEM bounds the row count
    rows = 1
    for cand in (8, 4, 2):
        acc_bytes = cand * T * O * 4
        x_bytes = cand * t_pad * C * xp.dtype.itemsize
        if B % cand == 0 and acc_bytes + x_bytes < 6 << 20:
            rows = cand
            break
    n_blocks = B // rows

    kernel = functools.partial(_kernel, k=k, dilation=dilation, t_out=T,
                               rows=rows)
    flops = 2 * B * T * C * O * k
    y, s, ss = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows, t_pad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole weight block every program: the index map is
            # constant, so it stays resident across the grid
            pl.BlockSpec((k, C, O), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, T, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # [n_blocks, 1, O] so the block's last two dims equal the
            # array dims (TPU block tiling needs /8, /128 or full-dim)
            pl.BlockSpec((1, 1, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, O), x.dtype),
            jax.ShapeDtypeStruct((n_blocks, 1, O), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, O), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size * xp.dtype.itemsize
                            + w.size * w.dtype.itemsize * n_blocks
                            + B * T * O * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xp, w)
    return y, s[:, 0].sum(axis=0), ss[:, 0].sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_stats(x: jax.Array, w: jax.Array, dilation: int = 1,
               impl: str = "auto"
               ) -> tp.Tuple[jax.Array, jax.Array, jax.Array]:
    """Dilated SAME conv + per-row channel sums in one pass.

    x [B, T, C], w [k, C, O] (odd k, stride 1, no bias — the
    BatchNorm-cancelled bias is elided, see ConvSequence.bn_conv_bias).
    Returns (y [B, T, O] in x.dtype, s [O] fp32, ss [O] fp32 — the
    per-channel batch totals of y and y^2); mean/var follow as
    s/(B*T) etc. (batch_mean_var) — the caller applies
    the normalize+GELU epilogue, which XLA fuses with whatever follows.

    impl: 'auto' = Pallas on TPU / XLA elsewhere; 'pallas' | 'xla' |
    'interpret' force a path.
    """
    return _conv_stats_fwd(x, w, dilation, impl)[0]


def _dispatch(x, w, dilation, impl):
    if impl == "xla":
        return _ref_conv_stats(x, w, dilation)
    if impl == "interpret":
        return _pallas_conv_stats(x, w, dilation, interpret=True)
    if impl == "pallas" or (impl == "auto"
                            and jax.default_backend() == "tpu"):
        return _pallas_conv_stats(x, w, dilation)
    return _ref_conv_stats(x, w, dilation)


def _conv_stats_fwd(x, w, dilation, impl):
    out = _dispatch(x, w, dilation, impl)
    y = out[0]
    return out, (x, w, y)


def _conv_stats_bwd(dilation, impl, res, cot):
    x, w, y = res
    dy, ds, dss = cot
    k = w.shape[0]
    pad = (k // 2) * dilation
    # fold the stats cotangents into dY: s = sum y, ss = sum y^2
    dY = (dy.astype(jnp.float32) + ds[None, None, :]
          + 2.0 * y.astype(jnp.float32) * dss[None, None, :])
    dY = dY.astype(x.dtype)
    # dx: conv of dY with the flipped, transposed, equally-dilated
    # kernel at SAME padding — the exact contraction XLA's
    # conv-backward-input emits
    w_flip = jnp.flip(w, axis=0).swapaxes(1, 2)  # [k, O, C]
    dx = lax.conv_general_dilated(
        dY, w_flip, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dw[j] = x_shifted_j^T @ dY over (B, T) — conv-backward-weight
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    T = x.shape[1]
    dws = [jnp.einsum("btc,bto->co",
                      xp[:, j * dilation: j * dilation + T, :], dY,
                      preferred_element_type=jnp.float32)
           for j in range(k)]
    dw = jnp.stack(dws).astype(w.dtype)
    return dx, dw


conv_stats.defvjp(_conv_stats_fwd, _conv_stats_bwd)


def batch_mean_var(s: jax.Array, ss: jax.Array, n: int
                   ) -> tp.Tuple[jax.Array, jax.Array]:
    """Biased batch statistics from the per-channel totals (flax
    nn.BatchNorm semantics: var = E[y^2] - E[y]^2)."""
    mean = s / n
    var = ss / n - mean * mean
    return mean, jnp.maximum(var, 0.0)


def self_test(seed: int = 0) -> None:
    """Numeric check of fwd (vs XLA ref) and bwd (vs autodiff of ref);
    used by tests and runnable standalone on any backend."""
    rng = np.random.RandomState(seed)
    B, T, C, O, k, d = 3, 37, 24, 16, 3, 4
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(0.3 * rng.randn(k, C, O).astype(np.float32))

    ref = _ref_conv_stats(x, w, d)
    got = conv_stats(x, w, d, "auto")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)

    def loss_ref(x, w):
        y, s, ss = _ref_conv_stats(x, w, d)
        return (jnp.sum(y ** 2) + jnp.sum(jnp.sin(s))
                + jnp.sum(jnp.sqrt(ss + 1.0)))

    def loss_fused(x, w):
        y, s, ss = conv_stats(x, w, d, "auto")
        return (jnp.sum(y ** 2) + jnp.sum(jnp.sin(s))
                + jnp.sum(jnp.sqrt(ss + 1.0)))

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=1e-3, rtol=1e-3)


if __name__ == "__main__":
    self_test()
    print("pallas_conv_bn self_test OK on", jax.default_backend())
