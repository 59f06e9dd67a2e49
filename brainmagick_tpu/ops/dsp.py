"""Signal-processing kernels as XLA-compiled JAX ops.

These rebuild the numerical preprocessing the reference delegates to the
`julius` library (bm/studies/api.py:334-363 uses julius.ResampleFrac +
julius.lowpass_filter; bm/solver.py:279 lowpasses the MEG inside the hot
loop). The algorithms are the standard windowed-sinc designs:

  * `resample`: polyphase sinc interpolation — for each output phase
    p in [0, new_sr) a windowed-sinc kernel evaluated at the fractional
    offsets, applied as a strided conv. On TPU the conv lowers to MXU
    matmuls batched over channels.
  * `lowpass_filter`: zero-phase FIR windowed-sinc smoother, normalized
    to unit DC gain; `highpass_filter(x) = x - lowpass(x)` exactly like
    the reference's highpass-by-subtraction (bm/studies/api.py:355-356).

All kernels take cutoffs as fractions of the sample rate (julius
convention) and operate on [..., T] arrays, vectorized over leading dims.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


#: Version of the DSP numerics. Bump whenever resample/filter output
#: changes for the same inputs (kernel design, boundary padding, output
#: length): every disk cache derived from these kernels (preprocessed
#: raws, feature tracks, fitted scalers) folds this into its key, so a
#: semantics change invalidates stale artifacts instead of silently
#: mixing conventions. v2 = julius parity (zero boundary padding, floor
#: output length — round 4; v1 was edge padding + ceil length).
DSP_VERSION = 2


def _sinc(x: np.ndarray) -> np.ndarray:
    """sin(x)/x with the 0 -> 1 limit (note: NOT numpy's normalized sinc)."""
    return np.sinc(x / np.pi)


@lru_cache(maxsize=None)
def _resample_kernel(old_sr: int, new_sr: int, zeros: int, rolloff: float):
    """Polyphase windowed-sinc kernel bank.

    Returns (kernel [new_sr, 1, width], width_left) with old_sr/new_sr
    already reduced by their gcd. One row per output phase; applying the
    bank as a conv with stride old_sr yields all phases of one output
    block at once.
    """
    g = math.gcd(old_sr, new_sr)
    old_sr //= g
    new_sr //= g
    assert new_sr != old_sr
    # effective passband: keep rolloff fraction of the target Nyquist
    sr = min(new_sr, old_sr) * rolloff
    width = int(math.ceil(zeros * old_sr / sr))
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros) * math.pi
        window = np.cos(t / zeros / 2) ** 2
        kernels.append(_sinc(t) * window * (sr / old_sr))
    # cache plain numpy: jnp arrays must not be created inside one trace
    # and reused in another (tracer leak)
    kernel = np.stack(kernels).astype(np.float32)[:, None, :]
    return kernel, width


@partial(jax.jit, static_argnames=("old_sr", "new_sr", "zeros", "rolloff",
                                   "output_length", "padded_length"))
def _resample_impl(x: jax.Array, old_sr: int, new_sr: int, zeros: int,
                   rolloff: float, output_length: int,
                   padded_length: int) -> jax.Array:
    kernel_np, width = _resample_kernel(old_sr, new_sr, zeros, rolloff)
    kernel = jnp.asarray(kernel_np)
    g = math.gcd(old_sr, new_sr)
    old_g, new_g = old_sr // g, new_sr // g
    shape = x.shape
    length = shape[-1]
    x2 = x.reshape(-1, 1, length)
    # zero padding = julius.ResampleFrac's F.pad((width, width+old_sr))
    # boundary convention; the extra bucket zeros only feed outputs past
    # output_length, which are truncated. Bucketing lets arbitrary input
    # lengths share one compilation per 1s bucket.
    x2 = jnp.pad(x2, ((0, 0), (0, 0),
                      (width, padded_length - length + width + old_g)))
    # [N, new_g, T//old_g]: one conv produces every output phase
    ys = jax.lax.conv_general_dilated(
        x2, kernel, window_strides=(old_g,), padding="VALID",
        dimension_numbers=("NCT", "OIT", "NCT"),
        preferred_element_type=jnp.float32)
    y = ys.transpose(0, 2, 1).reshape(x2.shape[0], -1)
    y = y[:, :output_length]
    return y.reshape(*shape[:-1], output_length)


def resample(x: jax.Array, old_sr: int, new_sr: int, *, zeros: int = 24,
             rolloff: float = 0.945, full: bool = False) -> jax.Array:
    """Resample [..., T] from old_sr to new_sr (integer rates).

    Matches the reference's julius.ResampleFrac semantics
    (bm/studies/api.py:353-354): windowed-sinc polyphase with `zeros`
    zero-crossings per side, a `rolloff` anti-aliasing margin, zero
    boundary padding, and julius's default output length
    floor(T*new/old) (``full=True`` gives the ceil variant). Pinned by
    tests/golden/dsp_goldens.npz against an independent
    direct-summation oracle (tests/dsp_oracle.py); cross-check against
    real julius with scripts/check_dsp_vs_julius.py on a connected
    machine.
    """
    old_sr, new_sr = int(old_sr), int(new_sr)
    if old_sr == new_sr:
        return x
    length = x.shape[-1]
    float_length = new_sr * length / old_sr
    output_length = int(math.ceil(float_length)) if full \
        else int(float_length)
    padded_length = -(-length // old_sr) * old_sr  # 1s buckets
    return _resample_impl(x, old_sr, new_sr, zeros, rolloff, output_length,
                          padded_length)


@lru_cache(maxsize=None)
def _lowpass_kernel(cutoff: float, zeros: int):
    """Unit-DC-gain windowed-sinc FIR for a cutoff given as freq/sample_rate."""
    half_size = int(zeros / cutoff / 2)
    window = np.hanning(2 * half_size + 1)
    time = np.arange(-half_size, half_size + 1, dtype=np.float64)
    if cutoff == 0:
        filt = np.zeros_like(time)
    else:
        filt = 2 * cutoff * window * _sinc(2 * cutoff * math.pi * time)
        filt /= filt.sum()  # exact unit gain at DC
    return filt.astype(np.float32)[None, None, :], half_size


@partial(jax.jit, static_argnames=("cutoff", "zeros"))
def _lowpass_impl(x: jax.Array, cutoff: float, zeros: int) -> jax.Array:
    kernel_np, half_size = _lowpass_kernel(cutoff, zeros)
    kernel = jnp.asarray(kernel_np)
    shape = x.shape
    x2 = x.reshape(-1, 1, shape[-1])
    # zero padding = julius.LowPassFilters' F.conv1d(padding=half_size)
    x2 = jnp.pad(x2, ((0, 0), (0, 0), (half_size, half_size)))
    y = jax.lax.conv_general_dilated(
        x2, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCT", "OIT", "NCT"),
        preferred_element_type=jnp.float32)
    return y.reshape(shape)

def lowpass_filter(x: jax.Array, cutoff: float, *, zeros: int = 8) -> jax.Array:
    """Zero-phase FIR lowpass; `cutoff` is a fraction of the sample rate.

    Reference semantics: julius.lowpass_filter as used at
    bm/solver.py:279 (zeros=5) and bm/studies/api.py:356 (zeros=8).
    """
    if cutoff >= 0.5:
        return x
    return _lowpass_impl(x, float(cutoff), int(zeros))


def highpass_filter(x: jax.Array, cutoff: float, *, zeros: int = 8) -> jax.Array:
    """Highpass by lowpass subtraction (bm/studies/api.py:355-356)."""
    return x - lowpass_filter(x, cutoff, zeros=zeros)
