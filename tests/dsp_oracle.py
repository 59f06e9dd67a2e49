"""Direct-summation oracle for the windowed-sinc resample/lowpass math.

The shipped kernels (brainmagick_tpu/ops/dsp.py) implement the
bandlimited polyphase interpolation julius.ResampleFrac uses for the
reference's preprocessing (bm/studies/api.py:334-363). This module
evaluates the SAME mathematical definition by direct summation in
float64 — no polyphase factorization, no convolution, no code shared
with the shipped kernels — so an implementation bug in either side
breaks the agreement. Committed outputs live in
tests/golden/dsp_goldens.npz (regenerate:
``python tests/test_dsp_goldens.py --regen``).

Conventions encoded (julius semantics; verify against the real package
on a connected machine with scripts/check_dsp_vs_julius.py):

resample (ResampleFrac(old_sr, new_sr, zeros=24, rolloff=0.945)):
  * rates reduced by their gcd; passband sr = min(old, new) * rolloff
  * weight of input sample i on output j:
      t = (j/new - i/old) * sr, clamped to [-zeros, zeros]
      h  = sinc(pi t) * cos(pi t / (2 zeros))^2 * (sr / old)
  * input zero-padded outside [0, T) (julius F.pad constant zeros)
  * output length floor(T*new/old) by default, ceil with full=True

lowpass (LowPassFilters(cutoff, zeros=8), cutoff as freq/sample_rate):
  * half_size = int(zeros / cutoff / 2); hann window of 2*half_size+1
  * filt[m] = 2 cutoff hann[m] sinc(2 pi cutoff (m - half_size)),
    normalized to unit sum (julius's "constant leakage" normalization)
  * input zero-padded (julius F.conv1d(padding=half_size))
"""

from __future__ import annotations

import math

import numpy as np


def _sinc(x: np.ndarray) -> np.ndarray:
    """sin(x)/x with the 0 -> 1 limit (unnormalized)."""
    return np.sinc(x / np.pi)


def resample_oracle(x: np.ndarray, old_sr: int, new_sr: int,
                    zeros: int = 24, rolloff: float = 0.945,
                    full: bool = False) -> np.ndarray:
    """float64 direct summation over every (output, input) pair."""
    g = math.gcd(int(old_sr), int(new_sr))
    old, new = int(old_sr) // g, int(new_sr) // g
    x = np.asarray(x, dtype=np.float64)
    if old == new:
        return x
    sr = min(old, new) * rolloff
    length = x.shape[-1]
    float_length = new * length / old
    out_length = int(math.ceil(float_length)) if full \
        else int(float_length)
    flat = x.reshape(-1, length)
    out = np.zeros((flat.shape[0], out_length), dtype=np.float64)
    support = zeros / sr  # seconds of kernel support per side
    for j in range(out_length):
        tj = j / new
        i0 = max(0, int(math.ceil((tj - support) * old)))
        i1 = min(length - 1, int(math.floor((tj + support) * old)))
        if i1 < i0:
            continue
        i = np.arange(i0, i1 + 1, dtype=np.float64)
        t = np.clip((tj - i / old) * sr, -zeros, zeros) * math.pi
        h = _sinc(t) * np.cos(t / (2 * zeros)) ** 2 * (sr / old)
        out[:, j] = flat[:, i0:i1 + 1] @ h
    return out.reshape(x.shape[:-1] + (out_length,))


def lowpass_oracle(x: np.ndarray, cutoff: float,
                   zeros: int = 8) -> np.ndarray:
    """float64 direct summation of the zero-padded unit-DC FIR."""
    x = np.asarray(x, dtype=np.float64)
    if cutoff >= 0.5:
        return x
    half = int(zeros / cutoff / 2)
    m = np.arange(-half, half + 1, dtype=np.float64)
    if cutoff == 0:
        filt = np.zeros_like(m)
    else:
        filt = 2 * cutoff * np.hanning(2 * half + 1) \
            * _sinc(2 * cutoff * math.pi * m)
        filt /= filt.sum()
    length = x.shape[-1]
    flat = x.reshape(-1, length)
    out = np.zeros_like(flat)
    for n in range(length):
        i0 = max(0, n - half)
        i1 = min(length - 1, n + half)
        w = filt[i0 - n + half: i1 - n + half + 1]
        out[:, n] = flat[:, i0:i1 + 1] @ w
    return out.reshape(x.shape)
