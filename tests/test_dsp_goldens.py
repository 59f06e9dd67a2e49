"""Golden regression for the resample/lowpass kernels.

Committed float64 direct-summation outputs (tests/dsp_oracle.py) pin
the shipped JAX kernels for every (old_sr, new_sr) pair the four
studies use plus the audio rates, at NON-divisible lengths so the
floor output-length convention is pinned too. The tests go red if
brainmagick_tpu/ops/dsp.py drifts numerically (padding, window, scale,
phase, output length). Regenerate after an INTENDED semantic change:
``python tests/test_dsp_goldens.py --regen``.

On a connected machine, scripts/check_dsp_vs_julius.py diffs both the
oracle and the shipped kernels against the real julius package.
"""

from pathlib import Path

import numpy as np
import pytest

from dsp_oracle import lowpass_oracle, resample_oracle

GOLDEN = Path(__file__).parent / "golden" / "dsp_goldens.npz"

# (old_sr, new_sr, n_samples): the studies' MEG/EEG rates -> 120 Hz
# (schoffelen CTF 1200, gwilliams KIT 1000, brennan 500, broderick 128;
# bm/studies/api.py:334-363) and the audio rates -> 16 kHz wav2vec
# input (bm/features/audio.py:66,186). Lengths chosen non-divisible.
RESAMPLE_CASES = [
    (1200, 120, 3601),
    (1000, 120, 3001),
    (500, 120, 2503),
    (128, 120, 1285),
    (48000, 16000, 9601),
    (44100, 16000, 8821),
]

# (cutoff, zeros, n): the solver's in-loop lowpass (zeros=5,
# bm/solver.py:279) and the preprocessing highpass complement
# (zeros=8, bm/studies/api.py:355-356)
LOWPASS_CASES = [
    (30.0 / 120.0, 5, 1200),
    (0.5 / 120.0, 8, 3000),
]


def _signal(n: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64)
    chirp = np.sin(2 * np.pi * t * t * 1e-5)
    return np.stack([rng.randn(n), chirp]).astype(np.float32)


def _compute_goldens() -> dict:
    out = {}
    for old, new, n in RESAMPLE_CASES:
        x = _signal(n, seed=old + new)
        out[f"rs_{old}_{new}_in"] = x
        out[f"rs_{old}_{new}_out"] = resample_oracle(x, old, new)
        out[f"rs_{old}_{new}_out_full"] = resample_oracle(
            x, old, new, full=True)
    for cutoff, zeros, n in LOWPASS_CASES:
        x = _signal(n, seed=zeros)
        key = f"lp_{zeros}_{n}"
        out[key + "_in"] = x
        out[key + "_out"] = lowpass_oracle(x, cutoff, zeros)
    return out


def test_oracle_matches_goldens():
    """Pin the oracle itself: edits to dsp_oracle.py cannot silently
    move the goldens."""
    golden = np.load(GOLDEN)
    fresh = _compute_goldens()
    assert set(fresh) == set(golden.files)
    for key, val in fresh.items():
        np.testing.assert_allclose(val, golden[key], atol=1e-12,
                                   err_msg=key)


@pytest.mark.parametrize("old,new,n", RESAMPLE_CASES)
def test_resample_matches_golden(old, new, n):
    import jax.numpy as jnp

    from brainmagick_tpu.ops import dsp

    golden = np.load(GOLDEN)
    x = golden[f"rs_{old}_{new}_in"]
    want = golden[f"rs_{old}_{new}_out"]
    got = np.asarray(dsp.resample(jnp.asarray(x), old, new))
    assert got.shape == want.shape, "output-length convention drifted"
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)
    want_full = golden[f"rs_{old}_{new}_out_full"]
    got_full = np.asarray(dsp.resample(jnp.asarray(x), old, new, full=True))
    assert got_full.shape == want_full.shape
    np.testing.assert_allclose(got_full, want_full, atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("cutoff,zeros,n", LOWPASS_CASES)
def test_lowpass_matches_golden(cutoff, zeros, n):
    import jax.numpy as jnp

    from brainmagick_tpu.ops import dsp

    golden = np.load(GOLDEN)
    x = golden[f"lp_{zeros}_{n}_in"]
    want = golden[f"lp_{zeros}_{n}_out"]
    got = np.asarray(dsp.lowpass_filter(jnp.asarray(x), cutoff,
                                        zeros=zeros))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_highpass_matches_golden():
    """highpass = x - lowpass exactly (bm/studies/api.py:355-356)."""
    import jax.numpy as jnp

    from brainmagick_tpu.ops import dsp

    golden = np.load(GOLDEN)
    cutoff, zeros, n = LOWPASS_CASES[1]
    x = golden[f"lp_{zeros}_{n}_in"]
    want = x.astype(np.float64) - golden[f"lp_{zeros}_{n}_out"]
    got = np.asarray(dsp.highpass_filter(jnp.asarray(x), cutoff,
                                         zeros=zeros))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        GOLDEN.parent.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN, **_compute_goldens())
        print(f"wrote {GOLDEN} ({len(np.load(GOLDEN).files)} arrays)")
