"""Pallas kernel tests (interpret mode on CPU; the same kernel is
validated on real TPU hardware — see memory/bench notes)."""

import numpy as np
import pytest

from brainmagick_tpu.ops.pallas_norm import (_reference_impl,
                                             normalize_clamp_peak)


@pytest.mark.parametrize("B,C,T", [(4, 16, 48), (3, 273, 361)])
def test_normalize_clamp_peak_matches_reference(B, C, T):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 4)
    center = jnp.asarray(rng.randn(B, C).astype(np.float32))
    scale = jnp.asarray((0.5 + rng.rand(B, C)).astype(np.float32))
    out_p, peak_p = normalize_clamp_peak(meg, center, scale, 2.5,
                                         clip=True, interpret=True)
    out_r, peak_r = _reference_impl(meg, center, scale, 2.5, clip=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(peak_p), np.asarray(peak_r),
                               atol=1e-5)
    # clamp applied, peak is pre-clamp
    assert np.abs(np.asarray(out_p)).max() <= 2.5 + 1e-6
    assert np.asarray(peak_p).max() > 2.5


def test_no_clip_falls_back():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    meg = jnp.asarray(rng.randn(2, 4, 8).astype(np.float32))
    center = jnp.zeros((2, 4), dtype=jnp.float32)
    scale = jnp.ones((2, 4), dtype=jnp.float32)
    out, peak = normalize_clamp_peak(meg, center, scale, 1.0, clip=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(meg))
