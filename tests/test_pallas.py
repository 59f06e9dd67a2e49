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


class TestNtMatmul:
    def test_kernel_matches_dot_interpret(self):
        """Blocked A @ B^T kernel (eval/WER scoring GEMM) vs numpy, in
        interpret mode, fp32 + bf16 + mixed operands."""
        import jax.numpy as jnp

        from brainmagick_tpu.ops.pallas_matmul import nt_matmul

        rng = np.random.RandomState(0)
        M, K, N = 16, 128 * 6, 256
        a = jnp.asarray(rng.randn(M, K).astype(np.float32))
        b = jnp.asarray(rng.randn(N, K).astype(np.float32))
        ref = np.asarray(a) @ np.asarray(b).T
        out = nt_matmul(a, b, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)
        out16 = nt_matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          interpret=True)
        np.testing.assert_allclose(np.asarray(out16), ref, rtol=5e-2,
                                   atol=0.5)
        mixed = nt_matmul(a, b.astype(jnp.bfloat16), interpret=True)
        np.testing.assert_allclose(np.asarray(mixed), ref, rtol=5e-2,
                                   atol=0.5)

    def test_fallback_for_untiled_shapes(self):
        import jax.numpy as jnp

        from brainmagick_tpu.ops.pallas_matmul import nt_matmul

        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.randn(8, 100).astype(np.float32))
        b = jnp.asarray(rng.randn(64, 100).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(nt_matmul(a, b)),
            np.asarray(a) @ np.asarray(b).T, rtol=1e-4, atol=1e-4)


def test_retrieval_scores_matches_get_scores():
    """losses.retrieval_scores (the eval/WER fast path) reproduces
    ClipLoss.get_scores for the plain config, the bf16 config, and
    falls back correctly for trim/transform configs."""
    import jax
    import jax.numpy as jnp

    from brainmagick_tpu.losses import ClipLoss, retrieval_scores

    rng = np.random.RandomState(0)
    est = jnp.asarray(rng.randn(6, 8, 16).astype(np.float32))
    cand = jnp.asarray(rng.randn(10, 8, 16).astype(np.float32))
    base = dict(dset_tmin=-0.5, dset_sample_rate=120.)
    variants = [dict(), dict(compute_dtype="bfloat16"),
                dict(tmin=-0.45, tmax=-0.4), dict(linear=5),
                dict(pool=True)]
    for kw in variants:
        clip = ClipLoss(**base, **kw)
        params = clip.init(jax.random.PRNGKey(0), est, cand,
                           method=clip.get_scores)
        want = clip.apply(params, est, cand, method=clip.get_scores)
        got = retrieval_scores(clip, params, est, cand)
        rtol = 3e-2 if kw.get("compute_dtype") else 2e-5
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=rtol, atol=1e-4, err_msg=str(kw))


def test_candidate_blocks_and_device_groups():
    """Host-side candidate blocking: zero-padded fixed-shape blocks in
    the compute dtype, and bounded device groups (the streaming that
    keeps 10-20k-candidate pools out of HBM)."""
    import jax.numpy as jnp

    from brainmagick_tpu.losses import candidate_blocks, iter_device_groups

    pool = np.random.RandomState(0).randn(10, 4, 6).astype(np.float32)
    blocks = candidate_blocks(pool, None, block_size=4)
    assert [b.shape for b in blocks] == [(4, 4, 6)] * 3
    assert all(isinstance(b, np.ndarray) for b in blocks)  # host-side
    np.testing.assert_array_equal(blocks[2][2:], 0)  # zero padding
    np.testing.assert_allclose(blocks[0], pool[:4])

    b16 = candidate_blocks(pool, "bfloat16", block_size=4)
    assert b16[0].dtype == jnp.bfloat16

    # groups respect the byte budget: each block is 4*4*6*4 = 384 bytes
    groups = list(iter_device_groups(blocks, budget_bytes=800,
                                     prefetch=False))
    assert [g0 for g0, _ in groups] == [0, 2]
    assert [len(g) for _, g in groups] == [2, 1]
    flat = np.concatenate([np.asarray(b) for _, g in groups for b in g])
    np.testing.assert_allclose(flat[:10], pool)
    # a budget smaller than one block still makes progress
    tiny = list(iter_device_groups(blocks, budget_bytes=1))
    assert [len(g) for _, g in tiny] == [1, 1, 1]
    # prefetch (default): the next group's transfer is issued ahead, so
    # the group size halves — current + prefetched stay inside budget
    pre = list(iter_device_groups(blocks, budget_bytes=800))
    assert [g0 for g0, _ in pre] == [0, 1, 2]
    assert [len(g) for _, g in pre] == [1, 1, 1]
    flat = np.concatenate([np.asarray(b) for _, g in pre for b in g])
    np.testing.assert_allclose(flat[:10], pool)
    # everything fits in one group -> nothing to overlap, full budget
    one = list(iter_device_groups(blocks, budget_bytes=3 * 384))
    assert [len(g) for _, g in one] == [3]


def test_fused_conv_bn_matches_standard_path():
    """ConvSequence(fused_conv_bn=True) is the same function as the
    Conv+BatchNorm path — outputs, gradients and updated running
    statistics — after the documented param re-map (FusedConvBN_i takes
    Conv_i.kernel and BatchNorm_i.{scale,bias,mean,var})."""
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    from brainmagick_tpu.models.common import ConvSequence

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 40, 16).astype(np.float32))
    kw = dict(channels=(16, 16, 16, 16), kernel=3, stride=1,
              dilation_growth=2, dilation_period=2, skip=True,
              batch_norm=True, bn_conv_bias=False,
              activation=jax.nn.gelu)
    std = ConvSequence(fused_conv_bn=False, **kw)
    fused = ConvSequence(fused_conv_bn=True, **kw)
    var_std = std.init(jax.random.PRNGKey(0), x, train=False)

    params = flax.core.unfreeze(var_std["params"])
    stats = flax.core.unfreeze(var_std.get("batch_stats", {}))
    fused_params, fused_stats = {}, {}
    for i in range(3):
        fused_params[f"FusedConvBN_{i}"] = dict(
            kernel=params[f"Conv_{i}"]["kernel"],
            scale=params[f"BatchNorm_{i}"]["scale"],
            bias=params[f"BatchNorm_{i}"]["bias"])
        fused_stats[f"FusedConvBN_{i}"] = dict(
            mean=stats[f"BatchNorm_{i}"]["mean"],
            var=stats[f"BatchNorm_{i}"]["var"])
    var_fused = {"params": fused_params, "batch_stats": fused_stats}

    # eval mode (running stats)
    ref = std.apply(var_std, x, train=False)
    got = fused.apply(var_fused, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    # train mode: outputs + mutated running statistics
    ref, mut_ref = std.apply(var_std, x, train=True,
                             mutable=["batch_stats"])
    got, mut_got = fused.apply(var_fused, x, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    for i in range(3):
        for leaf in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_got["batch_stats"]
                           [f"FusedConvBN_{i}"][leaf]),
                np.asarray(mut_ref["batch_stats"]
                           [f"BatchNorm_{i}"][leaf]),
                atol=1e-4, rtol=1e-4)

    # gradients through the custom VJP
    def loss_std(p):
        out = std.apply({"params": p, "batch_stats": stats}, x,
                        train=True, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    def loss_fused(p):
        out = fused.apply({"params": p, "batch_stats": fused_stats}, x,
                          train=True, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    g_std = jax.grad(loss_std)(params)
    g_fused = jax.grad(loss_fused)(fused_params)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(g_fused[f"FusedConvBN_{i}"]["kernel"]),
            np.asarray(g_std[f"Conv_{i}"]["kernel"]),
            atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(g_fused[f"FusedConvBN_{i}"]["scale"]),
            np.asarray(g_std[f"BatchNorm_{i}"]["scale"]),
            atol=1e-3, rtol=1e-3)


def test_conv_stats_self_test():
    """Kernel math: fwd vs XLA reference, bwd vs autodiff of the
    reference (runs the interpret path on CPU)."""
    from brainmagick_tpu.ops.pallas_conv_bn import self_test
    self_test()
