"""Model shape tests (mirrors bm/test_model.py coverage) + paper config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brainmagick_tpu.models import ConvRNN, DeepMel, SimpleConv


def _batch(B=2, C=16, T=48, F=8, n_subjects=4, seed=0):
    rng = np.random.RandomState(seed)
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    features = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    subjects = jnp.asarray(rng.randint(0, n_subjects, B))
    positions = jnp.asarray(rng.rand(B, C, 2).astype(np.float32))
    return meg, features, subjects, positions


class TestSimpleConv:
    def _init_and_run(self, model, inputs, subjects, positions, train=False):
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        variables = model.init(rngs, inputs, subjects, positions,
                               train=False)
        out, _ = model.apply(
            variables, inputs, subjects, positions, train=train,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats", "losses"])
        return out

    def test_basic_shapes(self):
        meg, _, subjects, positions = _batch()
        model = SimpleConv(in_channels=dict(meg=16), out_channels=10,
                           hidden=dict(meg=24), depth=2)
        out = self._init_and_run(model, dict(meg=meg), subjects, positions)
        assert out.shape == (2, 10, 48)

    def test_paper_config_small(self):
        """Paper architecture (clip_conv.yaml) at reduced width."""
        meg, _, subjects, positions = _batch(C=20, T=61)
        model = SimpleConv(
            in_channels=dict(meg=20), out_channels=32,
            hidden=dict(meg=48), depth=4, kernel_size=3,
            dilation_period=5, skip=True, subject_layers=True,
            subject_dim=0, complex_out=True, glu=2, glu_context=1,
            merger=True, merger_channels=16, merger_pos_dim=32,
            gelu=True, batch_norm=True, initial_linear=16, n_subjects=4)
        out = self._init_and_run(model, dict(meg=meg), subjects, positions,
                                 train=True)
        assert out.shape == (2, 32, 61)
        assert np.isfinite(np.asarray(out)).all()

    def test_output_layout_btc_is_transposed_bct(self):
        """output_layout='btc' returns the same values as the default
        [B, out, T] layout, just channels-last (same params)."""
        meg, _, subjects, positions = _batch(C=20, T=61)
        kw = dict(in_channels=dict(meg=20), out_channels=32,
                  hidden=dict(meg=48), depth=2, kernel_size=3,
                  dilation_period=2, skip=True, subject_layers=True,
                  subject_dim=0, complex_out=True, glu=2, glu_context=1,
                  merger=True, merger_channels=16, merger_pos_dim=32,
                  gelu=True, batch_norm=True, initial_linear=16,
                  n_subjects=4)
        m_bct = SimpleConv(**kw)
        m_btc = SimpleConv(**kw, output_layout="btc")
        variables = m_bct.init({"params": jax.random.PRNGKey(0)},
                               dict(meg=meg), subjects, positions,
                               train=False)
        o_bct = m_bct.apply(variables, dict(meg=meg), subjects, positions)
        o_btc = m_btc.apply(variables, dict(meg=meg), subjects, positions)
        assert o_btc.shape == (2, 61, 32)
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(o_btc, 1, 2)),
                                   np.asarray(o_bct), rtol=1e-6)

    def test_bn_conv_bias_elision_is_exact(self):
        """bn_conv_bias=False drops conv biases that BatchNorm cancels:
        the train-mode output matches the reference structure even with
        large nonzero biases (BN subtracts the batch mean, so any
        constant shift vanishes); GLU convs (no BN after them) keep
        theirs."""
        from brainmagick_tpu.models.common import ConvSequence

        rng = np.random.RandomState(0)
        channels = (10,) + (16,) * 4
        x = jnp.asarray(rng.randn(2, 37, 10).astype(np.float32))
        base = dict(kernel=3, stride=1, dilation_growth=2,
                    dilation_period=2, skip=True, glu=2, glu_context=1,
                    batch_norm=True)
        e1 = ConvSequence(channels, **base)
        e0 = ConvSequence(channels, **base, bn_conv_bias=False)
        v1 = e1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v0 = e0.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        p1, p0, n_elided = dict(v1["params"]), dict(v0["params"]), 0
        for name, mod in v1["params"].items():
            if (name.startswith("Conv_") and "bias" in mod
                    and "bias" not in v0["params"][name]):
                p1[name] = dict(mod, bias=jnp.full_like(mod["bias"], 7.5))
                p0[name] = {k: v for k, v in mod.items() if k != "bias"}
                n_elided += 1
            else:
                p0[name] = mod
        assert n_elided == 4  # stack convs; Conv_2/Conv_5 are GLU
        r1, _ = e1.apply({"params": p1, "batch_stats": v1["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        r0, _ = e0.apply({"params": p0, "batch_stats": v0["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                                   rtol=2e-4, atol=2e-4)
        assert any(n.startswith("Conv_") and "bias" in m
                   for n, m in v0["params"].items()), \
            "GLU convs must keep their biases"

    def test_encode_task_two_branches(self):
        meg, features, subjects, positions = _batch()
        model = SimpleConv(
            in_channels=dict(meg=16, features=8), out_channels=16,
            hidden=dict(meg=24, features=24), depth=2, linear_out=True,
            n_subjects=4)
        out = self._init_and_run(model, dict(meg=meg, features=features),
                                 subjects, positions)
        assert out.shape == (2, 16, 48)

    def test_concatenate(self):
        meg, features, subjects, positions = _batch()
        model = SimpleConv(
            in_channels=dict(meg=16, features=8), out_channels=16,
            hidden=dict(meg=16, features=16), depth=2, concatenate=True,
            linear_out=True, n_subjects=4)
        out = self._init_and_run(model, dict(meg=meg, features=features),
                                 subjects, positions)
        assert out.shape == (2, 16, 48)

    def test_invalid_positions_masked(self):
        """Padded sensors must not contribute to merger output."""
        from brainmagick_tpu.studies.api import INVALID_POSITION

        meg, _, subjects, positions = _batch(C=16)
        positions = positions.at[:, 8:].set(INVALID_POSITION)
        meg_noise = meg.at[:, 8:].set(1e6)  # junk in padded channels
        model = SimpleConv(in_channels=dict(meg=16), out_channels=4,
                           hidden=dict(meg=8), depth=1, merger=True,
                           merger_channels=8, merger_pos_dim=32,
                           subject_dim=0, linear_out=True, n_subjects=4)
        rngs = {"params": jax.random.PRNGKey(0)}
        variables = model.init(rngs, dict(meg=meg), subjects, positions,
                               train=False)
        out1 = model.apply(variables, dict(meg=meg), subjects, positions)
        out2 = model.apply(variables, dict(meg=meg_noise), subjects,
                           positions)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-4)

    def test_subject_layers_differ(self):
        meg, _, subjects, positions = _batch(B=2)
        model = SimpleConv(in_channels=dict(meg=16), out_channels=4,
                           hidden=dict(meg=8), depth=1,
                           subject_layers=True, subject_dim=0,
                           linear_out=True, n_subjects=4)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               dict(meg=meg), subjects, positions)
        out_a = model.apply(variables, dict(meg=meg),
                            jnp.asarray([0, 0]), positions)
        out_b = model.apply(variables, dict(meg=meg),
                            jnp.asarray([1, 1]), positions)
        assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-4


class TestSimpleConvExtras:
    def test_stft_branch(self):
        meg, _, subjects, positions = _batch(C=8, T=64)
        model = SimpleConv(in_channels=dict(meg=8), out_channels=6,
                           hidden=dict(meg=16), depth=2, n_fft=16,
                           linear_out=True, subject_dim=0, n_subjects=4)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               dict(meg=meg), subjects, positions,
                               train=False)
        out = model.apply(variables, dict(meg=meg), subjects, positions)
        assert out.shape == (2, 6, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_dual_path_rnn(self):
        from brainmagick_tpu.models.common import DualPathRNN

        x = jnp.asarray(np.random.RandomState(0).randn(
            2, 25, 8).astype(np.float32))
        model = DualPathRNN(channels=8, depth=1, inner_length=10)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        out = model.apply(variables, x)
        assert out.shape == (2, 25, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_channel_dropout_rescale(self):
        from brainmagick_tpu.models.common import ChannelDropout

        rng = np.random.RandomState(0)
        meg = jnp.asarray(rng.randn(4, 30, 16).astype(np.float32))
        positions = jnp.asarray(rng.rand(4, 16, 2).astype(np.float32))
        model = ChannelDropout(dropout=0.3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, meg, positions, train=True)
        # eval: identity on valid channels
        out_eval = model.apply(variables, meg, positions, train=False)
        np.testing.assert_allclose(np.asarray(out_eval), np.asarray(meg),
                                   atol=1e-6)
        # train: some sensors dropped, others rescaled up
        out_train = model.apply(variables, meg, positions, train=True,
                                rngs={"dropout": jax.random.PRNGKey(7)})
        arr = np.asarray(out_train)
        orig = np.abs(np.asarray(meg))
        # every entry is either dropped (0) or rescaled up by 1/p_keep
        assert ((arr == 0) | (np.abs(arr) >= orig - 1e-5)).all()
        assert not np.allclose(arr, np.asarray(meg))


class TestConvRNN:
    def test_shapes(self):
        meg, features, subjects, positions = _batch(T=47)
        model = ConvRNN(in_channels=dict(meg=16, features=8),
                        out_channels=16, hidden=dict(meg=16, features=16),
                        depth=2, lstm=1, n_subjects=4)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               dict(meg=meg, features=features), subjects,
                               train=False)
        out = model.apply(variables, dict(meg=meg, features=features),
                          subjects)
        assert out.shape == (2, 16, 47)

    def test_attention(self):
        meg, _, subjects, positions = _batch(T=40)
        model = ConvRNN(in_channels=dict(meg=16), out_channels=8,
                        hidden=dict(meg=16), depth=1, lstm=1, attention=1,
                        heads=4, n_subjects=4)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               dict(meg=meg), subjects, train=False)
        out, _ = model.apply(variables, dict(meg=meg), subjects,
                             train=True, mutable=["batch_stats"])
        assert out.shape == (2, 8, 40)


class TestDeepMel:
    def test_shapes(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 40, 48).astype(np.float32))
        model = DeepMel(n_in_channels=40, n_hidden_channels=32,
                        n_hidden_layers=4, n_out_channels=24)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False)
        out = model.apply(variables, x)
        assert out.shape == (2, 24, 48)


def test_merger_per_recording_equals_per_sample():
    """The per-recording score path (R softmax rows + gather) must be
    numerically identical to per-sample scores: positions are constant
    per recording so the gather commutes with the softmax."""
    from brainmagick_tpu.models.common import ChannelMerger, fourier_emb

    rng = np.random.RandomState(0)
    R, B, C, T, O, D = 3, 8, 12, 20, 6, 32
    rec_positions = jnp.asarray(rng.rand(R, C, 2).astype(np.float32))
    rec_index = jnp.asarray(rng.randint(0, R, B))
    positions = rec_positions[rec_index]
    meg = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    table = fourier_emb(rec_positions, D)

    merger = ChannelMerger(O, pos_dim=D)
    variables = merger.init(jax.random.PRNGKey(0), meg, positions,
                            rec_index)
    per_sample = merger.apply(variables, meg, positions, rec_index,
                              pos_emb=table[rec_index])
    per_recording = merger.apply(variables, meg, positions, rec_index,
                                 pos_emb=table, rec_index=rec_index,
                                 rec_positions=rec_positions)
    np.testing.assert_allclose(np.asarray(per_sample),
                               np.asarray(per_recording), rtol=1e-4,
                               atol=1e-6)


def test_merger_all_invalid_recording_row_keeps_grads_finite():
    """A recording row whose every sensor is padded must not poison the
    heads gradient: softmax of an all--inf row is NaN and its VJP turns
    even zero cotangents into NaN (regression for the per-recording
    path with empty recording indices)."""
    from brainmagick_tpu.models.common import ChannelMerger, fourier_emb
    from brainmagick_tpu.studies.api import INVALID_POSITION

    rng = np.random.RandomState(0)
    R, B, C, T, O, D = 3, 6, 10, 16, 4, 32
    rec_positions = rng.rand(R, C, 2).astype(np.float32)
    rec_positions[1] = INVALID_POSITION      # recording 1: no sensors
    rec_positions = jnp.asarray(rec_positions)
    rec_index = jnp.asarray([0, 2, 0, 2, 2, 0])  # row 1 never gathered
    positions = rec_positions[rec_index]
    meg = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    table = fourier_emb(rec_positions, D)

    merger = ChannelMerger(O, pos_dim=D)
    variables = merger.init(jax.random.PRNGKey(0), meg, positions,
                            rec_index)

    def loss(params):
        out = merger.apply({"params": params}, meg, positions, rec_index,
                           pos_emb=table, rec_index=rec_index,
                           rec_positions=rec_positions)
        return (out ** 2).sum()

    value = loss(variables["params"])
    grads = jax.grad(loss)(variables["params"])
    assert np.isfinite(float(value))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all(), \
            "NaN gradient from the all-invalid recording row"


class TestClipLoss:
    def test_identity_retrieval(self):
        from brainmagick_tpu.losses import ClipLoss

        rng = np.random.RandomState(0)
        cand = jnp.asarray(rng.randn(6, 8, 20).astype(np.float32))
        loss_mod = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.)
        variables = loss_mod.init(jax.random.PRNGKey(0), cand, cand,
                                  method=loss_mod.get_scores)
        probs = loss_mod.apply(variables, cand, cand,
                               method=loss_mod.get_probabilities)
        # the matching candidate should dominate
        assert (np.asarray(probs).argmax(axis=1) == np.arange(6)).all()
        loss_val = loss_mod.apply(variables, cand, cand)
        rand_est = jnp.asarray(rng.randn(6, 8, 20).astype(np.float32))
        loss_rand = loss_mod.apply(variables, rand_est, cand)
        assert float(loss_val) < float(loss_rand)

    def test_extra_negatives_and_masks(self):
        from brainmagick_tpu.losses import ClipLoss

        rng = np.random.RandomState(0)
        est = jnp.asarray(rng.randn(4, 8, 20).astype(np.float32))
        cand = jnp.concatenate(
            [est, jnp.asarray(rng.randn(6, 8, 20).astype(np.float32))])
        loss_mod = ClipLoss()
        variables = loss_mod.init(jax.random.PRNGKey(0), est, cand,
                                  method=loss_mod.get_scores)
        full = loss_mod.apply(variables, est, cand)
        assert np.isfinite(float(full))
        # candidate_weight masking the extra negatives == smaller pool
        cw = jnp.asarray([1.] * 4 + [0.] * 6)
        masked = loss_mod.apply(variables, est, cand, candidate_weight=cw)
        only4 = loss_mod.apply(variables, est, cand[:4])
        np.testing.assert_allclose(float(masked), float(only4), rtol=1e-5)
        # sample_weight zeroes a row's contribution
        sw = jnp.asarray([1., 1., 0., 1.])
        w = loss_mod.apply(variables, est, cand, sample_weight=sw)
        assert np.isfinite(float(w))


    def test_bf16_score_dtype_close_to_fp32(self):
        """compute_dtype='bfloat16' (MXU-rate scores with fp32
        accumulation) matches the fp32 loss within bf16 tolerance and
        preserves retrieval."""
        from brainmagick_tpu.losses import ClipLoss

        rng = np.random.RandomState(0)
        est = jnp.asarray(rng.randn(6, 8, 20).astype(np.float32))
        cand = jnp.asarray(rng.randn(6, 8, 20).astype(np.float32))
        f32 = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.)
        b16 = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.,
                       compute_dtype="bfloat16")
        v = f32.init(jax.random.PRNGKey(0), est, cand,
                     method=f32.get_scores)
        loss32 = float(f32.apply(v, est, cand))
        loss16 = float(b16.apply(v, est, cand))
        np.testing.assert_allclose(loss16, loss32, rtol=2e-2)
        probs16 = b16.apply(v, cand, cand, method=b16.get_probabilities)
        assert (np.asarray(probs16).argmax(axis=1) == np.arange(6)).all()

    def test_est_layout_btc_matches_bct(self):
        """est_layout='btc' (channels-last estimates, skipping the
        model's exit transpose) scores identically to the reference
        [B, C, T] layout — including trim windows, the bf16 path, and
        the transform fallbacks (linear/pool/center)."""
        from brainmagick_tpu.losses import ClipLoss

        rng = np.random.RandomState(0)
        est = jnp.asarray(rng.randn(6, 8, 20).astype(np.float32))
        est_t = jnp.swapaxes(est, 1, 2)
        cand = jnp.asarray(rng.randn(9, 8, 20).astype(np.float32))
        base = dict(dset_tmin=-0.5, dset_sample_rate=120.)
        variants = [dict(), dict(compute_dtype="bfloat16"),
                    dict(tmin=-0.4, tmax=-0.3), dict(linear=5),
                    dict(pool=True), dict(center=True)]
        for kw in variants:
            a = ClipLoss(**base, **kw)
            va = a.init(jax.random.PRNGKey(1), est, cand,
                        method=a.get_scores)
            sa = a.apply(va, est, cand, method=a.get_scores)
            b = ClipLoss(**base, est_layout="btc", **kw)
            sb = b.apply(va, est_t, cand, method=b.get_scores)
            np.testing.assert_allclose(np.asarray(sb), np.asarray(sa),
                                       rtol=1e-5, err_msg=str(kw))


def test_feature_decoding_loss():
    from brainmagick_tpu.features import FeaturesBuilder
    from brainmagick_tpu.losses import FeatureDecodingLoss
    from brainmagick_tpu.studies.fake import make_fake_events
    from brainmagick_tpu.utils import Frequency

    events = make_fake_events(total_duration=30, seed=1234)
    builder = FeaturesBuilder(events, ["WordLength", "Phoneme"],
                              features_params={},
                              sample_rate=Frequency(120.0))
    loss_fn = FeatureDecodingLoss(builder)
    rng = np.random.RandomState(0)
    B, T = 3, 50
    output, _, _ = builder(0.0, T / 120.0)
    output = jnp.asarray(np.stack([output] * B))
    estimate = jnp.asarray(
        rng.randn(B, builder.output_dimension, T).astype(np.float32))
    mask = jnp.ones((B, 1, T), dtype=bool)
    val = loss_fn(estimate, output, mask)
    assert np.isfinite(float(val)) and float(val) > 0


def test_dotconv_matches_nn_conv():
    """DotConv1D ('dots' and 'concat' lowerings) is numerically the
    same function as nn.Conv for stride-1 SAME odd-kernel convs, with
    identical parameter LEAF shapes (kernel [k, C, O], bias [O]) — the
    checkpoint-compat claim in its docstring."""
    import flax.linen as nn

    from brainmagick_tpu.models.common import DotConv1D

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 50, 12).astype(np.float32))
    for dilation in (1, 2, 4):
        pad = (3 // 2) * dilation
        conv = nn.Conv(16, (3,), strides=(1,), padding=[(pad, pad)],
                       kernel_dilation=(dilation,))
        params = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(params, x)
        for mode in ("dots", "concat"):
            dot = DotConv1D(16, 3, dilation=dilation, mode=mode)
            # same leaves, different module path: transplant directly
            got = dot.apply(params, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)


def test_conv_impl_checkpoint_key_rename():
    """A ConvSequence checkpoint trained with conv_impl='conv' loads
    into conv_impl='dots' after renaming Conv_i -> DotConv1D_i (the
    module-path rename the DotConv1D docstring documents)."""
    from brainmagick_tpu.models.common import ConvSequence

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 40, 12).astype(np.float32))
    kw = dict(channels=(12, 16, 16), kernel=3, stride=1,
              dilation_growth=2, dilation_period=2)
    seq_conv = ConvSequence(conv_impl="conv", **kw)
    seq_dots = ConvSequence(conv_impl="dots", **kw)
    params = seq_conv.init(jax.random.PRNGKey(0), x, train=False)
    renamed = {"params": {
        key.replace("Conv_", "DotConv1D_"): val
        for key, val in params["params"].items()}}
    ref = seq_conv.apply(params, x, train=False)
    got = seq_dots.apply(renamed, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_head_matches_unfused():
    """simpleconv.fused_head folds merger-mix + initial 1x1 + subject
    matrix into one per-recording matmul on the SAME parameters —
    outputs must match the unfused path (train and eval), and the
    param trees must be identical (checkpoint compatible both ways)."""
    from brainmagick_tpu.models.common import fourier_emb

    rng = np.random.RandomState(0)
    R, B, C, T, D = 3, 8, 12, 40, 32
    rec_positions = jnp.asarray(rng.rand(R, C, 2).astype(np.float32))
    rec_index = jnp.asarray(rng.randint(0, R, B))
    rec_subjects = jnp.asarray(rng.randint(0, 4, R))
    subjects = rec_subjects[rec_index]
    positions = rec_positions[rec_index]
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    table = fourier_emb(rec_positions, D)

    kw = dict(in_channels=dict(meg=C), out_channels=10,
              hidden=dict(meg=16), depth=2, kernel_size=3,
              merger=True, merger_channels=8, merger_pos_dim=D,
              merger_dropout=0.3, initial_linear=8,
              subject_layers=True, subject_dim=0, complex_out=True,
              n_subjects=4)
    base = SimpleConv(fused_head=False, **kw)
    fused = SimpleConv(fused_head=True, **kw)
    variables = base.init({"params": jax.random.PRNGKey(0)},
                          dict(meg=meg), subjects, positions,
                          train=False)
    # identical param tree across the flag
    v2 = fused.init({"params": jax.random.PRNGKey(0)}, dict(meg=meg),
                    subjects, positions, train=False)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2

    call_kw = dict(pos_emb=table, rec_index=rec_index,
                   rec_positions=rec_positions)
    ref = base.apply(variables, dict(meg=meg), subjects, positions,
                     train=False, **call_kw)
    got = fused.apply(variables, dict(meg=meg), subjects, positions,
                      train=False, **call_kw, rec_subjects=rec_subjects)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # train mode: the merger's spatial dropout draws the same disk
    # under the same rng, so the paths still agree
    rngs = {"dropout": jax.random.PRNGKey(7)}
    ref_t, _ = base.apply(variables, dict(meg=meg), subjects, positions,
                          train=True, **call_kw, rngs=rngs,
                          mutable=["batch_stats", "losses"])
    got_t, _ = fused.apply(variables, dict(meg=meg), subjects,
                           positions, train=True, **call_kw,
                           rec_subjects=rec_subjects, rngs=rngs,
                           mutable=["batch_stats", "losses"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               atol=2e-4, rtol=2e-4)

    # without rec_subjects the fused model silently runs the unfused
    # ops (e.g. solver init / per-sample paths)
    fallback = fused.apply(variables, dict(meg=meg), subjects,
                           positions, train=False, **call_kw)
    np.testing.assert_allclose(np.asarray(fallback), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_gelu_exact_knob():
    """gelu_exact selects the erf (torch-parity) vs tanh-approx form.

    The TPU recipe trains with the tanh approximation because XLA's
    erf lowering costs ~50% more on the paper encoder (measured,
    doc/perf_playbook.md); converted reference checkpoints keep the
    erf default (reference: torch nn.GELU at
    /root/reference/bm/models/common.py via SimpleConv's `gelu`).
    """
    from scipy.special import erf

    from brainmagick_tpu.config import MainConfig, apply_preset
    from brainmagick_tpu.models.common import get_activation

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    exact = np.asarray(get_activation(gelu=True)(jnp.asarray(x)))
    np.testing.assert_allclose(
        exact, x * 0.5 * (1 + erf(x / np.sqrt(2))), atol=1e-6)

    approx = np.asarray(
        get_activation(gelu=True, gelu_exact=False)(jnp.asarray(x)))
    inner = np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)
    np.testing.assert_allclose(
        approx, x * 0.5 * (1 + np.tanh(inner)), atol=1e-5)

    # the two forms are within 5e-3 of each other (training-neutral)
    # but NOT identical (so the knob is observable)
    assert 1e-6 < np.abs(exact - approx).max() < 5e-3

    # preset wiring: the TPU recipe opts into the approximation, the
    # reference-faithful preset (and so convert.py) keeps erf
    tpu = apply_preset(MainConfig(), "clip_conv_tpu")
    assert tpu.simpleconv["gelu_exact"] is False
    ref = apply_preset(MainConfig(), "clip_conv")
    assert ref.simpleconv["gelu_exact"] is True
