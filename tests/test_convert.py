"""Reference-checkpoint conversion (brainmagick_tpu.convert).

Two layers of evidence, since the reference package itself cannot be
imported here (no mne):
1. PRIMITIVE CONFORMANCE — every tensor transform rule is verified
   numerically against real torch modules (torch is available):
   Conv1d / grouped Conv1d / ConvTranspose1d / BatchNorm1d eval /
   conv+GLU ordering / the BN bias fold.
2. STRUCTURAL — the generated key set matches the reference naming
   (hand-pinned for the tiny architecture from
   bm/models/simpleconv.py:94-195, bm/models/common.py:88-141), and a
   full roundtrip through a reference-named state_dict reproduces the
   solver's forward bit-for-bit.
"""

import numpy as np
import pytest
import torch
from flax import linen as nn
from test_solver import tiny_args

import jax
import jax.numpy as jnp
from brainmagick_tpu import convert
from brainmagick_tpu import train as bm_train

# ---------------------------------------------------------------------------
# 1. primitive conformance vs torch
# ---------------------------------------------------------------------------


def _flax_conv_apply(tw, tb, x_btc, *, dilation=1, pad=0, groups=1,
                     stride=1):
    kernel = convert._transform("conv_w", tw)
    params = {"kernel": jnp.asarray(kernel)}
    if tb is not None:
        params["bias"] = jnp.asarray(tb)
    mod = nn.Conv(kernel.shape[-1], (kernel.shape[0],),
                  strides=(stride,), padding=[(pad, pad)],
                  kernel_dilation=(dilation,), feature_group_count=groups,
                  use_bias=tb is not None)
    return mod.apply({"params": params}, jnp.asarray(x_btc))


@pytest.mark.parametrize("dilation,groups", [(1, 1), (2, 1), (4, 1),
                                             (1, 2)])
def test_conv1d_transform_matches_torch(dilation, groups):
    torch.manual_seed(0)
    B, Cin, Cout, T, k = 2, 6, 8, 31, 3
    pad = (k // 2) * dilation
    tconv = torch.nn.Conv1d(Cin, Cout, k, padding=pad, dilation=dilation,
                            groups=groups)
    x = torch.randn(B, Cin, T)
    want = tconv(x).detach().numpy()                     # [B, Cout, T]
    got = _flax_conv_apply(
        tconv.weight.detach().numpy(), tconv.bias.detach().numpy(),
        x.numpy().transpose(0, 2, 1), dilation=dilation, pad=pad,
        groups=groups)
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want,
                               rtol=1e-5, atol=1e-5)


# only stride-1 transposed convs convert (the reference's linear_out /
# complex_out heads): torch's and flax's explicit-pad ConvTranspose
# semantics diverge for stride > 1 (different output lengths), so the
# strided stft head is rejected by simpleconv_rules (tested below)
@pytest.mark.parametrize("k,stride,pad", [(1, 1, 0), (3, 1, 1),
                                          (5, 1, 2)])
def test_convtranspose1d_transform_matches_torch(k, stride, pad):
    torch.manual_seed(1)
    B, Cin, Cout, T = 2, 5, 7, 16
    tconv = torch.nn.ConvTranspose1d(Cin, Cout, k, stride, pad)
    x = torch.randn(B, Cin, T)
    want = tconv(x).detach().numpy()
    kernel = convert._transform("convT_w", tconv.weight.detach().numpy())
    mod = nn.ConvTranspose(Cout, (k,), strides=(stride,),
                           padding=[(pad, pad)])
    got = mod.apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(tconv.bias.detach().numpy())}},
        jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want,
                               rtol=1e-5, atol=1e-5)


def test_batchnorm_transform_matches_torch_eval():
    torch.manual_seed(2)
    B, C, T = 3, 10, 17
    bn = torch.nn.BatchNorm1d(C)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.normal_()
    bn.running_mean.data.normal_()
    bn.running_var.data.uniform_(0.3, 2.0)
    bn.eval()
    x = torch.randn(B, C, T)
    want = bn(x).detach().numpy()
    mod = nn.BatchNorm(use_running_average=True, axis=-1)
    got = mod.apply(
        {"params": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                    "bias": jnp.asarray(bn.bias.detach().numpy())},
         "batch_stats": {"mean": jnp.asarray(bn.running_mean.numpy()),
                         "var": jnp.asarray(bn.running_var.numpy())}},
        jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want,
                               rtol=1e-5, atol=1e-5)


def test_conv_glu_channel_ordering_matches_torch():
    """torch GLU(dim=1) and flax nn.glu(axis=-1) must split the
    converted conv's output channels identically."""
    torch.manual_seed(3)
    B, C, T, k = 2, 6, 19, 3
    tconv = torch.nn.Conv1d(C, 2 * C, k, padding=1)
    x = torch.randn(B, C, T)
    want = torch.nn.functional.glu(tconv(x), dim=1).detach().numpy()
    got = _flax_conv_apply(tconv.weight.detach().numpy(),
                           tconv.bias.detach().numpy(),
                           x.numpy().transpose(0, 2, 1), pad=1)
    got = nn.glu(got, axis=-1)
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want,
                               rtol=1e-5, atol=1e-5)


def test_bn_mean_bias_fold_is_exact():
    """conv(+bias) -> BN(eval, mean) == conv(no bias) -> BN(eval,
    mean - bias): the fold used for bn_conv_bias=False targets."""
    torch.manual_seed(4)
    B, C, T = 2, 5, 13
    conv = torch.nn.Conv1d(C, C, 3, padding=1)
    bn = torch.nn.BatchNorm1d(C)
    bn.running_mean.data.normal_()
    bn.running_var.data.uniform_(0.5, 1.5)
    bn.eval()
    x = torch.randn(B, C, T)
    want = bn(conv(x)).detach().numpy()
    folded_mean = convert._transform(
        "bn_mean_fold_bias", bn.running_mean.numpy(),
        bias=conv.bias.detach().numpy())
    got_lin = _flax_conv_apply(conv.weight.detach().numpy(), None,
                               x.numpy().transpose(0, 2, 1), pad=1)
    mod = nn.BatchNorm(use_running_average=True, axis=-1)
    got = mod.apply(
        {"params": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                    "bias": jnp.asarray(bn.bias.detach().numpy())},
         "batch_stats": {"mean": jnp.asarray(folded_mean),
                         "var": jnp.asarray(bn.running_var.numpy())}},
        got_lin)
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want,
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. structural: key naming + full roundtrip on a real solver
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_reference_key_names_tiny_architecture(tmp_cache, tmp_path):
    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    rules = convert.model_rules(solver.model, solver.feature_model)
    tkeys = {r[0].split("|")[-1] for r in rules} | {
        part for r in rules for part in r[0].split("|")}
    # pinned against the reference construction walk for this config
    # (merger + initial_linear + subject_layers + depth 2 + glu 2 +
    #  batch_norm + complex_out; bm/models/simpleconv.py:94-195)
    expected = [
        "0.merger.heads",
        "0.initial_linear.0.weight", "0.initial_linear.0.bias",
        "0.subject_layers.weights",
        "0.encoders.meg.sequence.0.0.weight",
        "0.encoders.meg.sequence.0.1.running_mean",
        "0.encoders.meg.sequence.1.0.weight",
        "0.encoders.meg.sequence.1.1.running_var",
        "0.encoders.meg.glus.1.0.weight",
        "0.final.0.weight", "0.final.2.weight", "0.final.2.bias",
    ]
    for key in expected:
        assert key in tkeys, f"missing expected reference key {key}"
    assert "0.encoders.meg.glus.0.0.weight" not in tkeys  # glu only at k=1

    flax_paths = {r[1] for r in rules}
    assert ("model", "ChannelMerger_0", "heads") in flax_paths
    assert ("model", "encoder_meg", "Conv_2", "kernel") in flax_paths  # glu
    assert ("model", "ConvTranspose_0", "kernel") in flax_paths


@pytest.mark.slow
def test_roundtrip_through_reference_naming(tmp_cache, tmp_path):
    """params -> reference-named torch state_dict -> converted back ->
    identical forward (proves transforms invert and every tensor is
    covered)."""
    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    solver.train()

    params = jax.device_get(solver.state["params"])
    stats = jax.device_get(solver.state["batch_stats"])
    sd = convert.export_state_dict(params, stats, solver.model,
                                   solver.feature_model)
    # simulate a real torch checkpoint file
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    ckpt = tmp_path / "checkpoint.th"
    torch.save({"best_state": tsd, "history": []}, ckpt)
    loaded = convert.load_reference_checkpoint(ckpt)

    ds = solver.datasets.test
    from brainmagick_tpu import serve
    from brainmagick_tpu.dataset import SegmentBatch
    batch = serve.prepare_batch(solver, SegmentBatch.collate(
        [ds[i % len(ds)] for i in range(4)]))
    before, *_ = solver.forward_batch(batch)

    # scramble, then restore via the converter
    scrambled = jax.tree_util.tree_map(lambda x: x * 0., params)
    solver.state = {**solver.state, "params": jax.device_put(scrambled)}
    convert.load_into_solver(solver, loaded)
    after, *_ = solver.forward_batch(batch)
    np.testing.assert_allclose(after, before, rtol=1e-6, atol=1e-6)
    assert solver.best_state is not None

    # converted trees match the originals leaf-for-leaf
    got = jax.device_get(solver.state["params"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_paper_architecture_rule_inventory():
    """Rule generation at the TRUE paper architecture (clip_conv:
    depth 10, glu 2, merger 2048, initial 270, complex_out) — no
    training needed, flax modules are plain dataclasses. The flax-side
    names cross-check against the shipped chip profile (encoder_meg
    Conv_14 is the k=9 GLU conv in scripts/profile_step.py output)."""
    from brainmagick_tpu.models.simpleconv import SimpleConv
    model = SimpleConv(
        in_channels={"meg": 273}, out_channels=1024,
        hidden={"meg": 320}, depth=10, kernel_size=3,
        dilation_growth=2, dilation_period=5, skip=True, glu=2,
        glu_context=1, gelu=True, batch_norm=True, merger=True,
        merger_pos_dim=2048, merger_channels=270, initial_linear=270,
        subject_layers=True, subject_dim=0, complex_out=True,
        n_subjects=27)
    rules = convert.model_rules(model, None)
    tkeys = {r[0].split("|")[-1] for r in rules}
    # inventory: merger 1 + initial 2 + subject 1 + 10 convs x (w+b)
    # + 10 BNs x (scale,bias,mean,var) + 5 glu convs x (w+b) + final 4
    assert len(rules) == 1 + 2 + 1 + 20 + 40 + 10 + 4
    assert "0.encoders.meg.sequence.9.0.weight" in tkeys
    assert "0.encoders.meg.sequence.9.1.running_var" in tkeys
    assert "0.encoders.meg.glus.9.0.weight" in tkeys   # glu at odd k
    assert "0.encoders.meg.glus.8.0.weight" not in tkeys
    flax_paths = {r[1] for r in rules}
    # stack convs Conv_0,1,3,4,6... and glu convs Conv_2,5,8,11,14
    assert ("model", "encoder_meg", "Conv_14", "kernel") in flax_paths
    assert ("model", "encoder_meg", "BatchNorm_9", "scale") in flax_paths
    # SimpleConv scope: initial=Conv_0, final complex head=Conv_1 + CT_0
    assert ("model", "Conv_0", "kernel") in flax_paths
    assert ("model", "Conv_1", "kernel") in flax_paths
    assert ("model", "ConvTranspose_0", "kernel") in flax_paths


def test_stft_head_rejected():
    from brainmagick_tpu.models.simpleconv import SimpleConv
    model = SimpleConv(in_channels={"meg": 16}, out_channels=8,
                       hidden={"meg": 24}, depth=2, n_fft=64,
                       linear_out=True)
    with pytest.raises(NotImplementedError, match="stft"):
        convert.simpleconv_rules(model)


def test_convert_rejects_unknown_keys(tmp_cache, tmp_path):
    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    params = jax.device_get(solver.state["params"])
    stats = jax.device_get(solver.state["batch_stats"])
    sd = convert.export_state_dict(params, stats, solver.model,
                                   solver.feature_model)
    sd["0.bogus.weight"] = np.zeros(3, dtype=np.float32)
    with pytest.raises(ValueError, match="not mapped"):
        convert.convert_state_dict(sd, solver.model,
                                   solver.feature_model)
    # and missing keys are named
    sd.pop("0.bogus.weight")
    key = "0.merger.heads"
    sd.pop(key)
    with pytest.raises(KeyError, match="merger.heads"):
        convert.convert_state_dict(sd, solver.model,
                                   solver.feature_model)
