"""Shared model blocks: subject layers, spatial attention over sensor
positions, dilated conv stacks.

Reference parity: bm/models/common.py — same computational blocks
(SubjectLayers, ChannelMerger + FourierEmb, ChannelDropout, ConvSequence,
LayerScale, ScaledEmbedding, DualPathRNN), re-designed for XLA:

  * layout is channels-last [B, T, C] internally (MXU-friendly; the
    reference is [B, C, T] torch),
  * sensor positions arrive as batch arrays (computed once per recording
    by the study adapter) instead of host-side MNE layout lookups
    (bm/models/common.py:183-236), so everything jits,
  * the ChannelDropout keep-probability is computed in closed form
    instead of a 100-trial Monte-Carlo loop (bm/models/common.py:300-307).
"""

from __future__ import annotations

import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..studies.api import INVALID_POSITION


def pad_multiple(x: jax.Array, base: int, axis: int = 1) -> jax.Array:
    """Right-pad `axis` to a multiple of base (bm/models/common.py:22-25)."""
    length = x.shape[axis]
    target = math.ceil(length / base) * base
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - length)
    return jnp.pad(x, pad)


def is_invalid_position(positions: jax.Array) -> jax.Array:
    """[..., 2] -> bool mask of padded/unknown sensors."""
    return jnp.all(positions == INVALID_POSITION, axis=-1)


class ScaledEmbedding(nn.Module):
    """Embedding whose effective learning rate is boosted by `scale`
    (weights stored divided by scale, output multiplied back —
    bm/models/common.py:28-42)."""
    num_embeddings: int
    features: int
    scale: float = 10.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        emb = nn.Embed(self.num_embeddings, self.features,
                       embedding_init=nn.initializers.normal(
                           stddev=1.0 / self.scale))(x)
        return emb * self.scale


class SubjectLayers(nn.Module):
    """Per-subject linear sensor remix: one [C_in, C_out] matrix per
    subject, gathered by subject index (bm/models/common.py:45-62)."""
    in_channels: int
    out_channels: int
    n_subjects: int
    init_id: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, subjects: jax.Array) -> jax.Array:
        # x: [B, T, C_in], subjects: [B] int
        def init(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)
            if self.init_id:
                assert self.in_channels == self.out_channels
                w = jnp.broadcast_to(
                    jnp.eye(self.in_channels, dtype=dtype)[None], shape)
            return w / self.in_channels ** 0.5

        weights = self.param(
            "weights", init,
            (self.n_subjects, self.in_channels, self.out_channels))
        w = weights[subjects]  # [B, C_in, C_out]
        return jnp.einsum("btc,bcd->btd", x, w,
                          preferred_element_type=jnp.float32)


class LayerScale(nn.Module):
    """Diagonal residual rescaling, initialized near 0 with an LR boost
    (bm/models/common.py:65-76)."""
    channels: int
    init: float = 0.1
    boost: float = 5.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init / self.boost),
            (self.channels,))
        return (self.boost * scale) * x


def fourier_emb(positions: jax.Array, dimension: int = 256,
                margin: float = 0.2) -> jax.Array:
    """2D Fourier positional embedding over [-margin, 1+margin]^2.

    Uses the full `2 pi (k_x x + k_y y)` frequency grid so any function
    over the square is representable (bm/models/common.py:239-271).
    positions: [..., 2] -> [..., dimension].
    """
    n_freqs = int((dimension // 2) ** 0.5)
    assert n_freqs ** 2 * 2 == dimension, \
        f"dimension must be 2*k^2, got {dimension}"
    freqs = jnp.arange(n_freqs, dtype=positions.dtype)
    width = 1 + 2 * margin
    pos = positions + margin
    # loc[k_x, k_y] = 2 pi (k_x x + k_y y) / width
    loc = 2 * math.pi / width * (
        pos[..., 0:1, None] * freqs[:, None] + pos[..., 1:2, None] * freqs)
    loc = loc.reshape(*positions.shape[:-1], n_freqs * n_freqs)
    return jnp.concatenate([jnp.cos(loc), jnp.sin(loc)], axis=-1)


class ChannelDropout(nn.Module):
    """Training-time spatial dropout: zero all sensors within a random
    disk of radius `dropout` in layout coordinates, rescaled by each
    sensor's keep probability (bm/models/common.py:274-309).

    The keep probability is exact instead of Monte-Carlo: a sensor at
    position p is dropped iff the disk center (uniform in [0,1]^2) lands
    within radius r of p, so P(keep) = 1 - area([0,1]^2 ∩ disk(p, r)).
    We integrate that area numerically once per call (vectorized, no
    trial loop).
    """
    dropout: float = 0.1
    rescale: bool = True

    @nn.compact
    def __call__(self, meg: jax.Array, positions: jax.Array,
                 train: bool = False) -> jax.Array:
        # meg: [B, T, C]; positions: [B, C, 2]
        if not self.dropout:
            return meg
        valid = ~is_invalid_position(positions)
        meg = meg * valid[:, None, :]
        if not train:
            return meg
        rng = self.make_rng("dropout")
        center = jax.random.uniform(rng, (2,), dtype=meg.dtype)
        dist = jnp.linalg.norm(positions - center, axis=-1)  # [B, C]
        kept = dist > self.dropout
        meg = meg * kept[:, None, :]
        if self.rescale:
            proba_kept = _disk_keep_probability(positions, self.dropout)
            meg = meg / (1e-8 + proba_kept[:, None, :])
        return meg


def _disk_keep_probability(positions: jax.Array, radius: float,
                           grid: int = 10) -> jax.Array:
    """P(center ~ U[0,1]^2 is farther than `radius` from each position).

    Midpoint-rule integration on a grid x grid lattice — deterministic,
    vectorized equivalent of the reference's 100 random trials.
    """
    steps = (jnp.arange(grid, dtype=positions.dtype) + 0.5) / grid
    cx, cy = jnp.meshgrid(steps, steps, indexing="ij")
    centers = jnp.stack([cx.ravel(), cy.ravel()], axis=-1)  # [G^2, 2]
    d = jnp.linalg.norm(positions[..., None, :] - centers, axis=-1)
    return (d > radius).mean(axis=-1)  # [B, C]


class ChannelMerger(nn.Module):
    """Spatial attention over sensors: learned heads attend over Fourier
    embeddings of sensor positions, merging C input channels into `chout`
    virtual channels shared across recordings/devices
    (bm/models/common.py:312-362).

    Invalid (padded) sensors and, in training, a random spatial disk are
    masked with -inf before the softmax. The optional usage penalty is
    exposed through `self.sow('losses', 'penalty', ...)`.
    """
    chout: int
    pos_dim: int = 256
    dropout: float = 0.
    usage_penalty: float = 0.
    n_subjects: int = 200
    per_subject: bool = False

    @nn.compact
    def __call__(self, meg: jax.Array, positions: jax.Array,
                 subjects: jax.Array, train: bool = False,
                 pos_emb: tp.Optional[jax.Array] = None,
                 rec_index: tp.Optional[jax.Array] = None,
                 rec_positions: tp.Optional[jax.Array] = None,
                 return_weights: bool = False) -> jax.Array:
        # meg: [B, T, C]; positions: [B, C, 2]; subjects: [B]
        # pos_emb: optional precomputed fourier_emb(positions) — either
        # [B, C, D] per sample, or [R, C, D] per RECORDING together with
        # rec_index [B] / rec_positions [R, C, 2]. Positions are fixed
        # per recording, so attention weights are too (heads are shared
        # unless per_subject): the per-recording path computes R softmax
        # rows instead of B and never materializes the [B, C, D]
        # embedding gather — exact same math, ~B/R times less score
        # work (see solver._pos_emb_table / bench.py)
        assert self.pos_dim % 4 == 0
        B, T, C = meg.shape

        per_recording = (rec_index is not None and pos_emb is not None
                         and not self.per_subject)
        assert not return_weights or per_recording, \
            "return_weights requires the per-recording path"
        if per_recording:
            embedding = pos_emb                      # [R, C, D]
            mask_positions = rec_positions           # [R, C, 2]
        else:
            embedding = pos_emb if pos_emb is not None \
                else fourier_emb(positions, self.pos_dim)  # [B, C, D]
            mask_positions = positions

        score_offset = jnp.where(is_invalid_position(mask_positions),
                                 -jnp.inf, 0.0)  # [R or B, C]
        if train and self.dropout:
            rng = self.make_rng("dropout")
            center = jax.random.uniform(rng, (2,), dtype=meg.dtype)
            dist = jnp.linalg.norm(mask_positions - center, axis=-1)
            score_offset = jnp.where(dist <= self.dropout, -jnp.inf,
                                     score_offset)
        # a row whose every channel is masked would softmax to NaN, and
        # the softmax VJP turns even a ZERO cotangent into NaN (0 * nan)
        # that the score einsum's backward folds into d(heads) — e.g. a
        # recording index with no dataset in any split on the
        # per-recording path. Give such rows a uniform finite softmax;
        # they are never gathered into the batch.
        all_masked = jnp.isneginf(score_offset).all(axis=-1,
                                                    keepdims=True)
        score_offset = jnp.where(all_masked, 0.0, score_offset)

        init = nn.initializers.normal(stddev=1.0 / self.pos_dim ** 0.5)
        if self.per_subject:
            heads_all = self.param(
                "heads", init, (self.n_subjects, self.chout, self.pos_dim))
            heads = heads_all[subjects]  # [B, O, D]
        else:
            heads_one = self.param("heads", init, (self.chout, self.pos_dim))
            heads = heads_one if per_recording else \
                jnp.broadcast_to(heads_one[None], (B,) + heads_one.shape)

        # score matmul in the meg compute dtype (bf16 keeps the 2*C*O*D
        # contraction on the MXU at full rate at pos_dim 2048) with fp32
        # accumulation; masking + softmax stay fp32
        if per_recording:
            scores = jnp.einsum("rcd,od->roc",
                                embedding.astype(meg.dtype),
                                heads.astype(meg.dtype),
                                preferred_element_type=jnp.float32)
            scores = scores + score_offset[:, None, :]
            if return_weights:
                # fused-head path (SimpleConv.fused_head): hand back the
                # per-RECORDING attention matrices so the caller can
                # fold them with the 1x1 linear and subject matrices
                return jax.nn.softmax(scores, axis=2)  # [R, O, C]
            weights = jax.nn.softmax(scores, axis=2)[rec_index]  # [B,O,C]
        else:
            scores = jnp.einsum("bcd,bod->boc",
                                embedding.astype(meg.dtype),
                                heads.astype(meg.dtype),
                                preferred_element_type=jnp.float32)
            scores = scores + score_offset[:, None, :]
            weights = jax.nn.softmax(scores, axis=2)  # [B, O, C], fp32
        out = jnp.einsum("btc,boc->bto", meg, weights.astype(meg.dtype),
                         preferred_element_type=jnp.float32)
        if train and self.usage_penalty > 0.:
            usage = weights.mean(axis=(0, 1)).sum()
            self.sow("losses", "penalty", self.usage_penalty * usage)
        return out


class DotConv1D(nn.Module):
    """k-tap 1D conv lowered to MXU dots (stride 1, SAME padding,
    odd kernel).

    XLA's conv_general_dilated backward runs at 43-67% MFU for the paper
    encoder's dilated k=3 convs (measured per-HLO,
    scripts/profile_step.py) while plain dot_generals on the same shapes
    reach ~80%; lowering the conv to k shifted-slice matmuls hands XLA
    dots in both the forward and backward pass. mode='concat'
    additionally merges the taps into ONE [B*T, k*C] x [k*C, O] dot —
    k*C = 960 pads to 1024 on the 128-lane MXU (94% tile utilization,
    vs 83% for C = 320 -> 384). Measured verdict: XLA's conv lowering
    wins end-to-end (scripts/exp_conv_impl.py) — this stays as the
    documented negative result. Parameter LEAF shapes/names match
    nn.Conv (kernel [k, C, O], bias [O]), but the flax module path
    differs (DotConv1D_i vs Conv_i), so loading a checkpoint across
    conv_impl settings needs a key rename, not just shape parity
    (tests/test_models.py::test_dotconv_matches_nn_conv proves numeric
    equality per lowering; ::test_conv_impl_checkpoint_key_rename
    proves the Conv_i -> DotConv1D_i rename loads a checkpoint).
    """
    features: int
    kernel: int
    dilation: int = 1
    mode: str = "dots"   # dots | concat
    use_bias: bool = True
    dtype: tp.Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, d = self.kernel, self.dilation
        assert k % 2 == 1, "odd kernel required for SAME padding"
        B, T, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, C, self.features))
        dt = self.dtype if self.dtype is not None else x.dtype
        pad = (k // 2) * d
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        taps = [xp[:, j * d: j * d + T] for j in range(k)]
        if self.mode == "concat":
            xc = jnp.concatenate(taps, axis=-1)
            y = jnp.einsum("btc,co->bto", xc.astype(dt),
                           w.reshape(k * C, self.features).astype(dt),
                           preferred_element_type=jnp.float32)
        else:
            y = None
            for j, tap in enumerate(taps):
                yj = jnp.einsum("btc,co->bto", tap.astype(dt),
                                w[j].astype(dt),
                                preferred_element_type=jnp.float32)
                y = yj if y is None else y + yj
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias
        return y.astype(dt)


class FusedConvBN(nn.Module):
    """Dilated SAME conv (odd k, stride 1, bias elided — BatchNorm
    cancels it) + BatchNorm in ONE device pass.

    Training runs the Pallas fused conv+stats kernel
    (ops/pallas_conv_bn.py): the per-channel batch sum / sum-of-squares
    accumulate in the conv's epilogue, so XLA's separate stats
    reduction never re-reads the [B, T, O] activation from HBM. Eval
    uses the plain XLA conv with the running statistics. Parameter and
    batch_stats LEAF names mirror nn.Conv ('kernel') and nn.BatchNorm
    ('scale'/'bias'/'mean'/'var') but live under this module's path —
    loading a checkpoint across the `fused_conv_bn` flag needs a key
    re-map, like DotConv1D's conv_impl rename.
    """
    features: int
    kernel: int
    dilation: int = 1
    eps: float = 1e-5
    momentum: float = 0.99   # flax nn.BatchNorm default
    dtype: tp.Any = None
    impl: str = "auto"       # see ops.pallas_conv_bn.conv_stats

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ..ops.pallas_conv_bn import batch_mean_var, conv_stats
        chin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, chin, self.features))
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,))
        dt = self.dtype if self.dtype is not None else x.dtype
        if train and not self.is_initializing():
            y, s, ss = conv_stats(x.astype(dt), w.astype(dt),
                                  self.dilation, self.impl)
            mean, var = batch_mean_var(s, ss, x.shape[0] * x.shape[1])
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            pad = (self.kernel // 2) * self.dilation
            y = jax.lax.conv_general_dilated(
                x.astype(dt), w.astype(dt), window_strides=(1,),
                padding=[(pad, pad)], rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32).astype(dt)
            mean, var = ra_mean.value, ra_var.value
        # fp32 normalize (matches the ConvSequence BatchNorm path);
        # XLA fuses this with the caller's GELU/residual
        yn = ((y.astype(jnp.float32) - mean)
              * jax.lax.rsqrt(var + self.eps) * scale + bias)
        return yn.astype(dt)


class ConvSequence(nn.Module):
    """Stack of dilated 1D convs with optional BN / GELU / residual skips
    / interleaved GLU gates (bm/models/common.py:79-151 parity, layout
    [B, T, C]). `decode=True` uses transposed convs."""
    channels: tp.Tuple[int, ...]
    kernel: int = 4
    dilation_growth: int = 1
    dilation_period: tp.Optional[int] = None
    stride: int = 2
    dropout: float = 0.0
    leakiness: float = 0.0
    groups: int = 1
    decode: bool = False
    batch_norm: bool = False
    dropout_input: float = 0.0
    skip: bool = False
    scale: tp.Optional[float] = None
    rewrite: bool = False
    activation_on_last: bool = True
    post_skip: bool = False
    glu: int = 0
    glu_context: int = 0
    glu_glu: bool = True
    activation: tp.Callable[[jax.Array], jax.Array] = nn.relu
    #: computation dtype for convs (bfloat16 on TPU keeps the MXU at full
    #: rate; params and batch-norm statistics stay float32)
    dtype: tp.Any = None
    #: lowering of the stride-1 stack convs: 'conv' (XLA
    #: conv_general_dilated), or 'dots'/'concat' (shifted-slice matmuls,
    #: see DotConv1D). Numerics identical; measured on-chip via
    #: scripts/exp_conv_impl.py.
    conv_impl: str = "conv"
    #: a conv bias immediately followed by BatchNorm is mathematically
    #: dead (BN subtracts the batch mean, cancelling any constant; BN's
    #: own beta replaces it) yet its GRADIENT costs a full read of the
    #: [B, T, C] cotangent per layer on the backward pass (~5% of the
    #: paper step, measured per-HLO). False elides those biases; True
    #: keeps the reference's parameter structure (torch Conv1d defaults,
    #: bm/models/common.py:142-151).
    bn_conv_bias: bool = True
    #: fuse conv + BatchNorm statistics into one Pallas pass for the
    #: stride-1 odd-kernel stack layers (see FusedConvBN); changes the
    #: param tree (FusedConvBN_i replaces Conv_i + BatchNorm_i)
    fused_conv_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        channels = tuple(self.channels)
        dilation = 1
        act = self.activation
        for k, (chin, chout) in enumerate(zip(channels[:-1], channels[1:])):
            is_last = k == len(channels) - 2
            old_x = x
            if k == 0 and self.dropout_input:
                x = nn.Dropout(self.dropout_input,
                               deterministic=not train)(x)
            if self.dilation_growth > 1:
                assert self.kernel % 2 != 0, \
                    "Only odd kernels supported with dilation"
            if self.dilation_period and (k % self.dilation_period) == 0:
                dilation = 1
            pad = self.kernel // 2 * dilation
            has_bn = self.batch_norm and (self.activation_on_last
                                          or not is_last)
            use_bias = self.bn_conv_bias or not has_bn
            fused_bn = (self.fused_conv_bn and has_bn and not self.decode
                        and self.stride == 1 and self.kernel % 2 == 1
                        and (self.groups == 1 or k == 0)
                        and self.conv_impl == "conv")
            if self.decode:
                x = nn.ConvTranspose(
                    chout, (self.kernel,), strides=(self.stride,),
                    padding=[(pad, pad)], use_bias=use_bias,
                    dtype=self.dtype)(x)
            elif fused_bn:
                # conv + BN statistics in one Pallas pass; normalize is
                # emitted here so the GELU below fuses onto it
                x = FusedConvBN(chout, self.kernel, dilation=dilation,
                                dtype=self.dtype)(x, train=train)
            elif (self.conv_impl != "conv" and self.stride == 1
                  and self.kernel % 2 == 1
                  and (self.groups == 1 or k == 0)):
                x = DotConv1D(chout, self.kernel, dilation=dilation,
                              mode=self.conv_impl, use_bias=use_bias,
                              dtype=self.dtype)(x)
            else:
                x = nn.Conv(
                    chout, (self.kernel,), strides=(self.stride,),
                    padding=[(pad, pad)], kernel_dilation=(dilation,),
                    feature_group_count=self.groups if k > 0 else 1,
                    use_bias=use_bias, dtype=self.dtype)(x)
            dilation *= self.dilation_growth
            if self.activation_on_last or not is_last:
                if self.batch_norm and not fused_bn:
                    # stats + normalize in fp32 (measured: a bf16
                    # normalize path changes nothing on v5e — XLA
                    # already fuses the casts — so keep full precision)
                    x = nn.BatchNorm(use_running_average=not train,
                                     axis=-1, dtype=jnp.float32)(x)
                    if self.dtype is not None:
                        x = x.astype(self.dtype)
                x = act(x)
                if self.dropout:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
                if self.rewrite:
                    x = nn.Conv(chout, (1,), dtype=self.dtype)(x)
                    x = nn.leaky_relu(x, self.leakiness)
            if chin == chout and self.skip:
                if self.scale is not None:
                    x = LayerScale(chout, self.scale)(x)
                if self.post_skip:
                    x = nn.Conv(chout, (1,), feature_group_count=chout,
                                use_bias=False)(x)
            # residual when shapes match (stride-1 stacks)
            if self.skip and x.shape == old_x.shape:
                x = x + old_x
            if self.glu and (k + 1) % self.glu == 0:
                width = 1 + 2 * self.glu_context
                glu_out = 2 * chout if self.glu_glu else chout
                if self.conv_impl != "conv":
                    gated = DotConv1D(glu_out, width,
                                      mode=self.conv_impl,
                                      dtype=self.dtype)(x)
                else:
                    gated = nn.Conv(glu_out, (width,),
                                    padding=[(self.glu_context,) * 2],
                                    dtype=self.dtype)(x)
                x = nn.glu(gated, axis=-1) if self.glu_glu else act(gated)
        return x


class DualPathRNN(nn.Module):
    """Interleaved intra/inter-chunk LSTMs with residual connections and
    periodic time flips (bm/models/common.py:154-180). Rarely used
    (dual_path=0 in all published configs); provided for parity."""
    channels: int
    depth: int
    inner_length: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T, C]
        B, T, C = x.shape
        IL = self.inner_length
        x = pad_multiple(x, IL, axis=1)
        Tp = x.shape[1]
        for idx in range(self.depth * 4):
            if idx % 2 == 0:
                # intra-chunk: sequences of length IL
                y = x.reshape(B * (Tp // IL), IL, C)
            else:
                # inter-chunk: stride-IL sequences
                y = x.reshape(B, Tp // IL, IL, C).transpose(0, 2, 1, 3)
                y = y.reshape(B * IL, Tp // IL, C)
            y = nn.RNN(nn.OptimizedLSTMCell(C))(y)
            if idx % 2 == 0:
                y = y.reshape(B, Tp, C)
            else:
                y = y.reshape(B, IL, Tp // IL, C).transpose(0, 2, 1, 3)
                y = y.reshape(B, Tp, C)
            x = x + y
            if idx % 2 == 1:
                x = x[:, ::-1]
        return x[:, :T]


def get_activation(gelu: bool = False, relu_leakiness: float = 0.0,
                   gelu_exact: bool = True
                   ) -> tp.Callable[[jax.Array], jax.Array]:
    if gelu:
        # gelu_exact=True: erf form, torch nn.GELU's default — required
        # for bit-level parity with reference checkpoints
        # (tests/test_reference_parity.py). gelu_exact=False: the tanh
        # approximation (~5e-4 off), which XLA lowers ~50% cheaper on
        # TPU (erf fwd+bwd measured 23.8 -> 35.6 ms on the paper
        # encoder, doc/perf_playbook.md) — the clip_conv_tpu training
        # recipe uses it.
        return partial(nn.gelu, approximate=not gelu_exact)
    if relu_leakiness:
        return partial(nn.leaky_relu, negative_slope=relu_leakiness)
    return nn.relu
