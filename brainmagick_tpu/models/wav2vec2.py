"""JAX/flax wav2vec 2.0 encoder with HF torch-weight conversion.

The reference computes speech targets with the torch
facebook/wav2vec2-large-xlsr-53 checkpoint on CPU
(bm/features/audio.py:135-237). This is a from-scratch flax
implementation of the same architecture (the xlsr/stable-layer-norm
variant: layer-normed conv feature extractor, weight-normed convolutional
relative positional embedding, pre-LN transformer) so feature precompute
can run on TPU without torch. `convert_torch_weights` maps an HF
`Wav2Vec2Model` state dict onto the flax parameter tree; numerics are
parity-tested against torch in tests/test_wav2vec2.py.
"""

from __future__ import annotations

import typing as tp
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass
class Wav2Vec2Config:
    """Subset of HF Wav2Vec2Config (defaults = xlsr-53 large)."""
    conv_dim: tp.Tuple[int, ...] = (512,) * 7
    conv_kernel: tp.Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tp.Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = True
    feat_extract_norm: str = "layer"
    #: lax.scan over the (identical) transformer layers instead of a
    #: python loop: compile time is O(1) in depth instead of O(L) — the
    #: unrolled 24-layer graph takes >20 min through this container's
    #: remote compiler, the scanned one compiles like a single layer.
    #: Parameters stack on a leading [L] axis (convert_torch_weights
    #: mirrors this); numerics identical (tests/test_wav2vec2.py).
    scan_layers: bool = False
    #: collect ONLY these hidden-state indices (HF convention: index k
    #: in [0, L) is the input of layer k, index L the final post-LN
    #: output). None collects all L+1. The Wav2VecTransformer feature
    #: needs 5 of 24 (bm/conf/features_defaults/features_defaults.
    #: yaml:26) — under scan_layers the selection accumulates in the
    #: scan carry, shrinking the collected ys ~5x in HBM and making the
    #: scan small enough for slow remote compilers (VERDICT r4 Next #3).
    collect_layers: tp.Optional[tp.Tuple[int, ...]] = None

    @classmethod
    def tiny(cls) -> "Wav2Vec2Config":
        """Small config for tests."""
        return cls(conv_dim=(16, 16), conv_kernel=(10, 3),
                   conv_stride=(5, 2), hidden_size=32,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=64, num_conv_pos_embeddings=16,
                   num_conv_pos_embedding_groups=4)


class _ConvLayer(nn.Module):
    cfg: Wav2Vec2Config
    index: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T, C]
        cfg = self.cfg
        x = nn.Conv(cfg.conv_dim[self.index],
                    (cfg.conv_kernel[self.index],),
                    strides=(cfg.conv_stride[self.index],),
                    padding="VALID", use_bias=cfg.conv_bias,
                    name="conv")(x)
        if cfg.feat_extract_norm == "layer":
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="layer_norm")(x)
        elif self.index == 0:  # 'group': group norm on the first layer
            x = nn.GroupNorm(num_groups=cfg.conv_dim[0],
                             epsilon=cfg.layer_norm_eps,
                             name="layer_norm")(x)
        return nn.gelu(x, approximate=False)


class FeatureEncoder(nn.Module):
    """Raw waveform [B, T] -> latent [B, T', conv_dim[-1]]."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        x = wav[..., None]
        for k in range(len(self.cfg.conv_dim)):
            x = _ConvLayer(self.cfg, k, name=f"conv_layers_{k}")(x)
        return x


class PositionalConvEmbedding(nn.Module):
    """Weight-normed grouped conv relative positional embedding."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        # weight normalization with dim=2 (HF convention): one gain per
        # kernel position, norm over (in, out) slices
        h = cfg.hidden_size
        in_per_group = h // cfg.num_conv_pos_embedding_groups
        v = self.param("weight_v", nn.initializers.normal(0.02),
                       (k, in_per_group, h))
        g = self.param("weight_g", nn.initializers.ones, (k, 1, 1))
        norm = jnp.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True) + 1e-12)
        kernel = g * v / norm
        bias = self.param("bias", nn.initializers.zeros, (h,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=cfg.num_conv_pos_embedding_groups) + bias
        if k % 2 == 0:
            y = y[:, :-1]
        return nn.gelu(y, approximate=False)


class Attention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h, n_heads = cfg.hidden_size, cfg.num_attention_heads
        head_dim = h // n_heads
        B, T, _ = x.shape

        def proj(name):
            return nn.Dense(h, name=name)(x).reshape(
                B, T, n_heads, head_dim)

        q = proj("q_proj") * (head_dim ** -0.5)
        k = proj("k_proj")
        v = proj("v_proj")
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", weights, v).reshape(B, T, h)
        return nn.Dense(h, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-LN (stable-layer-norm) transformer layer."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        pre = cfg.do_stable_layer_norm
        attn_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                               name="layer_norm")
        ffn_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                              name="final_layer_norm")
        if pre:
            x = x + Attention(cfg, name="attention")(attn_ln(x))
            y = ffn_ln(x)
            y = nn.Dense(cfg.intermediate_size,
                         name="intermediate_dense")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(cfg.hidden_size, name="output_dense")(y)
            return x + y
        x = attn_ln(x + Attention(cfg, name="attention")(x))
        y = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden_size, name="output_dense")(y)
        return ffn_ln(x + y)


class _ScanEncoderLayer(nn.Module):
    """Scan body: (carry=x, None) -> (layer(x), pre-layer x). Collected
    ys are HF's per-layer hidden states (pre-layer convention)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array, _: tp.Any
                 ) -> tp.Tuple[jax.Array, jax.Array]:
        return EncoderLayer(self.cfg, name="layer")(x), x


class _ScanCollectLayer(nn.Module):
    """Scan body with an in-carry accumulator for a SELECTED subset of
    hidden states: carry = (x, acc[K, ...]); per-step input sel_k [K] is
    the one-hot row saying which accumulator slot (if any) the current
    pre-layer x belongs to. ys stay empty — the scan's memory footprint
    is K hidden states instead of L."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, carry: tp.Tuple[jax.Array, jax.Array],
                 sel_k: jax.Array
                 ) -> tp.Tuple[tp.Tuple[jax.Array, jax.Array], None]:
        x, acc = carry
        acc = acc + sel_k.reshape((-1,) + (1,) * x.ndim) * x[None]
        return (EncoderLayer(self.cfg, name="layer")(x), acc), None


def _frontend(cfg: Wav2Vec2Config, wav: jax.Array
              ) -> tp.Tuple[jax.Array, jax.Array]:
    """Everything before the transformer stack: conv feature extractor
    + projection + positional conv (+ pre-LN for the non-stable
    variant). Returns (encoder input, extract_features). Must be
    called from an @nn.compact context — submodule names attach to the
    CALLER's scope, so Wav2Vec2Model and _Frontend share one parameter
    layout and one copy of these numerics."""
    features = FeatureEncoder(cfg, name="feature_extractor")(wav)
    extract_features = nn.LayerNorm(
        epsilon=cfg.layer_norm_eps,
        name="feature_projection_layer_norm")(features)
    x = nn.Dense(cfg.hidden_size,
                 name="feature_projection")(extract_features)
    x = x + PositionalConvEmbedding(cfg, name="pos_conv_embed")(x)
    if not cfg.do_stable_layer_norm:
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="encoder_layer_norm")(x)
    return x, extract_features


class Wav2Vec2Model(nn.Module):
    """Returns (last_hidden_state, extract_features, hidden_states) with
    HF semantics: hidden_states[0] is the encoder input (projected
    features + positional conv), intermediates are pre-layer, and the
    last entry carries the final layer norm (stable-LN variant)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav: jax.Array
                 ) -> tp.Tuple[jax.Array, jax.Array, tp.Tuple[jax.Array, ...]]:
        cfg = self.cfg
        x, extract_features = _frontend(cfg, wav)
        collect = cfg.collect_layers
        if collect is not None:
            assert all(0 <= k <= cfg.num_hidden_layers for k in collect), \
                f"collect_layers out of range: {collect}"
        hidden_states: tp.Tuple[jax.Array, ...] = ()
        acc = None
        if cfg.scan_layers and collect is not None:
            # one-hot [L, K] routing of pre-layer states into the
            # K-slot carry accumulator (index L handled after the LN)
            sel = jnp.asarray(
                [[1.0 if idx == k else 0.0 for idx in collect]
                 for k in range(cfg.num_hidden_layers)], dtype=x.dtype)
            scanned = nn.scan(
                _ScanCollectLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0, out_axes=0,
                length=cfg.num_hidden_layers)(cfg, name="layers")
            acc0 = jnp.zeros((len(collect),) + x.shape, x.dtype)
            (x, acc), _ = scanned((x, acc0), sel)
        elif cfg.scan_layers:
            scanned = nn.scan(
                _ScanEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_hidden_layers)(cfg, name="layers")
            x, ys = scanned(x, None)
            hidden_states = tuple(ys[k]
                                  for k in range(cfg.num_hidden_layers))
        else:
            for k in range(cfg.num_hidden_layers):
                hidden_states += (x,)
                x = EncoderLayer(cfg, name=f"layers_{k}")(x)
        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="encoder_layer_norm")(x)
        hidden_states += (x,)
        if collect is not None:
            # hidden_states holds EXACTLY the requested indices, in order
            if acc is not None:
                hidden_states = tuple(
                    x if idx == cfg.num_hidden_layers else acc[j]
                    for j, idx in enumerate(collect))
            else:
                hidden_states = tuple(hidden_states[idx]
                                      for idx in collect)
        return x, extract_features, hidden_states


class _Frontend(nn.Module):
    """The shared `_frontend` math as a standalone module, so
    `layerwise_forward` (and the bench's carry-only proxy) can compile
    everything before the transformer stack separately."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
        return _frontend(self.cfg, wav)


def layerwise_forward(model: Wav2Vec2Model,
                      variables: tp.Mapping) -> tp.Callable:
    """Incremental-compile execution of ``model``: three SMALL XLA
    executables (frontend, ONE shared encoder layer, final layer norm)
    driven by a host loop, instead of one monolithic program.

    Same math, same weights, same (last, extract, hidden) contract as
    ``model.apply`` — parity-tested in tests/test_wav2vec2.py. Use when
    a slow/remote compiler cannot hold the full-graph compile (this
    container's relay drops the monolithic xlsr-53 compile after ~30-45
    min; each of these three compiles is minutes), or on memory-tight
    edge hosts where one resident executable per layer shape is cheaper
    than the fused program. On a production TPU the monolithic
    ``scan_layers`` program remains the default: it saves the ~L
    dispatch round-trips per chunk.

    Requires the ``scan_layers`` parameter layout (stacked [L] axis);
    per-layer parameter trees are sliced once and stay device-resident,
    so each dispatch reuses resident buffers (no per-call upload).
    """
    cfg = model.cfg
    assert cfg.scan_layers, "layerwise_forward needs stacked [L] params"
    n_layers = cfg.num_hidden_layers
    if cfg.collect_layers is not None:
        # fail at construction like the monolithic path, not with a
        # bare KeyError after the whole forward has run
        assert all(0 <= k <= n_layers for k in cfg.collect_layers), \
            f"collect_layers out of range: {cfg.collect_layers}"
    params = variables["params"]
    front_keys = ["feature_extractor", "feature_projection_layer_norm",
                  "feature_projection", "pos_conv_embed"]
    if not cfg.do_stable_layer_norm:
        front_keys.append("encoder_layer_norm")
    front = _Frontend(cfg)
    front_params = {k: params[k] for k in front_keys}
    layer = EncoderLayer(cfg)
    stacked = params["layers"]["layer"]
    # one jitted unstack = ONE dispatch for all L slices (eager
    # tree_map slicing costs L x n_leaves round trips on relayed
    # accelerators). Memory note: the slices duplicate the encoder
    # weights next to the cached stacked tree (~2x residency, e.g.
    # ~2.4 GB fp32 for xlsr-53) — truly memory-tight hosts should pass
    # a host-side (numpy) tree instead, which device_puts only slices.
    per_layer = jax.jit(lambda p: tuple(
        jax.tree_util.tree_map(lambda a, k=k: a[k], p)
        for k in range(n_layers)))(stacked)

    front_j = jax.jit(lambda w: front.apply({"params": front_params}, w))
    layer_j = jax.jit(lambda p, x: layer.apply({"params": p}, x))
    if cfg.do_stable_layer_norm:
        ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        ln_params = params["encoder_layer_norm"]
        final_j = jax.jit(lambda x: ln.apply({"params": ln_params}, x))
    else:
        def final_j(x):
            return x
    collect = (tuple(range(n_layers + 1)) if cfg.collect_layers is None
               else tuple(cfg.collect_layers))

    def forward(wav: jax.Array
                ) -> tp.Tuple[jax.Array, jax.Array,
                              tp.Tuple[jax.Array, ...]]:
        x, extract_features = front_j(wav)
        states: tp.Dict[int, jax.Array] = {}
        for k in range(n_layers):
            if k in collect:
                states[k] = x  # HF pre-layer convention
            x = layer_j(per_layer[k], x)
        x = final_j(x)
        if n_layers in collect:
            states[n_layers] = x
        return x, extract_features, tuple(states[i] for i in collect)

    return forward


# ---------------------------------------------------------------------------
# HF torch weight conversion
# ---------------------------------------------------------------------------

def convert_torch_weights(torch_model, scan_layers: bool = False) -> dict:
    """HF transformers Wav2Vec2Model -> flax params for Wav2Vec2Model.
    `scan_layers=True` stacks the per-layer parameters on a leading
    [L] axis (the nn.scan layout of Wav2Vec2Config.scan_layers)."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in torch_model.state_dict().items()}
    p: tp.Dict[str, tp.Any] = {}

    def dense(prefix: str) -> dict:
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def layernorm(prefix: str) -> dict:
        return {"scale": sd[prefix + ".weight"],
                "bias": sd[prefix + ".bias"]}

    n_conv = len([k for k in sd
                  if k.startswith("feature_extractor.conv_layers")
                  and k.endswith("conv.weight")])
    fe: tp.Dict[str, tp.Any] = {}
    for i in range(n_conv):
        base = f"feature_extractor.conv_layers.{i}"
        layer: tp.Dict[str, tp.Any] = {
            "conv": {"kernel": sd[base + ".conv.weight"].transpose(2, 1, 0)}}
        if base + ".conv.bias" in sd:
            layer["conv"]["bias"] = sd[base + ".conv.bias"]
        if base + ".layer_norm.weight" in sd:
            layer["layer_norm"] = layernorm(base + ".layer_norm")
        fe[f"conv_layers_{i}"] = layer
    p["feature_extractor"] = fe

    p["feature_projection_layer_norm"] = layernorm(
        "feature_projection.layer_norm")
    p["feature_projection"] = dense("feature_projection.projection")

    # weight-normed positional conv: torch parametrizations store
    # original0 (g, [out,1,1]) and original1 (v, [out, in/groups, k])
    base = "encoder.pos_conv_embed.conv"
    if base + ".parametrizations.weight.original0" in sd:
        g = sd[base + ".parametrizations.weight.original0"]
        v = sd[base + ".parametrizations.weight.original1"]
    else:  # older torch weight_norm naming
        g = sd[base + ".weight_g"]
        v = sd[base + ".weight_v"]
    p["pos_conv_embed"] = {
        "weight_g": g.transpose(2, 1, 0),     # [out,1,1] -> [1,1,out]
        "weight_v": v.transpose(2, 1, 0),     # [out,in,k] -> [k,in,out]
        "bias": sd[base + ".bias"]}

    p["encoder_layer_norm"] = layernorm("encoder.layer_norm")

    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("encoder.layers.")})
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "attention": {
                "q_proj": dense(base + ".attention.q_proj"),
                "k_proj": dense(base + ".attention.k_proj"),
                "v_proj": dense(base + ".attention.v_proj"),
                "out_proj": dense(base + ".attention.out_proj"),
            },
            "layer_norm": layernorm(base + ".layer_norm"),
            "final_layer_norm": layernorm(base + ".final_layer_norm"),
            "intermediate_dense": dense(
                base + ".feed_forward.intermediate_dense"),
            "output_dense": dense(base + ".feed_forward.output_dense"),
        }
    if scan_layers:
        import jax
        per_layer = [p.pop(f"layers_{i}") for i in range(n_layers)]
        p["layers"] = {"layer": jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves), *per_layer)}
    return p


def config_from_hf(hf_config, scan_layers: bool = False,
                   collect_layers: tp.Optional[tp.Sequence[int]] = None
                   ) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        scan_layers=scan_layers,
        collect_layers=(None if collect_layers is None
                        else tuple(collect_layers)),
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        conv_bias=hf_config.conv_bias,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=(
            hf_config.num_conv_pos_embedding_groups),
        layer_norm_eps=hf_config.layer_norm_eps,
        do_stable_layer_norm=hf_config.do_stable_layer_norm,
        feat_extract_norm=hf_config.feat_extract_norm)
