"""SimpleConv — the flagship brain decoder (NMI-paper model).

Reference parity: bm/models/simpleconv.py:22-249. Forward pipeline:
optional channel subsample mask -> ChannelDropout -> ChannelMerger
spatial attention -> initial 1x1 conv stack -> per-subject SubjectLayers
-> optional STFT branch -> subject-embedding concat -> per-input dilated
ConvSequence encoders -> optional DualPathRNN -> final (linear /
complex) 1x1 head -> crop to input length.

Paper config (bm/conf/model/clip_conv.yaml): depth 10, hidden 320,
kernel 3, dilation period 5, skip, GLU every 2 layers (context 1), GELU,
batch norm, merger to 270 virtual channels with pos_dim 2048, initial
linear 270, subject_layers, complex_out.

TPU-native: channels-last [B, T, C] throughout, positions passed as
arrays in the batch (no host-side layout lookups), pure flax module —
the public __call__ takes (inputs, subject_index, positions, train).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import (ChannelDropout, ChannelMerger, ConvSequence,
                     DualPathRNN, ScaledEmbedding, SubjectLayers,
                     get_activation, pad_multiple)


class SimpleConv(nn.Module):
    # channels
    in_channels: tp.Mapping[str, int]
    out_channels: int
    hidden: tp.Mapping[str, int]
    # overall structure
    depth: int = 4
    concatenate: bool = False
    linear_out: bool = False
    complex_out: bool = False
    # conv layer
    kernel_size: int = 5
    growth: float = 1.
    dilation_growth: int = 2
    dilation_period: tp.Optional[int] = None
    skip: bool = False
    post_skip: bool = False
    scale: tp.Optional[float] = None
    rewrite: bool = False
    groups: int = 1
    glu: int = 0
    glu_context: int = 0
    glu_glu: bool = True
    gelu: bool = False
    #: erf gelu (torch parity) vs tanh approximation (~50% cheaper on
    #: TPU; see models.common.get_activation)
    gelu_exact: bool = True
    # dual path rnn
    dual_path: int = 0
    # dropouts, BN, activations
    conv_dropout: float = 0.0
    dropout_input: float = 0.0
    batch_norm: bool = False
    relu_leakiness: float = 0.0
    # subject-specific settings
    n_subjects: int = 200
    subject_dim: int = 64
    subject_layers: bool = False
    subject_layers_dim: str = "input"  # or "hidden"
    subject_layers_id: bool = False
    embedding_scale: float = 1.0
    # stft branch
    n_fft: tp.Optional[int] = None
    fft_complex: bool = True
    # spatial-attention multi-dataset support
    merger: bool = False
    merger_pos_dim: int = 256
    merger_channels: int = 270
    merger_dropout: float = 0.2
    merger_penalty: float = 0.
    merger_per_subject: bool = False
    dropout: float = 0.
    dropout_rescale: bool = True
    initial_linear: int = 0
    initial_depth: int = 1
    initial_nonlin: bool = False
    subsample_meg_channels: int = 0
    #: computation dtype ('bfloat16' keeps TPU MXUs at full rate; params,
    #: softmax and batch-norm statistics stay float32)
    dtype: tp.Any = None
    #: dtype of the returned estimate (None = float32); set 'bfloat16'
    #: when the loss computes its score matmul in bf16 anyway
    output_dtype: tp.Any = None
    #: 'bct' returns [B, out, T] (reference layout); 'btc' returns the
    #: internal channels-last [B, T, out] as-is, skipping the exit
    #: transpose (two HBM passes over the largest activation) when the
    #: consumer (ClipLoss est_layout='btc') is layout-agnostic anyway
    output_layout: str = "bct"
    #: False elides encoder conv biases that BatchNorm cancels anyway
    #: (their gradients cost one full cotangent read per layer — see
    #: ConvSequence.bn_conv_bias); True = reference param structure
    bn_conv_bias: bool = True
    #: encoder conv lowering: 'conv' (XLA; measured fastest on v5e) or
    #: 'dots'/'concat' shifted-matmul forms — see DotConv1D
    conv_impl: str = "conv"
    #: fuse conv + BatchNorm stats into one Pallas pass per stack layer
    #: (see FusedConvBN; changes the encoder param tree)
    fused_conv_bn: bool = False
    #: fold merger-mix + initial 1x1 linear + subject matrix into ONE
    #: per-recording [C_in, D] matrix (same parameters, associativity
    #: only — checkpoint compatible both ways): three [B, T, ~270]
    #: matmuls plus two intermediate activations become one gathered
    #: einsum. Engages on the per-recording path (pos_emb/rec_index/
    #: rec_subjects supplied by the solver) with initial_depth 1, no
    #: initial_nonlin, no per-subject merger, no merger penalty;
    #: otherwise silently falls back to the unfused ops.
    fused_head: bool = False

    def _fused_head(self, meg, merger_mod, conv_mod, subject_mod,
                    positions, subject_index, train, pos_emb, rec_index,
                    rec_positions, rec_subjects, dim):
        """merger-mix + initial 1x1 linear + subject matrix as ONE
        gathered [C_in, dim] matmul per sample.

        Associativity on the same parameters:
        ``y = ((x A_r^T) W1 + b1) S_s = x (A_r^T W1 S_s) + b1 S_s``
        with one [C_in, dim] matrix per recording (recordings bind the
        subject, so S_{s(r)} folds in via rec_subjects — the SOLVER
        overrides the table with the batch's own (recording, subject)
        pairs, so even a hand-built batch with a mismatched pair
        computes with its per-sample subject, like SubjectLayers
        would; a single batch must not map one recording to two
        subjects, which real data never does). W1/b1 are read
        out of the SHARED nn.Conv by probing it with identity / zero
        inputs (exact: conv(I)[i] = W1[i] + b1, conv(0) = b1), so the
        parameter tree is identical to the unfused path. Saves ~2/3 of
        the head's [B, T, ~270] matmul FLOPs and two intermediate
        activations (tested equal in tests/test_models.py)."""
        A = merger_mod(meg, positions, subject_index, train=train,
                       pos_emb=pos_emb, rec_index=rec_index,
                       rec_positions=rec_positions,
                       return_weights=True)      # [R, O_m, C_in] fp32
        n_rec = A.shape[0]
        o_m = self.merger_channels
        cd = meg.dtype
        b1 = conv_mod(jnp.zeros((1, 1, o_m), cd))[0, 0]        # [O1]
        w1 = conv_mod(jnp.eye(o_m, dtype=cd)[None])[0] \
            - b1[None, :]                                      # [O_m, O1]
        eye = jnp.broadcast_to(
            jnp.eye(self.initial_linear, dtype=cd)[None],
            (n_rec, self.initial_linear, self.initial_linear))
        subj = subject_mod(eye, rec_subjects)           # [R, O1, dim]
        t1 = jnp.einsum("roc,ok->rck", A.astype(cd), w1.astype(cd),
                        preferred_element_type=jnp.float32)
        fold = jnp.einsum("rck,rkd->rcd", t1.astype(cd),
                          subj.astype(cd),
                          preferred_element_type=jnp.float32)
        bias = jnp.einsum("k,rkd->rd", b1.astype(jnp.float32),
                          subj.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        out = jnp.einsum("btc,bcd->btd", meg,
                         fold[rec_index].astype(cd),
                         preferred_element_type=jnp.float32)
        return out + bias[rec_index][:, None, :]

    @nn.compact
    def __call__(self, inputs: tp.Mapping[str, jax.Array],
                 subject_index: jax.Array, positions: jax.Array,
                 train: bool = False,
                 pos_emb: tp.Optional[jax.Array] = None,
                 rec_index: tp.Optional[jax.Array] = None,
                 rec_positions: tp.Optional[jax.Array] = None,
                 rec_subjects: tp.Optional[jax.Array] = None
                 ) -> jax.Array:
        """inputs: {'meg': [B, C, T], 'features': [B, F, T](encode task)};
        positions: [B, C, 2]; pos_emb: optional precomputed merger
        positional embedding, [B, C, pos_dim] per sample or
        [R, C, pos_dim] per recording with rec_index/rec_positions
        (see ChannelMerger); returns [B, out, T]."""
        if set(self.in_channels.keys()) != set(self.hidden.keys()):
            raise ValueError("in_channels and hidden keys must match "
                             f"({set(self.in_channels)} vs {set(self.hidden)})")
        assert self.kernel_size % 2 == 1, "odd kernel required for padding"
        act = get_activation(self.gelu, self.relu_leakiness,
                             self.gelu_exact)
        length = next(iter(inputs.values())).shape[-1]
        dtype = jnp.dtype(self.dtype) if self.dtype is not None else None

        # channels-last internally
        inputs = {name: jnp.swapaxes(x, 1, 2) for name, x in inputs.items()}
        if dtype is not None:
            inputs = {name: x.astype(dtype) for name, x in inputs.items()}
        in_channels = dict(self.in_channels)
        hidden = dict(self.hidden)

        meg = inputs.get("meg")
        if meg is not None:
            if self.subsample_meg_channels:
                # deterministic sensor-subset ablation
                # (bm/models/simpleconv.py:96-102, fixed seed 1234)
                rng = np.random.RandomState(1234)
                order = rng.permutation(in_channels["meg"])
                keep = np.zeros(in_channels["meg"], dtype=np.float32)
                keep[order[:self.subsample_meg_channels]] = 1.
                meg = meg * jnp.asarray(keep)
            if self.dropout > 0.:
                meg = ChannelDropout(self.dropout, self.dropout_rescale)(
                    meg, positions, train=train)
            fused_head = (
                self.fused_head and self.merger and self.initial_linear
                and self.subject_layers and self.initial_depth == 1
                and not self.initial_nonlin
                and not self.merger_per_subject
                and self.merger_penalty == 0.
                and pos_emb is not None and rec_index is not None
                and rec_subjects is not None)
            # the three modules are constructed in the SAME order on
            # both paths, so parameter trees (and checkpoints) match
            # across the fused_head flag
            if self.merger:
                merger_mod = ChannelMerger(
                    self.merger_channels, pos_dim=self.merger_pos_dim,
                    dropout=self.merger_dropout,
                    usage_penalty=self.merger_penalty,
                    n_subjects=self.n_subjects,
                    per_subject=self.merger_per_subject)
                if not fused_head:
                    meg = merger_mod(
                        meg, positions, subject_index, train=train,
                        pos_emb=pos_emb, rec_index=rec_index,
                        rec_positions=rec_positions)
                in_channels["meg"] = self.merger_channels
            if self.initial_linear:
                initial_mods = []
                for d in range(self.initial_depth):
                    if d > 0 and not fused_head:
                        meg = act(meg)
                    conv_mod = nn.Conv(self.initial_linear, (1,),
                                       dtype=dtype)
                    initial_mods.append(conv_mod)
                    if not fused_head:
                        meg = conv_mod(meg)
                if self.initial_nonlin and not fused_head:
                    meg = act(meg)
                in_channels["meg"] = self.initial_linear
            if self.subject_layers:
                meg_dim = in_channels["meg"]
                dim = {"hidden": hidden["meg"],
                       "input": meg_dim}[self.subject_layers_dim]
                subject_mod = SubjectLayers(meg_dim, dim,
                                            self.n_subjects,
                                            self.subject_layers_id)
                if not fused_head:
                    meg = subject_mod(meg, subject_index)
                in_channels["meg"] = dim
            if fused_head:
                meg = self._fused_head(
                    meg, merger_mod, initial_mods[0], subject_mod,
                    positions, subject_index, train, pos_emb, rec_index,
                    rec_positions, rec_subjects, dim)
            if self.n_fft is not None:
                meg = self._stft(meg)
                in_channels["meg"] = in_channels["meg"] * (
                    self.n_fft // 2 + 1) * (2 if self.fft_complex else 1)
            if self.subject_dim:
                emb = ScaledEmbedding(self.n_subjects, self.subject_dim,
                                      self.embedding_scale)(subject_index)
                emb = jnp.broadcast_to(emb[:, None, :],
                                       (meg.shape[0], meg.shape[1],
                                        self.subject_dim))
                meg = jnp.concatenate([meg, emb], axis=-1)
                in_channels["meg"] += self.subject_dim
            inputs = {**inputs, "meg": meg}

        if self.concatenate:
            ordered = [x for _, x in sorted(inputs.items())]
            inputs = {"concat": jnp.concatenate(ordered, axis=-1)}
            in_channels = {"concat": sum(in_channels.values())}
            hidden = {"concat": sum(hidden.values())}

        # per-branch channel schedules
        sizes = {}
        for name in in_channels:
            sizes[name] = [in_channels[name]] + [
                int(round(hidden[name] * self.growth ** k))
                for k in range(self.depth)]

        params: tp.Dict[str, tp.Any] = dict(
            kernel=self.kernel_size, stride=1, leakiness=self.relu_leakiness,
            dropout=self.conv_dropout, dropout_input=self.dropout_input,
            batch_norm=self.batch_norm, dilation_growth=self.dilation_growth,
            groups=self.groups, dilation_period=self.dilation_period,
            skip=self.skip, post_skip=self.post_skip, scale=self.scale,
            rewrite=self.rewrite, glu=self.glu, glu_context=self.glu_context,
            glu_glu=self.glu_glu, activation=act, dtype=dtype,
            bn_conv_bias=self.bn_conv_bias, conv_impl=self.conv_impl,
            fused_conv_bn=self.fused_conv_bn)

        final_channels = sum(s[-1] for s in sizes.values())
        use_final = self.linear_out or self.complex_out
        if not use_final:
            assert len(sizes) == 1, \
                "without linear/complex out there must be a single branch"
            params["activation_on_last"] = False
            list(sizes.values())[0][-1] = self.out_channels

        encoded = {}
        for name in sorted(inputs):
            encoded[name] = ConvSequence(
                tuple(sizes[name]), **params, name=f"encoder_{name}")(
                    inputs[name], train=train)
        x = jnp.concatenate([encoded[name] for name in sorted(encoded)],
                            axis=-1)

        if self.dual_path:
            x = DualPathRNN(final_channels, self.dual_path)(x)

        # final head; with an stft branch the head is a transposed conv
        # undoing the hop (bm/models/simpleconv.py:173-189)
        kernel, stride, pad = 1, 1, 0
        if self.n_fft is not None:
            kernel, stride, pad = self.n_fft, self.n_fft // 2, self.n_fft // 4
        if self.linear_out:
            assert not self.complex_out
            x = nn.ConvTranspose(self.out_channels, (kernel,),
                                 strides=(stride,),
                                 padding=[(pad, pad)], dtype=dtype)(x)
        elif self.complex_out:
            x = nn.Conv(2 * final_channels, (1,), dtype=dtype)(x)
            x = act(x)
            x = nn.ConvTranspose(self.out_channels, (kernel,),
                                 strides=(stride,),
                                 padding=[(pad, pad)], dtype=dtype)(x)

        assert x.shape[1] >= length, (x.shape, length)
        # fp32 output by default; output_dtype='bfloat16' skips the
        # upcast when the consumer (e.g. a bf16 CLIP score matmul)
        # would immediately cast back — saves two HBM passes over the
        # [B, out, T] tensor
        out_dtype = jnp.dtype(self.output_dtype) \
            if self.output_dtype is not None else jnp.float32
        x = x[:, :length]
        if self.output_layout == "btc":
            return x.astype(out_dtype)
        return jnp.swapaxes(x, 1, 2).astype(out_dtype)

    def _stft(self, meg: jax.Array) -> jax.Array:
        """Spectrogram branch: [B, T, C] -> [B, T', C * freqs (*2)]."""
        n_fft = self.n_fft
        hop = n_fft // 2
        B, T, C = meg.shape
        x = jnp.swapaxes(meg, 1, 2).reshape(B * C, T)  # [B*C, T]
        x = pad_multiple(x, hop, axis=-1)
        x = jnp.pad(x, ((0, 0), (n_fft // 4, n_fft // 4)), mode="reflect")
        # centered hann frames, normalized spectrogram
        window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (xp.shape[-1] - n_fft) // hop
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(n_fft)[None, :])
        frames = xp[:, idx] * window
        spec = jnp.fft.rfft(frames, axis=-1) / jnp.sqrt(jnp.sum(window ** 2))
        if self.fft_complex:
            z = jnp.stack([spec.real, spec.imag], axis=-1)
            z = z.reshape(B, C, n_frames, -1)
        else:
            z = jnp.abs(spec)[..., None].reshape(B, C, n_frames, -1)
        z = z.transpose(0, 2, 1, 3).reshape(B, n_frames, -1)
        return z
