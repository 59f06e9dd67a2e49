"""ConvRNN — strided conv encoder + LSTM + local attention + transposed
conv decoder (the reference's encode-task / legacy model).

Reference parity: bm/models/convrnn.py:18-274 — same structure: subject
layers / embeddings, per-input strided ConvSequence encoders, stacked
(optionally bidirectional/flipped) LSTM, local relative-position
attention blocks (±radius samples), mirrored ConvTranspose decoder and
optional linear/complex head, with the same valid-length padding rule.

TPU-native: flax.linen, channels-last [B, T, C]; LSTMs via nn.RNN(scan);
attention masks computed with broadcasted iota (static shapes).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvSequence, ScaledEmbedding, SubjectLayers


class StackedLSTM(nn.Module):
    """num_layers LSTMs (optionally bidirectional with a projection back
    to hidden size, bm/models/convrnn.py:18-38)."""
    hidden_size: int
    num_layers: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T, C]
        for _ in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size))(x)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                             reverse=True, keep_order=True)(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        if self.bidirectional:
            x = nn.Dense(self.hidden_size)(x)
        return x


class LocalAttention(nn.Module):
    """Multi-head attention restricted to a ±radius window with learned
    relative-position embeddings (bm/models/convrnn.py:41-88)."""
    channels: int
    radius: int = 50
    heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, T, C]
        assert self.channels % self.heads == 0
        B, T, C = x.shape
        dim = C // self.heads

        def split(y):
            return y.reshape(B, T, self.heads, dim)

        content = split(nn.Conv(C, (1,))(x))
        query = split(nn.Conv(C, (1,))(x))
        key = split(nn.Conv(C, (1,))(x))

        # smoothed relative-position embedding table [2r+1, dim]
        def emb_init(rng, shape):
            w = jax.random.normal(rng, shape)
            csum = jnp.cumsum(w, axis=0)
            denom = jnp.sqrt(jnp.arange(1, shape[0] + 1,
                                        dtype=w.dtype))[:, None]
            return csum / denom

        table = self.param("rel_emb", emb_init, (2 * self.radius + 1, dim))

        steps = jnp.arange(T)
        relative = steps[:, None] - steps[None, :]         # [T, S]
        clipped = jnp.clip(relative, -self.radius, self.radius)
        embs = table[self.radius + clipped]                # [T, S, dim]

        dots = jnp.einsum("bthc,bshc->bhts", query, key,
                          preferred_element_type=jnp.float32)
        dots = dots + 0.3 * jnp.einsum("bthc,tsc->bhts", query, embs)
        dots = jnp.where(jnp.abs(relative) <= self.radius, dots, -jnp.inf)
        weights = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhts,bshc->bthc", weights, content)
        out = out + 0.3 * jnp.einsum("bhts,tsc->bthc", weights, embs)
        out = out.reshape(B, T, C)
        out = nn.Conv(C, (1,))(out)
        out = nn.BatchNorm(use_running_average=not train, axis=-1)(out)
        out = nn.relu(out)
        scale = self.param("scale", lambda *_: jnp.full((C,), 0.1))
        return out * scale


class ConvRNN(nn.Module):
    in_channels: tp.Mapping[str, int]
    out_channels: int
    hidden: tp.Mapping[str, int]
    depth: int = 2
    linear_out: bool = False
    complex_out: bool = False
    concatenate: bool = False
    kernel_size: int = 4
    stride: int = 2
    growth: float = 1.
    lstm: int = 2
    flip_lstm: bool = False
    bidirectional_lstm: bool = False
    attention: int = 0
    heads: int = 4
    conv_dropout: float = 0.0
    lstm_dropout: float = 0.0
    dropout_input: float = 0.0
    batch_norm: bool = False
    relu_leakiness: float = 0.0
    n_subjects: int = 200
    subject_dim: int = 64
    embedding_location: tp.Tuple[str, ...] = ("lstm",)
    embedding_scale: float = 1.0
    subject_layers: bool = False
    subject_layers_dim: str = "input"

    def valid_length(self, length: int) -> int:
        """Nearest length with no leftover conv steps
        (bm/models/convrnn.py:209-223)."""
        for _ in range(self.depth):
            length = math.ceil(length / self.stride) + 1
            length = max(length, 1)
        for _ in range(self.depth):
            length = (length - 1) * self.stride
        return int(length)

    @nn.compact
    def __call__(self, inputs: tp.Mapping[str, jax.Array],
                 subject_index: jax.Array,
                 positions: tp.Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        if set(self.in_channels.keys()) != set(self.hidden.keys()):
            raise ValueError("in_channels and hidden keys must match")
        length = next(iter(inputs.values())).shape[-1]
        inputs = {name: jnp.swapaxes(x, 1, 2) for name, x in inputs.items()}
        in_channels = dict(self.in_channels)
        hidden = dict(self.hidden)

        emb = None
        if self.subject_layers:
            meg_dim = in_channels["meg"]
            dim = {"hidden": hidden["meg"],
                   "input": meg_dim}[self.subject_layers_dim]
            inputs["meg"] = SubjectLayers(meg_dim, dim, self.n_subjects)(
                inputs["meg"], subject_index)
            in_channels["meg"] = dim
        if self.subject_dim:
            emb = ScaledEmbedding(self.n_subjects, self.subject_dim,
                                  self.embedding_scale)(subject_index)
            if "input" in self.embedding_location:
                e = jnp.broadcast_to(
                    emb[:, None, :],
                    (inputs["meg"].shape[0], length, self.subject_dim))
                inputs["meg"] = jnp.concatenate([inputs["meg"], e], axis=-1)
                in_channels["meg"] += self.subject_dim

        if self.concatenate:
            ordered = [x for _, x in sorted(inputs.items())]
            inputs = {"concat": jnp.concatenate(ordered, axis=-1)}
            in_channels = {"concat": sum(in_channels.values())}
            hidden = {"concat": sum(hidden.values())}

        sizes = {}
        for name in in_channels:
            sizes[name] = [in_channels[name]] + [
                int(round(hidden[name] * self.growth ** k))
                for k in range(self.depth)]
        lstm_hidden = sum(s[-1] for s in sizes.values())

        params: tp.Dict[str, tp.Any] = dict(
            kernel=self.kernel_size, stride=self.stride,
            leakiness=self.relu_leakiness, dropout=self.conv_dropout,
            dropout_input=self.dropout_input, batch_norm=self.batch_norm)

        valid = self.valid_length(length)
        encoded = {}
        for name in sorted(inputs):
            x = inputs[name]
            x = jnp.pad(x, ((0, 0), (0, valid - length), (0, 0)))
            encoded[name] = ConvSequence(
                tuple(sizes[name]), **params, name=f"encoder_{name}")(
                    x, train=train)

        parts = [encoded[name] for name in sorted(encoded)]
        if "lstm" in self.embedding_location and emb is not None:
            parts.append(jnp.broadcast_to(
                emb[:, None, :],
                (parts[0].shape[0], parts[0].shape[1], self.subject_dim)))
        x = jnp.concatenate(parts, axis=-1)

        if self.lstm:
            if self.flip_lstm:
                x = x[:, ::-1]
            x = StackedLSTM(lstm_hidden, self.lstm,
                            self.bidirectional_lstm)(x)
            if self.flip_lstm:
                x = x[:, ::-1]

        for _ in range(self.attention):
            x = x + LocalAttention(lstm_hidden, heads=self.heads)(
                x, train=train)

        decoder_sizes = [int(round(lstm_hidden / self.growth ** k))
                         for k in range(self.depth + 1)]
        use_final = self.linear_out or self.complex_out
        if not use_final:
            params["activation_on_last"] = False
            decoder_sizes[-1] = self.out_channels
            assert self.depth > 0, "if no linear out, depth must be > 0"
        x = ConvSequence(tuple(decoder_sizes), decode=True, **params,
                         name="decoder")(x, train=train)
        if self.linear_out:
            assert not self.complex_out
            x = nn.Conv(self.out_channels, (1,))(x)
        elif self.complex_out:
            x = nn.Conv(2 * decoder_sizes[-1], (1,))(x)
            x = nn.relu(x)
            x = nn.Conv(self.out_channels, (1,))(x)
        return jnp.swapaxes(x[:, :length], 1, 2)
