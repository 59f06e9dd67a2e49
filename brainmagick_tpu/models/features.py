"""Feature models: trainable speech-side encoders applied to the ground
truth before the contrastive loss.

Reference parity: bm/models/features.py — DeepMel is a ConvSequence over
mel-spectrogram features (config bm/conf/feature_model/deep_mel.yaml:
hidden 320 x 10 layers, out 768, kernel 3, dilation period 5, batch
norm, skip, GLU every 2 with context 1).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvSequence


class DeepMel(nn.Module):
    """ConvSequence over [B, F, T] mel features -> [B, out, T]."""

    n_in_channels: int
    n_hidden_channels: int = 320
    n_hidden_layers: int = 10
    n_out_channels: int = 768
    kernel: int = 3
    stride: int = 1
    dilation_growth: int = 2
    dilation_period: tp.Optional[int] = 5
    batch_norm: bool = True
    activation_on_last: bool = False
    skip: bool = True
    glu: int = 2
    glu_context: int = 1
    dtype: tp.Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        channels = ([self.n_in_channels]
                    + [self.n_hidden_channels] * (self.n_hidden_layers - 1)
                    + [self.n_out_channels])
        x = jnp.swapaxes(x, 1, 2)
        x = ConvSequence(
            tuple(channels), kernel=self.kernel, stride=self.stride,
            dilation_growth=self.dilation_growth,
            dilation_period=self.dilation_period,
            batch_norm=self.batch_norm,
            activation_on_last=self.activation_on_last, skip=self.skip,
            glu=self.glu, glu_context=self.glu_context,
            dtype=(jnp.dtype(self.dtype) if self.dtype is not None
                   else None))(x, train=train)
        return jnp.swapaxes(x, 1, 2).astype(jnp.float32)
