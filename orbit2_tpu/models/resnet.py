"""Periodic-conv ResNet, the Rasp & Theurey 2020 forecasting baseline
(reference models/hub/resnet.py:10-71)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from orbit2_tpu.registry import register_model
from orbit2_tpu.models.components.cnn import (
    PeriodicConv2D,
    ResidualBlock,
    _activation,
)


@register_model("resnet")
class ResNet(nn.Module):
    in_channels: int
    out_channels: int
    history: int = 1
    hidden_channels: int = 128
    activation: str = "leaky"
    norm: bool = True
    dropout: float = 0.1
    n_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *args, deterministic: bool = True, **kwargs):
        if x.ndim == 5:
            x = x.reshape(x.shape[0], -1, x.shape[3], x.shape[4])
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = PeriodicConv2D(self.hidden_channels, 7, pad_width=3, dtype=self.dtype)(x)
        for _ in range(self.n_blocks):
            x = ResidualBlock(self.hidden_channels, self.activation, norm=True,
                              dropout=self.dropout, dtype=self.dtype)(x, deterministic)
        if self.norm:
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, dtype=self.dtype)(x)
        x = _activation(self.activation)(x)
        x = PeriodicConv2D(self.out_channels, 7, pad_width=3, dtype=self.dtype)(x)
        return jnp.transpose(x, (0, 3, 1, 2))
