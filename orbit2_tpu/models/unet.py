"""Classic U-Net with periodic convs and optional attention
(reference models/hub/unet.py:20-161)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from orbit2_tpu.registry import register_model
from orbit2_tpu.models.components.cnn import (
    DownBlock,
    Downsample,
    MiddleBlock,
    PeriodicConv2D,
    UpBlock,
    Upsample,
    _activation,
)


@register_model("unet")
class Unet(nn.Module):
    in_channels: int
    out_channels: int
    history: int = 1
    hidden_channels: int = 64
    activation: str = "leaky"
    norm: bool = True
    dropout: float = 0.1
    ch_mults: Tuple[int, ...] = (1, 2, 2, 4)
    is_attn: Tuple[bool, ...] = (False, False, False, False)
    mid_attn: bool = False
    n_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *args, deterministic: bool = True, **kwargs):
        if x.ndim == 5:
            x = x.reshape(x.shape[0], -1, x.shape[3], x.shape[4])
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = PeriodicConv2D(self.hidden_channels, 7, pad_width=3, dtype=self.dtype)(x)

        kwargs_blk = dict(activation=self.activation, norm=self.norm,
                          dropout=self.dropout, dtype=self.dtype)
        n_res = len(self.ch_mults)
        skips = [x]
        ch = self.hidden_channels
        # encoder (reference unet.py:57-84)
        for i in range(n_res):
            out_ch = ch * self.ch_mults[i]
            for _ in range(self.n_blocks):
                x = DownBlock(out_ch, has_attn=self.is_attn[i], **kwargs_blk)(
                    x, deterministic)
                ch = out_ch
                skips.append(x)
            if i < n_res - 1:
                x = Downsample(ch, dtype=self.dtype)(x)
                skips.append(x)

        x = MiddleBlock(ch, has_attn=self.mid_attn, **kwargs_blk)(x, deterministic)

        # decoder (reference unet.py:95-131): n_blocks at same width, one
        # channel-reducing block, upsample between resolutions
        for i in reversed(range(n_res)):
            for _ in range(self.n_blocks):
                s = skips.pop()
                x = jnp.concatenate((x, s), axis=-1)
                x = UpBlock(ch, has_attn=self.is_attn[i], **kwargs_blk)(
                    x, deterministic)
            out_ch = ch // self.ch_mults[i]
            s = skips.pop()
            x = jnp.concatenate((x, s), axis=-1)
            x = UpBlock(out_ch, has_attn=self.is_attn[i], **kwargs_blk)(
                x, deterministic)
            ch = out_ch
            if i > 0:
                x = Upsample(ch, dtype=self.dtype)(x)

        if self.norm:
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, dtype=self.dtype)(x)
        x = _activation(self.activation)(x)
        x = PeriodicConv2D(self.out_channels, 7, pad_width=3, dtype=self.dtype)(x)
        return jnp.transpose(x, (0, 3, 1, 2))
