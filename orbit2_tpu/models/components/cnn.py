"""CNN building blocks with periodic (longitude-wrap) padding.

Rebuild of reference models/hub/components/cnn_blocks.py: lon axis wraps
periodically, lat axis is zero padded (cnn_blocks.py:5-25). All modules here
work on NHWC tensors (TPU-native conv layout); the model classes transpose at
their NCHW public boundary.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def periodic_pad_nhwc(x, pad_width: int):
    """Wrap-pad longitude (W), zero-pad latitude (H) (reference :5-25)."""
    if pad_width == 0:
        return x
    x = jnp.concatenate(
        (x[:, :, -pad_width:, :], x, x[:, :, :pad_width, :]), axis=2
    )
    return jnp.pad(x, ((0, 0), (pad_width, pad_width), (0, 0), (0, 0)))


class PeriodicConv2D(nn.Module):
    """reference cnn_blocks.py:28-39."""

    features: int
    kernel_size: int
    stride: int = 1
    pad_width: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = periodic_pad_nhwc(x, self.pad_width)
        return nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="VALID", dtype=self.dtype,
        )(x)


class PeriodicConvTranspose2D(nn.Module):
    """Periodic pad then transposed conv (reference cnn_blocks.py:42-54 —
    defined but unused on the reference's active path; kept for component
    parity)."""

    features: int
    kernel_size: int
    stride: int = 1
    pad_width: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = periodic_pad_nhwc(x, self.pad_width)
        return nn.ConvTranspose(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="VALID",
            dtype=self.dtype,
        )(x)


def _activation(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    if name == "silu":
        return nn.silu
    if name == "leaky":
        return lambda x: nn.leaky_relu(x, negative_slope=0.3)
    raise NotImplementedError(f"Activation {name} not implemented")


class ResidualBlock(nn.Module):
    """conv->act->norm->drop x2 + (1x1-projected) shortcut
    (reference cnn_blocks.py:56-106)."""

    features: int
    activation: str = "leaky"
    norm: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # BatchNorm momentum 0.9 == torch BatchNorm2d's default 0.1
        # (reference cnn_blocks.py:90 uses the default); flax's 0.99 default
        # converges running stats 10x slower, skewing eval early in training
        act = _activation(self.activation)
        h = PeriodicConv2D(self.features, 3, pad_width=1, dtype=self.dtype)(x)
        h = act(h)
        if self.norm:
            h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = PeriodicConv2D(self.features, 3, pad_width=1, dtype=self.dtype)(h)
        h = act(h)
        if self.norm:
            h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return h + x


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H*W (reference cnn_blocks.py:109-164).
    NOTE: the reference softmaxes over dim=1 (queries) — an upstream quirk we
    reproduce for parity."""

    n_heads: int = 1
    d_k: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        d_k = self.d_k or C
        scale = d_k**-0.5
        seq = x.reshape(B, H * W, C)
        qkv = nn.Dense(self.n_heads * d_k * 3, dtype=self.dtype)(seq)
        qkv = qkv.reshape(B, H * W, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k) * scale
        attn = jax.nn.softmax(attn, axis=1)  # reference quirk: softmax over i
        res = jnp.einsum("bijh,bjhd->bihd", attn, v).reshape(B, H * W, self.n_heads * d_k)
        res = nn.Dense(C, dtype=self.dtype)(res)
        res = res + seq
        return res.reshape(B, H, W, C)


class DownBlock(nn.Module):
    """reference cnn_blocks.py:167-198."""

    features: int
    has_attn: bool = False
    activation: str = "leaky"
    norm: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = ResidualBlock(self.features, self.activation, self.norm, self.dropout,
                          self.dtype)(x, deterministic)
        if self.has_attn:
            x = AttentionBlock(dtype=self.dtype)(x, deterministic)
        return x


class UpBlock(nn.Module):
    """reference cnn_blocks.py:201-234 (input is concat of skip + up path)."""

    features: int
    has_attn: bool = False
    activation: str = "leaky"
    norm: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = ResidualBlock(self.features, self.activation, self.norm, self.dropout,
                          self.dtype)(x, deterministic)
        if self.has_attn:
            x = AttentionBlock(dtype=self.dtype)(x, deterministic)
        return x


class MiddleBlock(nn.Module):
    """reference cnn_blocks.py:237-273."""

    features: int
    has_attn: bool = False
    activation: str = "leaky"
    norm: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = ResidualBlock(self.features, self.activation, self.norm, self.dropout,
                          self.dtype)(x, deterministic)
        if self.has_attn:
            x = AttentionBlock(dtype=self.dtype)(x, deterministic)
        x = ResidualBlock(self.features, self.activation, self.norm, self.dropout,
                          self.dtype)(x, deterministic)
        return x


class Upsample(nn.Module):
    """2x transpose-conv upsample (reference cnn_blocks.py:276-284).

    torch ConvTranspose2d(k=4, s=2, p=1) doubles the spatial dims; in
    lax/flax explicit-padding terms that is (k-1-p, k-1-p) = (2, 2)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            dtype=self.dtype,
        )(x)


class Downsample(nn.Module):
    """2x strided-conv downsample (reference cnn_blocks.py:287-295)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(x)
