"""Non-learned / simple baselines (reference models/hub/{climatology.py,
persistence.py, linear_regression.py, interpolation.py}).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from orbit2_tpu.registry import register_model


@register_model("climatology")
class Climatology(nn.Module):
    """Repeats the climatology for every sample (reference climatology.py:8-20)."""

    clim: jnp.ndarray  # (C, H, W)

    def __call__(self, x, *args, **kwargs):
        return jnp.broadcast_to(self.clim[None], (x.shape[0],) + self.clim.shape)


@register_model("persistence")
class Persistence(nn.Module):
    """Returns the last input state for the output channels
    (reference persistence.py:11-28)."""

    channels: Sequence[int]

    def __call__(self, x, *args, **kwargs):
        if x.ndim == 5:  # [B, T, C, H, W] -> last history step
            x = x[:, -1]
        return x[:, jnp.asarray(list(self.channels))]


@register_model("linear-regression")
class LinearRegression(nn.Module):
    """Flattened linear map (reference linear_regression.py:8-24)."""

    in_features: int
    out_features: int
    out_shape: Tuple[int, int, int]  # (C, H, W)

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        y = nn.Dense(self.out_features)(flat)
        return y.reshape((b,) + tuple(self.out_shape))


class Interpolation(nn.Module):
    """F.interpolate wrapper (reference interpolation.py:9-18)."""

    scale_factor: float
    mode: str = "bilinear"  # or "nearest"

    def __call__(self, x, *args, **kwargs):
        b, c, h, w = x.shape
        new_h = int(h * self.scale_factor)
        new_w = int(w * self.scale_factor)
        method = {"bilinear": "bilinear", "nearest": "nearest"}[self.mode]
        return jax.image.resize(x, (b, c, new_h, new_w), method=method)
