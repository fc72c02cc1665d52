"""Pixel shuffle (depth-to-space) matching torch.nn.PixelShuffle semantics.

torch: out[b, c, h*r+i, w*r+j] = x[b, c*r^2 + i*r + j, h, w]
(used by the reference's CNN residual path, res_slimvit.py:110).
Pure reshape/transpose — XLA compiles it to a layout change.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_nchw(x, r: int):
    """x: [B, C*r^2, H, W] -> [B, C, H*r, W*r]."""
    b, crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(b, c, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, c, h, i, w, j
    return x.reshape(b, c, h * r, w * r)


def pixel_shuffle_nhwc(x, r: int):
    """x: [B, H, W, C*r^2] -> [B, H*r, W*r, C], channel index = c*r^2+i*r+j."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)
