"""Target transforms (reference src/climate_learn/transforms/*.py, 80 LoC).

`Denormalize` inverts the per-variable Normalize; precipitation variables get
identity (mean 0 / std 1) because they are log-transformed in data space
instead (reference transforms/denormalize.py:23-31). `Mask` zeroes (or sets)
values outside a mask (reference transforms/mask.py:10-20).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from orbit2_tpu.registry import register_transform as register
from orbit2_tpu.data.processing.era5_constants import PRECIP_VARIABLES


@register("denormalize")
class Denormalize:
    def __init__(self, data_module):
        norm = data_module.get_out_transforms()
        if norm is None:
            raise RuntimeError("norm was 'None', did you setup the data module?")
        mean = np.array(
            [norm[k].mean if k not in PRECIP_VARIABLES else 0.0 for k in norm.keys()],
            dtype=np.float32,
        )
        std = np.array(
            [norm[k].std if k not in PRECIP_VARIABLES else 1.0 for k in norm.keys()],
            dtype=np.float32,
        )
        # x * std + mean, expressed like the reference's inverse-Normalize
        self.mean = jnp.asarray(mean).reshape(1, -1, 1, 1)
        self.std = jnp.asarray(std).reshape(1, -1, 1, 1)

    def __call__(self, x):
        return x * self.std + self.mean


@register("mask")
class Mask:
    def __init__(self, mask, val=0):
        self.mask = jnp.asarray(mask)
        self.val = val

    def __call__(self, x):
        return jnp.where(self.mask == 1, x, self.val)
