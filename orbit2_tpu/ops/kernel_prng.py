"""Shared in-kernel PRNG bits for the dropout kernels.

Both the flash-attention in-kernel dropout (ops/flash_attention.py) and the
fused elementwise dropout (ops/dropout.py) regenerate their masks in the
backward pass from a (seed, block-index) pair; this module is the single
definition of how those bits are produced so the fwd/bwd-consistency
guarantee cannot desynchronize between the two.

On TPU the bits come from the hardware PRNG. The pallas interpreter stubs
prng_random_bits to zeros, so interpret mode derives the bits with a
murmur3-style hash over (seed, element index) in plain vector ops — a
different stream, but the SAME (seed, block-index) mapping, keeping the
mask-regeneration logic testable on the CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def interpret_mode() -> bool:
    """Pallas interpreter (off-TPU) — trace-time predicate."""
    return jax.default_backend() != "tpu"


def mask_bits(block_seed, shape):
    """Uniform uint32 bits of `shape`, deterministic in `block_seed`."""
    if not interpret_mode():
        pltpu.prng_seed(block_seed)
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (row * jnp.uint32(shape[1]) + col) ^ block_seed.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def keep_mult(block_seed, shape, drop_rate):
    """Dropout multiplier in {0, 1/keep} of `shape` (fp32)."""
    keep = 1.0 - drop_rate
    bits = mask_bits(block_seed, shape)
    thresh = jnp.uint32(int(keep * 4294967295.0))
    return jnp.where(bits <= thresh, 1.0 / keep, 0.0).astype(jnp.float32)
