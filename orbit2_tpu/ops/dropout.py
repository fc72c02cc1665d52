"""Fused TPU dropout: mask generated INSIDE the kernel by the TPU PRNG and
regenerated in the backward kernel from the same (seed, block-index) pair —
no mask or random-bits tensor ever reaches HBM, and no residual is saved
for the backward pass beyond the 4-byte seed.

Replaces flax nn.Dropout on the hot paths (Mlp hidden [B*N, 4D], attention
proj, pos_drop): XLA's dropout materializes a u32 bits tensor per site and
carries a mask residual into the backward graph (~270MB/site at the 117M
training shapes), which round-1 ablations measured as the main
non-attention overhead (docs/performance.md).

Bit generation is shared with the flash-attention in-kernel dropout via
ops/kernel_prng.py: hardware PRNG on TPU, murmur3-hash bits under the pallas
interpreter so CPU tests exercise the identical fwd/bwd mask-consistency
logic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 512
BLOCK_C = 1024


from orbit2_tpu.ops.kernel_prng import interpret_mode as _interpret
from orbit2_tpu.ops.kernel_prng import keep_mult


def _mult(seed_ref, i, j, shape, rate):
    return keep_mult(seed_ref[0] + i * 1000003 + j * 7919, shape, rate)


def _kernel(seed_ref, x_ref, o_ref, *, rate):
    i = pl.program_id(0)
    j = pl.program_id(1)
    mult = _mult(seed_ref, i, j, x_ref.shape, rate).astype(x_ref.dtype)
    o_ref[:] = x_ref[:] * mult


def _apply(x2d, seed, rate):
    r, c = x2d.shape
    br = min(BLOCK_R, r)
    bc = min(BLOCK_C, c)
    return pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid=(r // br, c // bc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, bc), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=_interpret(),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _core(x2d, seed, rate):
    return _apply(x2d, seed, rate)


def _core_fwd(x2d, seed, rate):
    return _apply(x2d, seed, rate), seed


def _core_bwd(rate, seed, g):
    import numpy as np

    # dy * mask/keep — the kernel regenerates the identical mask from seed
    return _apply(g, seed, rate), np.zeros(seed.shape, dtype=jax.dtypes.float0)


_core.defvjp(_core_fwd, _core_bwd)


def fused_dropout(x, rate: float, rng) -> jax.Array:
    """Dropout with in-kernel TPU PRNG. x: any shape; last dim and the
    flattened leading dims should be lane/sublane friendly (the wrapper pads
    otherwise). rate == 0 returns x unchanged."""
    if rate <= 0.0:
        return x
    shape = x.shape
    cols = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2d = x.reshape(rows, cols)
    pr = (-rows) % 8
    pc = (-cols) % 128
    if pr or pc:
        x2d = jnp.pad(x2d, ((0, pr), (0, pc)))
    # pallas grid needs divisibility: fall back to one big block when the
    # padded dims don't tile evenly
    r, c = x2d.shape
    if r % min(BLOCK_R, r) or c % min(BLOCK_C, c):
        seed = jax.random.randint(rng, (1,), -2**31, 2**31 - 1, dtype=jnp.int32)
        mask = _mult_xla(seed, (r, c), rate).astype(x2d.dtype)
        out = x2d * mask
    else:
        seed = jax.random.randint(rng, (1,), -2**31, 2**31 - 1, dtype=jnp.int32)
        out = _core(x2d, seed, rate)
    if pr or pc:
        out = out[:rows, :cols]
    return out.reshape(shape)


def _mult_xla(seed, shape, rate):
    """XLA fallback for awkward shapes (same semantics, not the same bits)."""
    keep = 1.0 - rate
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    bits = jax.random.bernoulli(key, keep, shape)
    return jnp.where(bits, 1.0 / keep, 0.0)


def _fused_ok() -> bool:
    """Fused pallas dropout only where a pallas_call is safe AND fast:
    on-TPU and not under a multi-device mesh (GSPMD cannot partition a
    pallas_call — it would gather the full activation onto every device;
    the mesh path keeps XLA dropout, which GSPMD shards perfectly)."""
    from orbit2_tpu.ops.seq_attention import data_mesh_active

    return jax.default_backend() == "tpu" and not data_mesh_active()


def dropout(x, rate: float, deterministic: bool, rng_fn):
    """Drop-in replacement for flax nn.Dropout on hot activation paths.
    `rng_fn` is called only when a mask is actually needed."""
    if deterministic or rate <= 0.0:
        return x
    if _fused_ok():
        return fused_dropout(x, rate, rng_fn())
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng_fn(), keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
