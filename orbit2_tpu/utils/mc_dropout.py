"""MC-Dropout ensemble inference (reference utils/mc_dropout.py:4-19).

The reference flips torch Dropout modules to train mode during eval
(`enable_dropout`); in JAX the same thing is simply applying the model with
`deterministic=False` under n different PRNG keys — no module mutation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def get_monte_carlo_predictions(
    model,
    params,
    x,
    in_variables: Sequence[str],
    out_variables: Sequence[str],
    n_samples: int = 10,
    rng=None,
):
    """Returns [n_samples, B, C_out, H, W] of stochastic forward passes."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    keys = jax.random.split(rng, n_samples)

    def one(key):
        return model.apply(
            {"params": params}, x, tuple(in_variables), tuple(out_variables),
            deterministic=False, rngs={"dropout": key},
        )

    # vmap over keys would recompile the full model per lane on TPU memory
    # budget grounds; lax.map keeps one compiled instance and loops on device.
    return jax.lax.map(one, keys)
