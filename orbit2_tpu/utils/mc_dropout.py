"""MC-Dropout ensemble inference (reference utils/mc_dropout.py:4-19).

The reference flips ONLY torch Dropout modules to train mode during eval
(`enable_dropout`, reference utils/mc_dropout.py:4-7) — DropPath (stochastic
depth) stays in eval mode. Here that selectivity falls out of rng streams:
we apply with `deterministic=False` but supply only the "dropout" stream;
DropPath draws from its own "drop_path" stream and is inert without it
(models/components/blocks.py DropPath), so the UQ ensemble samples the same
distribution as the reference's.
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
