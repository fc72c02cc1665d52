"""Bisect the bf16 full-step compile failure with fused MLP live.
Progressively larger graphs around the kernel; run alone on the chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops.fused_mlp import fused_mlp

B, N, D, F = 8, 2048, 1024, 4096
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.bfloat16)
w1f = jnp.asarray(rng.normal(size=(D, F)) * D ** -0.5, jnp.float32)
b1f = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
w2f = jnp.asarray(rng.normal(size=(F, D)) * F ** -0.5, jnp.float32)
b2f = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
gamma = jnp.ones((D,), jnp.float32)
beta = jnp.zeros((D,), jnp.float32)
key = jax.random.PRNGKey(3)


def ln(x, g, b):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-5) * g + b).astype(x.dtype)


def case(name, fn, args):
    try:
        g = jax.jit(jax.grad(fn, argnums=tuple(range(len(args)))))
        out = g(*args)
        _ = float(sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out)))
        print(f"{name:46s} OK", flush=True)
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)


# 1: bare fused mlp, bf16-cast fp32 params (like the model: fp32 masters)
def f1(x, w1, b1, w2, b2):
    o = fused_mlp(x, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                  w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
                  drop_rate=0.1, rng=key)
    return jnp.sum(o.astype(jnp.float32) ** 2)


case("1 cast-params fused drop0.1", f1, (x, w1f, b1f, w2f, b2f))


# 2: + layernorm prologue and residual epilogue
def f2(x, w1, b1, w2, b2, g_, be):
    y = ln(x, g_, be)
    o = fused_mlp(y, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                  w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
                  drop_rate=0.1, rng=key)
    o = x + o
    return jnp.sum(o.astype(jnp.float32) ** 2)


case("2 ln+residual", f2, (x, w1f, b1f, w2f, b2f, gamma, beta))


# 3: two stacked, mean loss in fp32
def f3(x, w1, b1, w2, b2, g_, be):
    for _ in range(2):
        y = ln(x, g_, be)
        o = fused_mlp(y, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                      w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
                      drop_rate=0.1, rng=key)
        x = x + o
    return jnp.mean(x.astype(jnp.float32) ** 2)


case("3 two blocks", f3, (x, w1f, b1f, w2f, b2f, gamma, beta))


# 4: the actual Mlp module inside a minimal flax train-ish step
from flax import linen as nn  # noqa: E402

from orbit2_tpu.models.components.blocks import Mlp  # noqa: E402

mlp = Mlp(hidden_features=F, drop=0.1, dtype=jnp.bfloat16)
params = mlp.init({"params": jax.random.PRNGKey(0)}, x[0],
                  deterministic=True)["params"]


def f4(p, xb):
    o = mlp.apply({"params": p}, xb.reshape(B * N, D), deterministic=False,
                  rngs={"dropout": key})
    return jnp.mean(o.astype(jnp.float32) ** 2)


case("4 flax Mlp module", lambda p, xb: f4(p, xb), (params, x))
