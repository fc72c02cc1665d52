"""Bisect round 2: LN vs residual vs barrier workaround."""

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


def fused(y, w1, b1, w2, b2, barrier=False):
    args = (y, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
            w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16))
    if barrier:
        args = jax.lax.optimization_barrier(args)
    o = fused_mlp(*args, drop_rate=0.1, rng=key)
    if barrier:
        o = jax.lax.optimization_barrier(o)
    return o


def case(name, fn, args):
    try:
        g = jax.jit(jax.grad(fn, argnums=tuple(range(len(args)))))
        out = g(*args)
        _ = float(sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out)))
        print(f"{name:46s} OK", flush=True)
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:90]}",
              flush=True)


def f_res(x, w1, b1, w2, b2):
    return jnp.sum((x + fused(x, w1, b1, w2, b2)).astype(jnp.float32) ** 2)


def f_ln(x, w1, b1, w2, b2, g_, be):
    return jnp.sum(
        fused(ln(x, g_, be), w1, b1, w2, b2).astype(jnp.float32) ** 2)


def f_both_barrier(x, w1, b1, w2, b2, g_, be):
    o = x + fused(ln(x, g_, be), w1, b1, w2, b2, barrier=True)
    return jnp.sum(o.astype(jnp.float32) ** 2)


case("2a residual only", f_res, (x, w1f, b1f, w2f, b2f))
case("2b ln only", f_ln, (x, w1f, b1f, w2f, b2f, gamma, beta))
case("2c ln+residual+barrier", f_both_barrier,
     (x, w1f, b1f, w2f, b2f, gamma, beta))
