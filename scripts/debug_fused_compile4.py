"""Bisect round 4: does a smaller dw kernel (256x256 blocks) compile in the
LN+residual bf16 context?"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops import fused_mlp as fm

B, N, D, F = 8, 2048, 1024, 4096
T = B * N
rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(D, F)) * D ** -0.5, jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(1, F)) * 0.1, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(F, D)) * F ** -0.5, jnp.bfloat16)
b2 = jnp.asarray(rng.normal(size=(1, D)) * 0.1, jnp.bfloat16)
gamma = jnp.ones((D,), jnp.float32)
beta = jnp.zeros((D,), jnp.float32)
seed = jnp.zeros((2,), jnp.int32)


def ln(x, g, b):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-5) * g + b).astype(x.dtype)


def case(name, bt, bf):
    @functools.partial(jax.custom_vjp)
    def core(x, w1, b1, w2, b2):
        return fm._fwd(x, w1, b1, w2, b2, seed, 0.0, 512, 512)

    def fwd(x, w1, b1, w2, b2):
        return core(x, w1, b1, w2, b2), (x, w1, b1, w2)

    def bwd(res, do):
        x, w1, b1, w2 = res
        dx, dw1, db1, dw2, db2 = fm._bwd(x, w1, b1, w2, seed, 0.0,
                                         bt, bf, do)
        return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))

    core.defvjp(fwd, bwd)

    def f(x, w1, b1, w2, b2, g_, be):
        y = ln(x, g_, be).reshape(T, D)
        o = core(y, w1, b1, w2, b2).reshape(B, N, D)
        return jnp.sum((x + o).astype(jnp.float32) ** 2)

    try:
        g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))
        out = g(x3, w1, b1, w2, b2, gamma, beta)
        _ = float(sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out)))
        print(f"{name:46s} OK", flush=True)
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:90]}",
              flush=True)


case("dw blocks 256x256", 256, 256)
case("dw blocks 128x512", 128, 512)
