"""Bisect round 3 (rate=0 so XLA can replicate bwd pieces):
which bwd kernel triggers the bf16 LN+residual compile crash."""

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
BT, BF = 512, 512
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


def xla_bwd(x, w1, b1, w2, do):
    """Reference bwd chain at rate 0 (recompute h in XLA)."""
    xf = x
    h_pre = (xf @ w1 + b1).astype(jnp.float32)
    g = fm._gelu(h_pre).astype(x.dtype)
    dw2 = jax.lax.dot_general(g, do, (((0,), (0,)), ((), ())))
    db2 = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dh = jax.lax.dot_general(do, w2, (((1,), (1,)), ((), ())))
    dpre = (dh.astype(jnp.float32) * fm._dgelu(h_pre)).astype(x.dtype)
    dw1 = jax.lax.dot_general(x, dpre, (((0,), (0,)), ((), ())))
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)
    dx = jax.lax.dot_general(dpre, w1, (((1,), (1,)), ((), ())))
    return dx, dw1, db1, dw2, db2


def make_core(dx_pallas, dw_pallas):
    @functools.partial(jax.custom_vjp)
    def core(x, w1, b1, w2, b2):
        return fm._fwd(x, w1, b1, w2, b2, seed, 0.0, BT, BF)

    def fwd(x, w1, b1, w2, b2):
        return core(x, w1, b1, w2, b2), (x, w1, b1, w2)

    def bwd(res, do):
        x, w1, b1, w2 = res
        xd, xw1, xb1, xw2, xb2 = xla_bwd(x, w1, b1, w2, do)
        if dx_pallas or dw_pallas:
            pd, pw1, pb1, pw2, pb2 = fm._bwd(x, w1, b1, w2, seed, 0.0,
                                             BT, BF, do)
        dx = pd if dx_pallas else xd
        if dw_pallas:
            dw1, db1, dw2, db2 = (pw1.astype(w1.dtype), pb1.astype(b1.dtype),
                                  pw2.astype(w2.dtype), pb2.astype(b2.dtype))
        else:
            dw1, db1, dw2, db2 = xw1, xb1.astype(b1.dtype), xw2, \
                xb2.astype(b2.dtype)
        return dx, dw1, db1, dw2, db2

    core.defvjp(fwd, bwd)
    return core


def case(name, dx_pallas, dw_pallas):
    core = make_core(dx_pallas, dw_pallas)

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


case("bwd all-XLA (fwd kernel only)", False, False)
case("bwd dx-pallas only", True, False)
case("bwd dw-pallas only", False, True)
case("bwd both pallas", True, True)
