"""Bisect the 117M bf16 full-step compile failure with the fused MLP live
(conclusions recorded in docs/performance.md "Fused MLP kernel").

Four bisection rounds, selectable by argv (default: all):
  r1  graph-size ladder: bare kernel -> +LN/residual -> 2 blocks -> flax Mlp
  r2  LN vs residual vs optimization_barrier workaround
  r3  rate=0 kernel swap: which pallas bwd kernel (dx vs dw) triggers the
      crash when XLA LN-backward fusions surround it
  r4  shrunken dw blocks (256x256 compiles everywhere; the r3 culprit was
      the 512x512 dw working set)

Run alone on the chip: python scripts/debug_fused_compile.py [r1 r2 r3 r4]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops import fused_mlp as fm
from orbit2_tpu.ops.fused_mlp import fused_mlp

B, N, D, F = 8, 2048, 1024, 4096
T = B * N
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.bfloat16)
# fp32 "master" params (cast to bf16 at use, like the model)
w1f = jnp.asarray(rng.normal(size=(D, F)) * D ** -0.5, jnp.float32)
b1f = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
w2f = jnp.asarray(rng.normal(size=(F, D)) * F ** -0.5, jnp.float32)
b2f = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
# bf16 params in the _core layout (biases [1, ...]) for the r3/r4 harness
w1b, b1b = w1f.astype(jnp.bfloat16), b1f.reshape(1, F).astype(jnp.bfloat16)
w2b, b2b = w2f.astype(jnp.bfloat16), b2f.reshape(1, D).astype(jnp.bfloat16)
gamma = jnp.ones((D,), jnp.float32)
beta = jnp.zeros((D,), jnp.float32)
key = jax.random.PRNGKey(3)
seed0 = jnp.zeros((2,), jnp.int32)


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


def fused(y, w1, b1, w2, b2, barrier=False):
    args = (y, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
            w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16))
    if barrier:
        args = jax.lax.optimization_barrier(args)
    o = fused_mlp(*args, drop_rate=0.1, rng=key)
    if barrier:
        o = jax.lax.optimization_barrier(o)
    return o


def r1():
    """Graph-size ladder around the dropout-active kernel."""
    def f1(x, w1, b1, w2, b2):
        return jnp.sum(fused(x, w1, b1, w2, b2).astype(jnp.float32) ** 2)

    case("1 cast-params fused drop0.1", f1, (x, w1f, b1f, w2f, b2f))

    def f2(x, w1, b1, w2, b2, g_, be):
        o = x + fused(ln(x, g_, be), w1, b1, w2, b2)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    case("2 ln+residual", f2, (x, w1f, b1f, w2f, b2f, gamma, beta))

    def f3(x, w1, b1, w2, b2, g_, be):
        for _ in range(2):
            x = x + fused(ln(x, g_, be), w1, b1, w2, b2)
        return jnp.mean(x.astype(jnp.float32) ** 2)

    case("3 two blocks", f3, (x, w1f, b1f, w2f, b2f, gamma, beta))

    from orbit2_tpu.models.components.blocks import Mlp

    mlp = Mlp(hidden_features=F, drop=0.1, dtype=jnp.bfloat16)
    params = mlp.init({"params": jax.random.PRNGKey(0)}, x[0],
                      deterministic=True)["params"]

    def f4(p, xb):
        o = mlp.apply({"params": p}, xb.reshape(T, D), deterministic=False,
                      rngs={"dropout": key})
        return jnp.mean(o.astype(jnp.float32) ** 2)

    case("4 flax Mlp module", f4, (params, x))


def r2():
    """LN vs residual vs optimization_barrier."""
    def f_res(x, w1, b1, w2, b2):
        return jnp.sum((x + fused(x, w1, b1, w2, b2)).astype(jnp.float32) ** 2)

    case("2a residual only", f_res, (x, w1f, b1f, w2f, b2f))

    def f_ln(x, w1, b1, w2, b2, g_, be):
        return jnp.sum(
            fused(ln(x, g_, be), w1, b1, w2, b2).astype(jnp.float32) ** 2)

    case("2b ln only", f_ln, (x, w1f, b1f, w2f, b2f, gamma, beta))

    def f_barrier(x, w1, b1, w2, b2, g_, be):
        o = x + fused(ln(x, g_, be), w1, b1, w2, b2, barrier=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    case("2c ln+residual+barrier", f_barrier,
         (x, w1f, b1f, w2f, b2f, gamma, beta))


def _xla_bwd(x, w1, b1, w2, do):
    """Reference bwd chain at rate 0 (recompute h in XLA)."""
    h_pre = (x @ w1 + b1).astype(jnp.float32)
    g = fm._gelu(h_pre).astype(x.dtype)
    dw2 = jax.lax.dot_general(g, do, (((0,), (0,)), ((), ())))
    db2 = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dh = jax.lax.dot_general(do, w2, (((1,), (1,)), ((), ())))
    dpre = (dh.astype(jnp.float32) * fm._dgelu(h_pre)).astype(x.dtype)
    dw1 = jax.lax.dot_general(x, dpre, (((0,), (0,)), ((), ())))
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)
    dx = jax.lax.dot_general(dpre, w1, (((1,), (1,)), ((), ())))
    return dx, dw1, db1, dw2, db2


def _ln_res_case(name, bwd_fn):
    """LN + residual around a rate-0 fwd kernel with a custom bwd mix."""
    @functools.partial(jax.custom_vjp)
    def core(x, w1, b1, w2, b2):
        return fm._fwd(x, w1, b1, w2, b2, seed0, 0.0, 512, 512)

    def fwd(x, w1, b1, w2, b2):
        return core(x, w1, b1, w2, b2), (x, w1, b1, w2)

    core.defvjp(fwd, bwd_fn)

    def f(x, w1, b1, w2, b2, g_, be):
        y = ln(x, g_, be).reshape(T, D)
        o = core(y, w1, b1, w2, b2).reshape(B, N, D)
        return jnp.sum((x + o).astype(jnp.float32) ** 2)

    case(name, f, (x, w1b, b1b, w2b, b2b, gamma, beta))


def r3():
    """Swap each pallas bwd kernel against the XLA bwd at rate 0."""
    def make_bwd(dx_pallas, dw_pallas):
        def bwd(res, do):
            x, w1, b1, w2 = res
            xd, xw1, xb1, xw2, xb2 = _xla_bwd(x, w1, b1, w2, do)
            if dx_pallas or dw_pallas:
                pd, pw1, pb1, pw2, pb2 = fm._bwd(x, w1, b1, w2, seed0, 0.0,
                                                 512, 512, do)
            dx = pd if dx_pallas else xd
            if dw_pallas:
                dws = (pw1.astype(w1.dtype), pb1.astype(b1.dtype),
                       pw2.astype(w2.dtype), pb2.astype(b2.dtype))
            else:
                dws = (xw1, xb1.astype(b1.dtype), xw2, xb2.astype(b2.dtype))
            return (dx,) + dws
        return bwd

    _ln_res_case("bwd all-XLA (fwd kernel only)", make_bwd(False, False))
    _ln_res_case("bwd dx-pallas only", make_bwd(True, False))
    _ln_res_case("bwd dw-pallas only", make_bwd(False, True))
    _ln_res_case("bwd both pallas", make_bwd(True, True))


def r4():
    """Does a smaller dw working set compile in the LN+residual context?
    (_bwd derives dw blocks by capping the fwd blocks at 256.)"""
    def make_bwd(bt, bf):
        def bwd(res, do):
            x, w1, b1, w2 = res
            dx, dw1, db1, dw2, db2 = fm._bwd(x, w1, b1, w2, seed0, 0.0,
                                             bt, bf, do)
            return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(b2.dtype))
        return bwd

    _ln_res_case("dw blocks capped via (256,256)", make_bwd(256, 256))
    _ln_res_case("dw blocks capped via (128,512)", make_bwd(128, 512))


if __name__ == "__main__":
    rounds = sys.argv[1:] or ["r1", "r2", "r3", "r4"]
    for r in rounds:
        print(f"--- {r} ---", flush=True)
        {"r1": r1, "r2": r2, "r3": r3, "r4": r4}[r]()
