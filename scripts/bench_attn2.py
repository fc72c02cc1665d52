"""Locate the fwd flash kernel's time: matmul-only ceiling vs +exp2 vs
+reductions, and prototype the bound-shift one-pass softmax.

Run alone on the chip: PYTHONPATH=. python scripts/bench_attn2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, H, D = 8, 2048, 16, 64
BQ, BK = 512, 2048
FLOPS = 4 * B * H * N * N * D


def bench(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def make_inputs():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B * H, N, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B * H, N, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B * H, N, D)), dtype=jnp.bfloat16)
    return q, k, v


# --- variant kernels (bk == N: single k block per program) -------------------

def _kern_matmul_only(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.dot_general(s.astype(jnp.bfloat16), v_ref[0],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _kern_exp_noreduce(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - 20.0)  # fixed shift: no reductions at all
    o_ref[0] = jax.lax.dot_general(p.astype(jnp.bfloat16), v_ref[0],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _kern_full_softmax(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kern_bound_shift(b_ref, q_ref, k_ref, vx_ref, o_ref):
    # q pre-scaled by sm_scale*log2e outside; vx = [v | ones] (d+128 lanes);
    # per-row bound b replaces the max; l rides the MXU as the ones column.
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - b_ref[0])
    acc = jax.lax.dot_general(p.astype(jnp.bfloat16), vx_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc[:, :D] / acc[:, D:D + 1]).astype(o_ref.dtype)


def run_simple(kern, name, q, k, v):
    fn = pl.pallas_call(
        kern,
        grid=(B * H, N // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, BK, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, BK, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )
    f = jax.jit(lambda q, k, v: fn(q, k, v))
    t = bench(f, q, k, v)
    print(f"{name:28s} {t*1e3:7.2f} ms {FLOPS/t/1e12:6.1f} TF", flush=True)


def run_bound(q, k, v):
    scale = (D ** -0.5) * 1.4426950408889634

    def outer(q, k, v):
        qs = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        qn = jnp.linalg.norm(qs.astype(jnp.float32), axis=-1)          # BH,N
        kn = jnp.max(jnp.linalg.norm(k.astype(jnp.float32), axis=-1),
                     axis=-1)                                          # BH
        bound = (qn * kn[:, None])[:, :, None]                         # BH,N,1
        bound = jnp.broadcast_to(bound, (B * H, N, 128)).astype(jnp.float32)
        ones = jnp.ones((B * H, N, 128 - D), jnp.bfloat16)
        vx = jnp.concatenate([v, ones], axis=-1)
        fn = pl.pallas_call(
            _kern_bound_shift,
            grid=(B * H, N // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, 128), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, BK, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, BK, D + (128 - D)), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B * H, N, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )
        return fn(bound, qs, k, vx)

    f = jax.jit(outer)
    t = bench(f, q, k, v)
    print(f"{'bound-shift one-pass':28s} {t*1e3:7.2f} ms {FLOPS/t/1e12:6.1f} TF",
          flush=True)

    # numerics vs reference SDPA
    got = np.asarray(f(q, k, v), dtype=np.float32)
    qf, kf, vf = (np.asarray(a, np.float32) for a in (q, k, v))
    s = np.einsum("bqd,bkd->bqk", qf, kf) * (D ** -0.5)
    p = np.exp(s - s.max(-1, keepdims=True))
    want = np.einsum("bqk,bkd->bqd", p / p.sum(-1, keepdims=True), vf)
    err = np.abs(got - want).max()
    print(f"   max abs err vs sdpa: {err:.2e}", flush=True)


if __name__ == "__main__":
    q, k, v = make_inputs()
    run_simple(_kern_matmul_only, "matmul-only ceiling", q, k, v)
    run_simple(_kern_exp_noreduce, "matmul+exp2 (no reductions)", q, k, v)
    run_simple(_kern_full_softmax, "one-shot full softmax", q, k, v)
    run_bound(q, k, v)
