"""Flash-attention kernel sweep on the real chip: (group, block_q, block_k)
for fwd and fwd+bwd at the production shapes.

Run alone (nothing else may hold the TPU): python scripts/bench_attn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops.flash_attention import flash_attention


def bench(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def sweep(b, n, h, d, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=dtype)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=dtype)
    flops_fwd = 4 * b * h * n * n * d
    # bwd: dq (4 matmul-flop units of 2*n^2*d) + dkv (6) ~= 2.5x fwd
    flops_bwd = flops_fwd * 2.5

    print(f"== B{b} N{n} H{h} d{d} {jnp.dtype(dtype).name} ==", flush=True)
    cases = []
    for g in (1, 2, 4, 8):
        for bq, bk in ((256, 2048), (512, 2048), (256, 1024), (512, 1024),
                       (1024, 2048), (256, 512)):
            if bq > n or bk > n or (b * h) % g:
                continue
            cases.append((g, bq, bk))

    for g, bq, bk in cases:
        try:
            fwd = jax.jit(lambda q, k, v, g=g, bq=bq, bk=bk: flash_attention(
                q, k, v, block_q=bq, block_k=bk, group=g))
            t_f = bench(fwd, q, k, v)

            def loss(q, k, v, g=g, bq=bq, bk=bk):
                return jnp.sum(flash_attention(q, k, v, block_q=bq, block_k=bk,
                                               group=g).astype(jnp.float32) ** 2)

            gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_b = bench(gfn, q, k, v) - t_f  # grad includes one fwd
            print(f"g{g} bq{bq} bk{bk}: fwd {t_f*1e3:7.2f} ms "
                  f"{flops_fwd/t_f/1e12:6.1f} TF | bwd {t_b*1e3:7.2f} ms "
                  f"{flops_bwd/max(t_b,1e-9)/1e12:6.1f} TF", flush=True)
        except Exception as e:
            print(f"g{g} bq{bq} bk{bk}: FAILED {type(e).__name__} "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    sweep(8, 2048, 16, 64)    # 117M production shape
    sweep(2, 2048, 24, 128)   # 1B production shape
