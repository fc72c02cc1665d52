"""Validate + time the one-shot fwd flash kernel at production shapes.

Run alone on the chip: PYTHONPATH=. python scripts/bench_attn3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops.flash_attention import flash_attention

B, N, H, D = 8, 2048, 16, 64
FWD_FLOPS = 4 * B * H * N * N * D
BWD_FLOPS = FWD_FLOPS * 3.5  # dq 3 + dkv 4 matmuls vs fwd's 2


def bench(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.bfloat16)

# numerics vs fp32 SDPA
got = np.asarray(jax.jit(flash_attention)(q, k, v), np.float32)
qf, kf, vf = (np.asarray(a, np.float32) for a in (q, k, v))
s = np.einsum("bqhd,bkhd->bhqk", qf, kf) * (D ** -0.5)
p = np.exp(s - s.max(-1, keepdims=True))
want = np.einsum("bhqk,bkhd->bqhd", p / p.sum(-1, keepdims=True), vf)
print("one-shot max abs err vs sdpa:", float(np.abs(got - want).max()), flush=True)

for bq in (256, 512, 1024):
    fwd = jax.jit(lambda q, k, v, bq=bq: flash_attention(q, k, v, block_q=bq))
    t_f = bench(fwd, q, k, v)

    def loss(q, k, v, bq=bq):
        return jnp.sum(flash_attention(q, k, v, block_q=bq).astype(jnp.float32) ** 2)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_g = bench(gfn, q, k, v)
    t_b = t_g - t_f
    print(f"bq{bq}: fwd {t_f*1e3:6.2f} ms {FWD_FLOPS/t_f/1e12:5.1f} TF | "
          f"grad {t_g*1e3:6.2f} ms | bwd-est {t_b*1e3:6.2f} ms "
          f"{BWD_FLOPS/max(t_b,1e-9)/1e12:5.1f} TF", flush=True)

# with in-kernel dropout (training path)
key = jax.random.PRNGKey(0)
fwd_d = jax.jit(lambda q, k, v: flash_attention(q, k, v, dropout_rate=0.1,
                                                dropout_rng=key))
t_fd = bench(fwd_d, q, k, v)
print(f"fwd+dropout: {t_fd*1e3:6.2f} ms {FWD_FLOPS/t_fd/1e12:5.1f} TF", flush=True)
