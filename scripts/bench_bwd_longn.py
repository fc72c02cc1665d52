"""Direct flash fwd/bwd kernel timing at long N (run alone, owns the chip).

Usage: python scripts/bench_bwd_longn.py [N] [block_q] [block_k]
Defaults: N=32768, kernel default blocks.

Round-2 long-context step arithmetic (scripts/bench_longctx.py) implied the
backward runs ~38 TF effective at 32k vs the forward's 60 TF; this measures
the kernels in isolation and sweeps blocks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else None
    bk = int(sys.argv[3]) if len(sys.argv) > 3 else None
    from orbit2_tpu.ops.flash_attention import (
        DEFAULT_BLOCK_K, flash_attention)

    kw = {}
    if bq:
        kw["block_q"] = bq
    kw["block_k"] = bk or DEFAULT_BLOCK_K

    B, H, D = 1, 16, 64
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)) * 0.1, jnp.bfloat16)
               for _ in range(3))

    fwd_flops = 4.0 * B * H * N * N * D
    # dq kernel: 3 NxN-by-NxD matmuls (s, dp, dq); dkv kernel: 4 (s_t, dv,
    # dp_t, dk) -> 7 vs the fwd's 2
    bwd_flops = 3.5 * fwd_flops

    fwd = jax.jit(lambda a, b, c: flash_attention(a, b, c, **kw))

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    t = timeit(fwd, q, k, v)
    print(f"N={N} blocks={kw}: fwd  {t*1e3:8.2f} ms "
          f"{fwd_flops/t/1e12:6.1f} TF ({fwd_flops/t/PEAK*100:4.1f}%)",
          flush=True)

    grad = jax.jit(jax.grad(
        lambda a, b, c: jnp.sum(
            flash_attention(a, b, c, **kw).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))
    t3 = timeit(grad, q, k, v)
    # grad runs fwd once (rematerialized by value_and_grad? no: custom_vjp
    # fwd saves o/lse) + dq + dkv kernels; credit fwd+bwd flops
    tot = fwd_flops + bwd_flops
    tb = t3 - t  # approx pure backward
    print(f"N={N} blocks={kw}: grad {t3*1e3:8.2f} ms "
          f"(bwd ~{tb*1e3:7.2f} ms, {bwd_flops/tb/1e12:6.1f} TF, "
          f"{bwd_flops/tb/PEAK*100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
