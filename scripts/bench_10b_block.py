"""10B-shape single-Block microbench on one chip.

interm_10b (reference configs/interm_10b.yaml:39-42) is D=8192, depth=11,
heads=32 — 256 Frontier ranks. The full model cannot fit one v5e, but ONE
Block can (12*D^2 = 805M params, 1.6GB bf16): this measures how close the
10B-scale layer runs to the MXU roofline on real hardware, grounding the
AOT-sharding compile proofs (tests/test_scale_aot.py) with a measured
per-layer efficiency. Run alone (owns the chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from orbit2_tpu.models.components.blocks import Block

    on_tpu = jax.default_backend() == "tpu"
    D, H, N, B = (8192, 32, 2048, 1) if on_tpu else (256, 4, 128, 1)
    blk = Block(dim=D, num_heads=H, mlp_ratio=4.0, drop_path=0.0,
                attention_impl="auto", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.02, jnp.bfloat16)
    params = blk.init({"params": jax.random.PRNGKey(0)}, x,
                      deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Block D={D} H={H} N={N} B={B}: {n_params/1e6:.1f}M params")

    trunk_flops = 2.0 * B * N * 12 * D * D          # qkv+proj+fc1+fc2
    attn_flops = 4.0 * B * N * N * D                # QK^T + PV
    fwd_flops = trunk_flops + attn_flops

    fwd = jax.jit(lambda p, a: blk.apply({"params": p}, a, deterministic=True))
    t = timeit(fwd, params, x)
    print(f"fwd        {t*1e3:8.2f} ms  {fwd_flops/t/1e12:6.1f} TF "
          f"({fwd_flops/t/PEAK*100:4.1f}% of v5e peak)")

    def loss(p, a):
        return jnp.sum(blk.apply({"params": p}, a,
                                 deterministic=True).astype(jnp.float32) ** 2)

    step = jax.jit(jax.grad(loss))
    t3 = timeit(step, params, x)
    tot = 3.0 * fwd_flops
    print(f"fwd+bwd    {t3*1e3:8.2f} ms  {tot/t3/1e12:6.1f} TF "
          f"({tot/t3/PEAK*100:4.1f}% of v5e peak)")


if __name__ == "__main__":
    main()
