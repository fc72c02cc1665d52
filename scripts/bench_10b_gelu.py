"""Substantiate `gelu_approx: tanh` in configs/interm_10b.yaml with a
measurement at the 10B layer shape, not just the 1B transfer argument.

interm_10b is D=8192 (MLP hidden 32768) — the erf evaluations are pure VPU
transcendental work over the widest activation in the model. bench_10b_block
showed one Block at 67.3%-of-peak fwd+bwd; this measures the same Block with
gelu erf vs tanh, interleaved min-of-3. Run alone (owns the chip; nproc==1 —
no concurrent CPU work or the timings inflate).
"""

import json
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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.02, jnp.bfloat16)

    trunk_flops = 2.0 * B * N * 12 * D * D
    attn_flops = 4.0 * B * N * N * D
    tot = 3.0 * (trunk_flops + attn_flops)  # fwd+bwd 2:1 convention

    steps = {}
    for form in ("erf", "tanh"):
        blk = Block(dim=D, num_heads=H, mlp_ratio=4.0, drop_path=0.0,
                    attention_impl="auto", dtype=jnp.bfloat16,
                    gelu_tanh=form == "tanh")
        params = blk.init({"params": jax.random.PRNGKey(0)}, x,
                          deterministic=True)["params"]

        def loss(p, a, blk=blk):
            return jnp.sum(blk.apply({"params": p}, a,
                                     deterministic=True).astype(jnp.float32) ** 2)

        steps[form] = (jax.jit(jax.grad(loss)), params)

    res = {}
    for rep in range(3):
        for form, (step, params) in steps.items():
            t = timeit(step, params, x)
            res.setdefault(form, []).append(t)
            print(f"rep{rep} {form}: {t * 1e3:.2f} ms "
                  f"({tot / t / PEAK * 100:.1f}% of peak)", flush=True)

    out = {}
    for form, ts in res.items():
        t = min(ts)
        out[form] = {"ms": round(t * 1e3, 2),
                     "pct_peak": round(tot / t / PEAK * 100, 1)}
    out["tanh_speedup_pct"] = round(
        (1 - min(res["tanh"]) / min(res["erf"])) * 100, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
