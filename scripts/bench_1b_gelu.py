"""Does the tanh-GELU win (-4.5% trunk step at 117M, bench_r4_fusion)
transfer to the 1B record config?

At 1B the MLP hidden is 12288 wide, so the erf evaluations are a larger
absolute byte/VPU volume per step than at 117M — but the step is also far
more MXU-bound (55.0% MFU vs 28%), so the relative headroom is smaller.
Measure, don't guess: the record config (b2, no remat, bf16 adam moments)
with gelu_approx exact vs tanh, interleaved repeats, min-of-3.

Run (owns the chip): python scripts/bench_1b_gelu.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_scale  # noqa: E402

CFG = dict(embed=3072, depth=8, heads=24, batch=2, img=(64, 128),
           remat=False, iters=10, mu_dtype="bfloat16", nu_dtype="bfloat16")


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "this probe measures the v5e"
    res = {}
    for rep in range(3):
        for form in ("exact", "tanh"):
            dt, n_params, _ = bench_scale(dtype=jnp.bfloat16,
                                          gelu_approx=form, **CFG)
            res.setdefault(form, []).append(dt)
            print(f"rep{rep} {form}: {dt * 1e3:.1f} ms", flush=True)
    peak = 197e12
    tokens = 32 * 64
    out = {}
    for form, ts in res.items():
        dt = min(ts)
        out[form] = {"ms": round(dt * 1e3, 1),
                     "mfu": round(6.0 * n_params * tokens * 2 / dt / peak, 4)}
    out["tanh_speedup"] = round(min(res["exact"]) / min(res["tanh"]), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
