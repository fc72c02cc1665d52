"""Where does the fused-MLP pallas kernel actually win the deterministic
forward? (round-4 gate measurement)

The w8a8 serving bench's ablation (scripts/bench_w8a8_serving.py,
/tmp/bench_w8a8_serving.json) found the bf16 1B serving forward runs 87.0 ms
WITHOUT the fused-MLP kernel vs 167.7 ms with it — the r3 gate ("fused on
for deterministic forwards") was measured at 117M shapes only and badly
loses at 1B (D=3072, F=12288: the [bt, F] hidden stripe exceeds useful VMEM
tiling, so the kernel runs tiny blocks while XLA pipelines the two matmuls).

This script measures the SAME chained-iteration methodology with the kernel
forced on/off across model scales to set a shape gate in ops/fused_mlp.py.

Exit 7 on chip-claim failure:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fusedmlp_gate.py; do sleep 60; done
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]


def build(embed, depth, heads, img):
    from orbit2_tpu.models import ResSlimViT
    return ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=embed,
        depth=depth, decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto",
        dtype=jnp.bfloat16, drop_rate=0.0, drop_path=0.0,
    )


def bench_one(tag, *, embed, depth, heads, batch, img, fused, iters=20):
    import orbit2_tpu.ops.fused_mlp as fm
    if not hasattr(fm, "_orig_fused_mlp"):
        fm._orig_fused_mlp = fm.fused_mlp
    fm.fused_mlp = fm._orig_fused_mlp if fused else (lambda *a, **k: None)

    model = build(embed, depth, heads, img)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    f = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, DEFAULT_VARS, OUT_VARS, deterministic=True))
    out = f(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    xx = x
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, xx)
        xx = xx * (1.0 + 0.0 * jnp.mean(out).astype(xx.dtype))
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    r = dict(case=tag, fused=fused, ms=round(dt * 1e3, 2),
             embed=embed, batch=batch, img=list(img))
    print(json.dumps(r), flush=True)
    del params, x, out
    return r


def main():
    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)
    print("backend:", backend, flush=True)

    results = []
    for fused in (True, False):
        results.append(bench_one("117m_fwd_b8", embed=1024, depth=8, heads=16,
                                 batch=8, img=(64, 128), fused=fused))
    for fused in (True, False):
        results.append(bench_one("470m_fwd_b4", embed=2048, depth=8, heads=16,
                                 batch=4, img=(64, 128), fused=fused))
    # 1B already measured in bench_w8a8_serving (167.7 vs 87.0) — re-run the
    # no-fused case only as a cross-check
    results.append(bench_one("1b_fwd_b2", embed=3072, depth=8, heads=24,
                             batch=2, img=(64, 128), fused=False))
    with open("/tmp/bench_fusedmlp_gate.json", "w") as f:
        json.dump(results, f, indent=1)
    print("FUSEDMLP GATE BENCH DONE", flush=True)


if __name__ == "__main__":
    main()
