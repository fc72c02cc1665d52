"""The shipped serving table: full ResSlimViT deterministic forward,
bf16 (XLA chain — the round-4 default after the fused-MLP gate was
measured losing, scripts/bench_fusedmlp_gate.py) vs w8a8 int8 trunk
(ops/quant.py), on the real chip.

Methodology: iterations are CHAINED (each input depends on the previous
output) so no dispatch-level overlap or relay-side caching can flatter the
number, and every (case, impl) cell is measured in 3 interleaved repeats —
min and mean both reported (cross-repeat spread on this tunnel was measured
up to ~35% on 1B, so single-shot numbers are not trustworthy).

Exit 7 on chip-claim failure:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_w8a8_serving.py; do sleep 60; done
"""

import dataclasses
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
REPEATS = 3
ITERS = 20


def setup_case(*, embed, depth, heads, batch, img):
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.utils.quantize import quantize_params

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=embed,
        depth=depth, decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto",
        dtype=jnp.bfloat16, drop_rate=0.0, drop_path=0.0,
    )
    qmodel = dataclasses.replace(model, quant="w8a8")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    qparams = jax.device_put(
        quantize_params(qmodel, params, x, DEFAULT_VARS, OUT_VARS))

    def run(m):
        return jax.jit(lambda p, xx: m.apply(
            {"params": p}, xx, DEFAULT_VARS, OUT_VARS, deterministic=True))

    return run(model), params, run(qmodel), qparams, x


def timeit(f, p, x):
    out = f(p, x)
    float(jnp.sum(out.astype(jnp.float32)))  # tunnel-safe sync
    xx = x
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(p, xx)
        # chain: each input depends on the previous output
        xx = xx * (1.0 + 0.0 * jnp.mean(out).astype(xx.dtype))
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS, out


def bench_one(tag, **geom):
    f16, params, f8, qparams, x = setup_case(**geom)
    t16, t8 = [], []
    y16 = y8 = None
    for _ in range(REPEATS):  # interleave impls within each repeat
        dt, y16 = timeit(f16, params, x)
        t16.append(dt)
        dt, y8 = timeit(f8, qparams, x)
        t8.append(dt)
    a, b = (np.asarray(v, np.float32) for v in (y16, y8))
    rel = float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(a) + 1e-9))
    r = dict(case=tag,
             bf16_ms_min=round(min(t16) * 1e3, 2),
             bf16_ms_mean=round(np.mean(t16) * 1e3, 2),
             int8_ms_min=round(min(t8) * 1e3, 2),
             int8_ms_mean=round(np.mean(t8) * 1e3, 2),
             speedup_min=round(min(t16) / min(t8), 3),
             rel_rmse=round(rel, 5), **geom)
    r["img"] = list(r["img"])
    print(json.dumps(r), flush=True)
    return r


def main():
    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)
    print("backend:", backend, flush=True)

    results = [
        # 1B at the shipped serving geometry (2048-token tiles)
        bench_one("1b_fwd_b2_tile2048", embed=3072, depth=8, heads=24,
                  batch=2, img=(64, 128)),
        # 1B big-tile serving (8192 tok/sample)
        bench_one("1b_fwd_b2_tile8192", embed=3072, depth=8, heads=24,
                  batch=2, img=(128, 256)),
        # 117M serving geometry
        bench_one("117m_fwd_b8", embed=1024, depth=8, heads=16, batch=8,
                  img=(64, 128)),
    ]
    with open("/tmp/bench_w8a8_serving.json", "w") as f:
        json.dump(results, f, indent=1)
    print("W8A8 SERVING BENCH DONE", flush=True)


if __name__ == "__main__":
    main()
