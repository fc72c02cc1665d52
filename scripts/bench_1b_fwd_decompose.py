"""Where the 1B deterministic FORWARD (serving path) spends its time.

The serving sweep (bench_r3c_infer.py) measured 133.4ms at batch 2 — ~30%
2NP MFU, batch-flat. Ablate by construction: depth 0/8 isolates the trunk,
decoder_depth 0/2 the MLP head, attention_impl the kernel choice. Informs
NOTES.md round-4 lead 5 (is the fwd gap trunk-fusion or head-shaped?).

Exit 7 on claim failure:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_1b_fwd_decompose.py; do sleep 60; done
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
IMG = (64, 128)
BATCH = 2
PEAK = 197e12


def measure(tag, depth, decoder_depth, attention_impl, iters=20):
    from orbit2_tpu.models import ResSlimViT

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=IMG, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=3072, depth=depth,
        decoder_depth=decoder_depth, num_heads=24, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl=attention_impl,
        dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, 7) + IMG), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1], DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    fwd = jax.jit(lambda p, xb: model.apply(
        {"params": p}, xb, DEFAULT_VARS, OUT_VARS, deterministic=True))
    out = fwd(params, x)
    float(jnp.mean(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.mean(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    tokens = (IMG[0] // 2) * (IMG[1] // 2)
    del params, x, out
    return dict(case=tag, depth=depth, decoder_depth=decoder_depth,
                attn=attention_impl, ms=round(dt * 1e3, 2),
                mfu_2np=round(2.0 * n * tokens * BATCH / dt / PEAK, 4),
                params_m=round(n / 1e6, 1))


def main():
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)

    import gc

    results = []
    for tag, d, dd, attn in [
        ("full_auto", 8, 2, "auto"),
        ("trunkless", 0, 2, "auto"),       # embed+var-agg+head+unpatchify+conv
        ("headless", 8, 0, "auto"),        # decoder hidden layers removed
        ("full_xla_attn", 8, 2, "xla"),    # attention kernel share
    ]:
        try:
            r = measure(tag, d, dd, attn)
        except Exception as e:
            r = dict(case=tag, error=f"{type(e).__name__}: {str(e)[:200]}")
        results.append(r)
        print(json.dumps(r), flush=True)
        gc.collect()
    with open("/tmp/1b_fwd_decompose.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DECOMPOSE DONE", flush=True)


if __name__ == "__main__":
    main()
