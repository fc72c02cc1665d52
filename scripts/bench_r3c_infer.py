"""Round-3c on-chip batch: inference-path throughput + a 117M mu control.

  A. 1B deterministic forward (eval/inference/serving path — the fused-MLP
     kernel is gated ON for deterministic forwards): samples/s + 2NP MFU at
     batch 2/4/8, the north-star-scale serving numbers.
  B. 117M train step with bf16 adam mu — expected ~neutral (optimizer state
     is only ~1.3GB at 117M), recorded to complete the mu story.

One chip claim runs everything. Exit 7 on claim failure:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_r3c_infer.py; do sleep 60; done
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
PEAK = 197e12
IMG = (64, 128)
RESULTS = []


def record(r):
    RESULTS.append(r)
    print(json.dumps(r), flush=True)
    with open("/tmp/r3c_infer.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def build(embed, depth, heads):
    from orbit2_tpu.models import ResSlimViT

    return ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=IMG, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=embed, depth=depth,
        decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto",
        dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1)


def eval_throughput(tag, embed, depth, heads, batch, iters=20):
    model = build(embed, depth, heads)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + IMG), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1], DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    fwd = jax.jit(lambda p, xb: model.apply(
        {"params": p}, xb, DEFAULT_VARS, OUT_VARS, deterministic=True))
    out = fwd(params, x)
    float(jnp.mean(out.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.mean(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    tokens = (IMG[0] // 2) * (IMG[1] // 2)
    del params, x, out
    return dict(case=tag, batch=batch, ms=round(dt * 1e3, 2),
                samples_s=round(batch / dt, 2),
                mfu_2np=round(2.0 * n * tokens * batch / dt / PEAK, 4),
                params_m=round(n / 1e6, 2))


def train_117m_mu(tag, mu_dtype, batch=8, iters=20):
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    model = build(1024, 8, 16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + IMG), jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 3, IMG[0] * 4, IMG[1] * 4)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1], DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5,
                                  "mu_dtype": mu_dtype})
    opt = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS,
                           OUT_VARS)
    key = jax.random.key(1, impl="rbg")
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x, y, sub)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x, y, sub)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    tokens = (IMG[0] // 2) * (IMG[1] // 2)
    del params, opt, x, y
    return dict(case=tag, mu_dtype=str(mu_dtype), ms=round(dt * 1e3, 1),
                samples_s=round(batch / dt, 2),
                mfu=round(6.0 * n * tokens * batch / dt / PEAK, 4))


def main():
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)

    import gc

    for tag, kw in [
        ("A_eval_1b_b2", dict(embed=3072, depth=8, heads=24, batch=2)),
        ("A_eval_1b_b4", dict(embed=3072, depth=8, heads=24, batch=4)),
        ("A_eval_1b_b8", dict(embed=3072, depth=8, heads=24, batch=8)),
        ("A_eval_117m_b8", dict(embed=1024, depth=8, heads=16, batch=8)),
    ]:
        try:
            record(eval_throughput(tag, **kw))
        except Exception as e:
            record(dict(case=tag, error=f"{type(e).__name__}: {str(e)[:200]}"))
        gc.collect()

    for tag, mu in [("B_117m_train_mu_bf16", "bfloat16")]:
        try:
            record(train_117m_mu(tag, mu))
        except Exception as e:
            record(dict(case=tag, error=f"{type(e).__name__}: {str(e)[:200]}"))
        gc.collect()
    print("R3C DONE", flush=True)


if __name__ == "__main__":
    main()
