"""1B single-chip batch/remat sweep (round 3).

Round-2 swept remat flavors at batch 2 (full 45.2% / dots 49.3% / none
53.4% MFU) but never tried batch 4: donation + in-kernel dropout freed
enough HBM that b4 with remat='dots' may fit, and larger batch amortizes
the LN/small-op tax. Each config is measured like bench.py (warmup 3,
readback-synced); OOM/compile failures are caught and recorded.

Run alone (one python process owns the chip):
  nohup python scripts/bench_1b_batch_sweep.py > /tmp/1b_sweep.log 2>&1 &
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
PEAK = 197e12  # v5e bf16


def measure(batch, remat, remat_policy, iters=10):
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    img = (64, 128)
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=3072, depth=8,
        decoder_depth=2, num_heads=24, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=remat,
        remat_policy=remat_policy, dtype=jnp.bfloat16,
        drop_rate=0.1, drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 3, img[0] * 4, img[1] * 4)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1], DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    opt_state = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)

    key = jax.random.key(1, impl="rbg")
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    float(loss)
    float(np.asarray(jax.tree.leaves(params)[0]).ravel()[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    lv = float(loss)
    float(np.asarray(jax.tree.leaves(params)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    tokens = (img[0] // 2) * (img[1] // 2)
    mfu = 6.0 * n_params * tokens * batch / dt / PEAK
    del params, opt_state, x, y
    return dict(batch=batch, remat=remat, policy=remat_policy,
                ms=round(dt * 1e3, 1), mfu=round(mfu, 4),
                samples_s=round(batch / dt, 3), loss=lv)


def main():
    # the axon plugin's chip claim can transiently fail right after another
    # python process exits — retry before measuring (same as bench.py)
    for i in range(6):
        try:
            print("backend:", jax.default_backend(), flush=True)
            break
        except RuntimeError as e:
            print(f"backend retry {i}: {e}", flush=True)
            time.sleep(45)
    results = []
    for batch, remat, policy in [
        (2, False, "full"),     # current bench config (re-measure)
        (4, True, "dots"),      # the untried point
        (3, False, "full"),     # odd batch, may still fit
        (4, False, "full"),     # likely HBM OOM; recorded if so
    ]:
        try:
            r = measure(batch, remat, policy)
        except Exception as e:  # OOM / compile failure
            r = dict(batch=batch, remat=remat, policy=policy,
                     error=f"{type(e).__name__}: {str(e)[:200]}")
        results.append(r)
        print(json.dumps(r), flush=True)
    with open("/tmp/1b_sweep.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
