"""1B single-chip sweep: no-remat batch 3/4 with bf16 AdamW first moments.

Round-3 found b2/no-remat optimal at 51.3% MFU; b3/b4 no-remat OOM'd with
fp32 optimizer state. adam_mu_dtype=bfloat16 (config knob, optim.py:47-55)
halves the first moment (~1.95 GB at 0.97B params) — b3 no-remat may now
fit, and larger batch amortizes the LN/small-op tax. fp32 master params and
fp32 nu are retained, so this stays an OPT-IN config if it wins (numerics
differ slightly from the reference's fp32 optimizer state).

Run alone (one python process owns the chip), from /root/repo with
/root/.axon_site kept on PYTHONPATH:
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_1b_mu_bf16.py; do sleep 60; done
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


def measure(batch, remat, remat_policy, mu_dtype, iters=10):
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
    tx = make_optimizer(
        "adamw", {"lr": 1e-4, "weight_decay": 1e-5, "mu_dtype": mu_dtype})
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
                mu_dtype=str(mu_dtype), ms=round(dt * 1e3, 1),
                mfu=round(mfu, 4), samples_s=round(batch / dt, 3), loss=lv)


def main():
    # the chip lease from the previous holder can take 10+ min to release,
    # and xla_bridge CACHES a failed plugin init within the process — an
    # in-process retry loop never recovers. Exit 7 so a shell loop can
    # retry in a fresh interpreter:
    #   until python scripts/bench_1b_mu_bf16.py; do sleep 60; done
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)
    results = []
    for batch, remat, policy, mu in [
        (3, False, "full", "bfloat16"),  # the open lead
        (4, False, "full", "bfloat16"),  # stretch; recorded if OOM
        (2, False, "full", "bfloat16"),  # does bf16 mu help/hurt at b2?
    ]:
        try:
            r = measure(batch, remat, policy, mu)
        except Exception as e:  # OOM / compile failure
            r = dict(batch=batch, remat=remat, policy=policy, mu_dtype=mu,
                     error=f"{type(e).__name__}: {str(e)[:200]}")
        results.append(r)
        print(json.dumps(r), flush=True)
    with open("/tmp/1b_mu.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
