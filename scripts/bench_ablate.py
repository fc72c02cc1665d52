"""MFU ablation harness: times the 117M train step under different knobs
(dropout, remat, attention impl, dtype) to locate where the step time goes.
Run on the real chip: python scripts/bench_ablate.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.registry import METRICS_REGISTRY
import orbit2_tpu.metrics.metrics  # noqa: F401
from orbit2_tpu.training.optim import make_optimizer
from orbit2_tpu.training.train import make_train_step

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]


def run_case(name, *, drop=0.1, remat=True, attn="auto", dtype=jnp.bfloat16,
             embed=1024, depth=8, heads=16, batch=8, img=(64, 128), iters=10,
             fwd_only=False, rng_impl=None, remat_policy="full"):
    try:
        _run_case(name, drop=drop, remat=remat, attn=attn, dtype=dtype,
                  embed=embed, depth=depth, heads=heads, batch=batch, img=img,
                  iters=iters, fwd_only=fwd_only, rng_impl=rng_impl,
                  remat_policy=remat_policy)
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


def _run_case(name, *, drop, remat, attn, dtype, embed, depth, heads, batch,
              img, iters, fwd_only, rng_impl=None, remat_policy="full"):
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=embed, depth=depth,
        decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl=attn, remat=remat,
        remat_policy=remat_policy,
        dtype=dtype, drop_rate=drop, drop_path=drop)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 3, img[0] * 4, img[1] * 4)),
                    dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    if fwd_only:
        fwd = jax.jit(lambda p, xb: model.apply(
            {"params": p}, xb, DEFAULT_VARS, OUT_VARS, deterministic=True))
        out = fwd(params, x)
        _ = float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x)
        _ = float(out.ravel()[0])
        dt = (time.perf_counter() - t0) / iters
    else:
        tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
        opt_state = tx.init(params)
        loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
        step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS,
                               OUT_VARS)
        key = (jax.random.key(1, impl=rng_impl) if rng_impl
               else jax.random.PRNGKey(1))
        for _ in range(2):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, x, y, sub)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, x, y, sub)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / iters

    tokens = (img[0] // 2) * (img[1] // 2)
    mult = 2 if fwd_only else 6
    flops = mult * n_params * tokens * batch
    mfu = flops / dt / 197e12
    print(f"{name:34s} {dt*1e3:8.1f} ms/step  {batch/dt:7.2f} samp/s  "
          f"MFU~{mfu*100:5.1f}%", flush=True)
    return dt


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    run_case("base (remat, drop0.1, auto)")
    run_case("no dropout", drop=0.0)
    run_case("rbg dropout rng", rng_impl="rbg")
    run_case("no remat b4", remat=False, batch=4)
    run_case("no remat, no dropout b4", remat=False, drop=0.0, batch=4)
    run_case("attn=xla", attn="xla")
    run_case("fwd only (deterministic)", fwd_only=True)
