"""1B-scale single-chip training-step benchmark (interm_1b trunk: embed 3072,
depth 8, heads 24 — reference configs/interm_1b.yaml:39-42).

v5e has 16GB HBM: fp32 params (4GB) + adam moments (8GB) leave ~4GB, so this
runs batch 2 with full remat — the point is a recorded samples/s/chip at 1B
for BASELINE.md's metric, not peak MFU (that needs a v5p pod).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_1b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
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


def main():
    embed, depth, heads, batch, img = 3072, 8, 24, 2, (64, 128)
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=embed, depth=depth,
        decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=True,
        remat_policy="full", dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 3, img[0] * 4, img[1] * 4)),
                    dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B", flush=True)

    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    opt_state = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)

    key = jax.random.key(1, impl="rbg")
    for _ in range(2):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    _ = float(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / iters
    tokens = (img[0] // 2) * (img[1] // 2)
    mfu = 6 * n_params * tokens * batch / dt / 197e12
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip_1b_bf16",
        "value": round(batch / dt, 4), "unit": "samples/s/chip",
        "step_seconds": round(dt, 4), "mfu": round(mfu, 4),
        "params_b": round(n_params / 1e9, 3), "batch": batch,
    }))


if __name__ == "__main__":
    main()
