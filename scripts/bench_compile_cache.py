#!/usr/bin/env python
"""Measure the persistent compilation cache's cold->warm win on the real
backend. Run TWICE in fresh interpreters (the cache is cross-process by
design — that's the whole point):

    rm -rf /tmp/o2_compile_cache
    python scripts/bench_compile_cache.py   # cold: compiles + persists
    python scripts/bench_compile_cache.py   # warm: loads the executable

Prints one JSON line with the wall seconds spent in ``.compile()`` of the
117M train step at the bench shape (AOT, abstract args — no buffers
materialized, so the number is pure compile path). The reference has no
analogue (torch eager pays no compile cost); here cold 1B compiles cost
minutes over the remote-compile relay, so this is the difference between
"minutes to first step" and "seconds" on every re-run of a known config.
Results recorded in docs/usage.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from orbit2_tpu.utils.compile_cache import enable_compilation_cache

CACHE_DIR = os.environ.get("O2_CACHE_DIR", "/tmp/o2_compile_cache")

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]


def main():
    pre_entries = (len(os.listdir(CACHE_DIR))
                   if os.path.isdir(CACHE_DIR) else 0)
    ok = enable_compilation_cache(CACHE_DIR)

    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    batch, img = 6, (32, 64)
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=1024,
        depth=8, decoder_depth=2, num_heads=16, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=False,
        dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1)

    def init_fn(r):
        return model.init({"params": r},
                          jnp.zeros((2, 7) + img, jnp.float32),
                          DEFAULT_VARS, OUT_VARS, deterministic=True)["params"]

    abstract_params = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    abstract_opt = jax.eval_shape(tx.init, abstract_params)
    loss = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss, None, tx, DEFAULT_VARS, OUT_VARS)

    x = jax.ShapeDtypeStruct((batch, 7) + img, jnp.float32)
    y = jax.ShapeDtypeStruct((batch, 3, img[0] * 4, img[1] * 4), jnp.float32)
    rng = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    t0 = time.time()
    step.lower(abstract_params, abstract_opt, x, y, rng).compile()
    compile_s = time.time() - t0
    post_entries = (len(os.listdir(CACHE_DIR))
                    if os.path.isdir(CACHE_DIR) else 0)
    print(json.dumps({
        "backend": jax.default_backend(),
        "cache_enabled": bool(ok),
        "cache_dir": CACHE_DIR,
        "compile_seconds": round(compile_s, 2),
        "cache_entries_before": pre_entries,
        "cache_entries_after": post_entries,
        "phase": "warm" if pre_entries else "cold",
    }))


if __name__ == "__main__":
    main()
