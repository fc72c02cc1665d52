"""Capture a jax.profiler trace of the 117M train step on the axon TPU.

Round-3 lead (NOTES.md): the 117M step shows ~65-70% trunk XLA efficiency
plus unexplained per-step overhead — a trace localizes whether it's
per-dispatch RPC gaps, small-op scheduling, or fusion stalls.

Writes a Perfetto trace under /tmp/trace117 and prints the largest device
events if the plugin exposes them.
"""

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import DEFAULT_VARS, OUT_VARS  # noqa: E402


def main():
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    img = (64, 128) if on_tpu else (16, 32)
    embed, depth, heads, batch = (1024, 8, 16, 8) if on_tpu else (64, 2, 2, 2)

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=embed, depth=depth,
        decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=False,
        dtype=dtype, drop_rate=0.1, drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 3, img[0] * 4, img[1] * 4)),
                    dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    opt_state = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)

    key = jax.random.key(1, impl="rbg")
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    print("warm loss", float(loss))

    outdir = "/tmp/trace117"
    os.makedirs(outdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(5):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, x, y, sub)
        print("traced 5 steps, loss", float(loss))
    dt = time.perf_counter() - t0
    print(f"wall for traced region: {dt*1000:.1f} ms ({dt*200:.1f} ms/step)")

    # try to summarize whatever the trace captured
    for p in sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)):
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events = [e for e in data.get("traceEvents", [])
                  if e.get("ph") == "X" and e.get("dur", 0) > 0]
        pids = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "?")
        print(f"\n=== {os.path.basename(p)}: {len(events)} events, "
              f"processes: {sorted(set(pids.values()))}")
        by_name = {}
        for e in events:
            k = (pids.get(e["pid"], "?"), e["name"])
            agg = by_name.setdefault(k, [0, 0.0])
            agg[0] += 1
            agg[1] += e["dur"] / 1e3  # us -> ms
        top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:25]
        for (proc, name), (n, ms) in top:
            print(f"{ms:9.2f} ms  x{n:<5d} [{proc}] {name[:90]}")


if __name__ == "__main__":
    main()
