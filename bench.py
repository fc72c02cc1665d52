"""Benchmark: training-step throughput of the flagship ResSlimViT on the
available accelerator.

Measures end-to-end jitted train steps (fwd + bayesian_tv loss + grad +
adamw) at 117M scale (embed 1024, depth 8, heads 16 — reference
configs/interm_117m.yaml:39-42) in bf16, and reports samples/sec/chip plus
model FLOPs utilization. The reference repo publishes no numbers
(BASELINE.md), so vs_baseline is measured against the self-defined north
star of 45% MFU (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
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

# peak bf16 TFLOPs per chip (dense)
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6e": 918.0,
    "TPU v6 lite": 918.0,
    "cpu": 0.5,
}


def peak_tflops() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for name, val in PEAK_TFLOPS.items():
        if name.lower() in str(kind).lower():
            return val
    return 197.0


def _backend_with_retry(attempts: int = 4, delay: float = 45.0) -> str:
    """The axon TPU plugin's claim can transiently fail if another process
    held the chip recently; retry before giving up to CPU."""
    for i in range(attempts):
        try:
            return jax.default_backend()
        except RuntimeError:
            if i == attempts - 1:
                raise
            time.sleep(delay)
    return "cpu"


def main():
    on_tpu = _backend_with_retry() == "tpu"
    # 117M-scale trunk; tile-sized input 64x128 -> 2048 tokens at patch 2
    if on_tpu:
        embed, depth, heads, batch, img = 1024, 8, 16, 8, (64, 128)
    else:  # CPU smoke fallback so the harness never hard-fails
        embed, depth, heads, batch, img = 128, 2, 4, 2, (16, 32)

    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=embed, depth=depth,
        decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=False,
        dtype=dtype, drop_rate=0.1, drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), dtype=jnp.float32)
    y = jnp.asarray(
        rng.normal(size=(batch, 3, img[0] * 4, img[1] * 4)), dtype=jnp.float32
    )

    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    opt_state = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)

    def sync(loss, params):
        # host readback forces the whole dependency chain to execute.
        # NB: jax.block_until_ready is NOT sufficient on the axon TPU
        # tunnel (returns immediately); a device->host copy is.
        l = float(loss)
        p = float(np.asarray(jax.tree.leaves(params)[0]).ravel()[0])
        return l, p

    key = jax.random.key(1, impl="rbg")  # fast bulk dropout bits on TPU
    # warmup / compile
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    sync(loss, params)

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    sync(loss, params)
    dt = (time.perf_counter() - t0) / iters

    samples_per_sec = batch / dt
    tokens = (img[0] // 2) * (img[1] // 2)
    # fwd+bwd ~ 6 * params * tokens per sample for the ViT trunk (BASELINE.md)
    flops_per_step = 6.0 * n_params * tokens * batch
    mfu = flops_per_step / dt / (peak_tflops() * 1e12)

    result = {
        "metric": "train_samples_per_sec_per_chip_117m_bf16",
        "value": round(samples_per_sec, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(mfu / 0.45, 4),
        "mfu": round(mfu, 4),
        "step_seconds": round(dt, 5),
        "params_m": round(n_params / 1e6, 2),
        "tokens_per_sample": tokens,
        "backend": jax.default_backend(),
        "device": str(getattr(jax.devices()[0], "device_kind", "cpu")),
        "loss": float(loss),
        # recorded on this chip by scripts/bench_1b.py (0.97B params, b2,
        # full remat): kept here so the round record carries both scales
        "recorded_1b_samples_per_sec": 6.8133,
        "recorded_1b_mfu": 0.4122,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
