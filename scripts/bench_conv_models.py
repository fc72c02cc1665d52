"""On-chip throughput of the convolutional hub models (Unet / ResNet).

The reference's fine-tune driver offers resnet/unet alongside res_slimvit
(era5_daymet_downscaling.py:204-216); this grounds their TPU port with
measured PRODUCTION train steps (make_train_step with batch_stats threaded
via aux_collections, mse loss, adamw, bf16). Run alone (owns the chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

VARS = ("a", "b", "c", "d", "e", "f", "g")
OUT = ("e", "f", "g")


def bench(name, model, batch, img):
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, len(VARS)) + img), jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, len(OUT)) + img), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, VARS, OUT,
                           deterministic=True)
    params = variables["params"]
    aux = {k: v for k, v in variables.items() if k != "params"}
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 0.0})
    opt = tx.init(params)
    loss_metric = METRICS_REGISTRY["mse"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, VARS, OUT,
                           aux_collections=tuple(sorted(aux)))

    key = jax.random.key(0, impl="rbg")
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, aux, opt, l = step(params, aux, opt, x, y, sub)
    _ = float(l)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, aux, opt, l = step(params, aux, opt, x, y, sub)
    final = float(l)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:8s} {n/1e6:6.1f}M params  {dt*1e3:7.2f} ms/step  "
          f"{batch/dt:7.1f} samples/s/chip  loss={final:.4f}", flush=True)


def main():
    from orbit2_tpu.models.resnet import ResNet
    from orbit2_tpu.models.unet import Unet

    on_tpu = jax.default_backend() == "tpu"
    # the conv models run at the TARGET grid (interpolation-first wrappers);
    # 256x512 is the 64x128-tile x4 superres shape
    img = (256, 512) if on_tpu else (16, 32)
    batch = 8 if on_tpu else 2
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    bench("resnet", ResNet(in_channels=len(VARS), out_channels=len(OUT),
                           dtype=dtype), batch, img)
    bench("unet", Unet(in_channels=len(VARS), out_channels=len(OUT),
                       dtype=dtype), batch, img)


if __name__ == "__main__":
    main()
