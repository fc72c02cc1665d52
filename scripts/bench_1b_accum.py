"""The reference's interm_1b trains at GLOBAL batch 32 over 128 ranks
(configs/interm_1b.yaml). This measures that effective batch on ONE chip:
grad_accum=16 x microbatch 2, remat=dots, bf16 adam first moment — the
whole reference workload unit, single v5e. Run alone (owns the chip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import DEFAULT_VARS, OUT_VARS

PEAK = 197e12


def main():
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    accum, mb, img = 16, 2, (64, 128)
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=3072, depth=8,
        decoder_depth=2, num_heads=24, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=True,
        remat_policy="full", dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    B = accum * mb
    x = jnp.asarray(rng.normal(size=(B, 7) + img), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, 3, img[0] * 4, img[1] * 4)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:2], DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5,
                                  "mu_dtype": "bfloat16"})
    opt = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS,
                           OUT_VARS, grad_accum=accum)

    key = jax.random.key(1, impl="rbg")
    for _ in range(2):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x, y, sub)
    _ = float(loss)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x, y, sub)
    final = float(loss)
    dt = (time.perf_counter() - t0) / iters
    tokens = (img[0] // 2) * (img[1] // 2)
    mfu = 6.0 * n * tokens * B / dt / PEAK
    print(f"1B effective-bs{B} (accum {accum} x mb {mb}): {dt*1e3:.0f} ms/update, "
          f"{B/dt:.2f} samples/s/chip, {mfu*100:.1f}% MFU, loss={final:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
