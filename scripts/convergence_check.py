"""End-to-end learning check: train the flagship on a *learnable* synthetic
super-resolution task (high-res = smooth field, low-res = its 4x down-mean)
and verify the model beats the bicubic-interpolation baseline RMSE — evidence
the whole pipeline (data -> model -> loss -> optimizer) actually learns, not
just runs.

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/convergence_check.py
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
from orbit2_tpu.training.optim import (
    linear_warmup_cosine_annealing,
    make_optimizer,
    set_learning_rate,
)
from orbit2_tpu.training.train import make_train_step

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "2m_temperature_min",
)
OUT_VARS = ("2m_temperature_min",)
H, W, MAG, B = 32, 64, 4, 32


def smooth_field(rng, h, w, n):
    """Band-limited random fields: low-res fully determines high-res."""
    k = rng.normal(size=(n, h // 4, w // 4)).astype(np.float32)
    up = jax.image.resize(jnp.asarray(k), (n, h, w), method="bicubic")
    return np.asarray(up)


def make_batch(rng, n):
    hi = smooth_field(rng, H * MAG, W * MAG, n)  # target field
    lo = hi.reshape(n, H, MAG, W, MAG).mean(axis=(2, 4))  # 4x down-mean
    # static channels
    x = np.zeros((n, len(DEFAULT_VARS), H, W), np.float32)
    x[:, 0] = 1.0  # land_sea_mask
    x[:, 1] = 0.5  # orography
    x[:, 2] = np.linspace(-1, 1, H)[None, :, None]  # lattitude
    x[:, 3] = 0.0  # landcover
    x[:, 4] = lo
    y = hi[:, None]
    return jnp.asarray(x), jnp.asarray(y)


SCALES = {
    # embed, depth, heads, batch, lr, steps
    "8m": (256, 6, 4, 32, 2e-3, 300),
    "117m": (1024, 8, 16, 8, 1e-3, 800),
}


def main(drop=0.0, mu_dtype=None, nu_dtype=None, scale="8m",
         gelu_approx="exact"):
    embed, depth, heads, batch, lr, steps = SCALES[scale]
    print(f"== scale {scale} dropout {drop} mu_dtype {mu_dtype or 'float32'}"
          f" nu_dtype {nu_dtype or 'float32'} gelu {gelu_approx} ==",
          flush=True)
    global B
    B = batch
    rng = np.random.default_rng(0)
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=(H, W), in_channels=5,
        out_channels=1, superres_mag=MAG, patch_size=2, embed_dim=embed,
        depth=depth, decoder_depth=4, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto",
        gelu_approx=gelu_approx,
        dtype=jnp.bfloat16, drop_rate=drop, drop_path=drop)
    x0, y0 = make_batch(rng, B)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    tx = make_optimizer("adamw", {"lr": lr, "weight_decay": 1e-5,
                                  "betas": (0.9, 0.99),
                                  "mu_dtype": mu_dtype,
                                  "nu_dtype": nu_dtype})
    opt = tx.init(params)
    sched = linear_warmup_cosine_annealing(lr, 20, steps, 1e-7, 1e-8)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)

    # fixed eval set + baseline
    xe, ye = make_batch(np.random.default_rng(999), B)
    bicubic = jax.image.resize(
        xe[:, 4:5], (B, 1, H * MAG, W * MAG), method="bicubic")
    base_rmse = float(jnp.sqrt(jnp.mean((bicubic - ye) ** 2)))

    fwd = jax.jit(lambda p, xb: model.apply({"params": p}, xb, DEFAULT_VARS,
                                            OUT_VARS, deterministic=True))
    key = jax.random.key(7, impl="rbg")
    t0 = time.perf_counter()
    for i in range(steps):
        opt = set_learning_rate(opt, sched(i))
        xb, yb = make_batch(rng, B)
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, xb, yb, sub)
        if i % 50 == 0 or i == steps - 1:
            pred = fwd(params, xe).astype(jnp.float32)
            rmse = float(jnp.sqrt(jnp.mean((pred - ye) ** 2)))
            print(f"step {i:4d}: train_loss={float(loss):.5f}  "
                  f"eval_rmse={rmse:.5f}  (bicubic baseline {base_rmse:.5f})",
                  flush=True)
    dt = time.perf_counter() - t0
    final = rmse
    print(f"\ntrained {steps} steps in {dt:.0f}s; final RMSE {final:.5f} vs "
          f"bicubic {base_rmse:.5f} -> "
          f"{'BEATS baseline' if final < base_rmse else 'DOES NOT BEAT baseline'}",
          flush=True)
    assert final < base_rmse, "model failed to beat the interpolation baseline"


if __name__ == "__main__":
    import sys

    # --dropout: train through the full production stochastic path (pallas
    # in-kernel attention dropout + fused elementwise dropout + drop-path)
    # --mu-bf16: bf16 adam first moment, the shipped interm_1b default —
    # verifies the optimizer-state compression doesn't hurt convergence
    # --nu-bf16: bf16 adam SECOND moment (optim.py::_scale_by_adam_2dtypes)
    # --scale 117m: the bench-shape model (embed 1024 x depth 8), 800 steps
    scale = "8m"
    if "--scale" in sys.argv:
        idx = sys.argv.index("--scale")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1] not in SCALES:
            raise SystemExit(f"--scale needs one of {sorted(SCALES)}")
        scale = sys.argv[idx + 1]
    # --gelu-tanh: the tanh-approx GELU shipped in configs/interm_1b.yaml
    # (measured -4.5% step time at 117M AND 1B) — verifies the approximation
    # doesn't hurt convergence
    main(drop=0.1 if "--dropout" in sys.argv else 0.0,
         mu_dtype="bfloat16" if "--mu-bf16" in sys.argv else None,
         nu_dtype="bfloat16" if "--nu-bf16" in sys.argv else None,
         gelu_approx="tanh" if "--gelu-tanh" in sys.argv else "exact",
         scale=scale)
