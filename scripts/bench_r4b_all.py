"""Round-4b consolidated TPU run — ONE chip claim does everything.

Follow-up to the bf16 adam FIRST-moment win (+2.8pt MFU at 1B,
docs/performance.md "bf16 adam first moment"): the SECOND moment is the
other ~1.9GB fp32 tenant. `adam_nu_dtype: bfloat16`
(optim.py::_scale_by_adam_2dtypes — fp32 arithmetic, bf16 storage) frees
it. Cases:

  A. 1B b2 no-remat mu16 (control — reproduce the 223.5 ms / 54.1% record)
  B. 1B b2 no-remat mu16+nu16 — does the second moment's bandwidth/headroom
     move the single-chip record again?
  C. 1B b3 no-remat mu16+nu16 (b3 fit at 52.3% under mu16; more headroom)
  D. 1B b4 no-remat mu16+nu16 (OOM under mu16 — does nu16's 1.9GB unlock it?)
  E. eff-bs32 mb2/acc16 NO-remat mu16+nu16 (the fp32 grad accumulator OOM'd
     every no-remat accum variant; beating 45.0% full-remat needs this)
  F. eff-bs32 mb4/acc8 dots mu16+nu16

Retry contract: exits 7 when the chip claim fails — run under
  until PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_r4b_all.py; do sleep 60; done
Writes $ORBIT2_R4B_OUT (default /tmp/r4b_all.json) as it goes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
PEAK = 197e12
IMG = (64, 128)
RESULTS = []


def record(r):
    RESULTS.append(r)
    print(json.dumps(r), flush=True)
    out = os.environ.get("ORBIT2_R4B_OUT", "/tmp/r4b_all.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)


def measure_1b(tag, batch, remat, policy, mu_dtype, nu_dtype,
               grad_accum=1, iters=None):
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=IMG, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=3072, depth=8,
        decoder_depth=2, num_heads=24, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=remat,
        remat_policy=policy, dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    B = batch * grad_accum
    x = jnp.asarray(rng.normal(size=(B, 7) + IMG), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, 3, IMG[0] * 4, IMG[1] * 4)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1], DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5,
                                  "mu_dtype": mu_dtype, "nu_dtype": nu_dtype})
    opt = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS,
                           OUT_VARS, grad_accum=grad_accum)

    if iters is None:
        iters = 3 if grad_accum > 1 else 10
    key = jax.random.key(1, impl="rbg")
    for _ in range(2 if grad_accum > 1 else 3):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x, y, sub)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x, y, sub)
    lv = float(loss)
    dt = (time.perf_counter() - t0) / iters
    tokens = (IMG[0] // 2) * (IMG[1] // 2)
    del params, opt, x, y
    return dict(case=tag, batch=batch, grad_accum=grad_accum, remat=remat,
                policy=policy, mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                ms=round(dt * 1e3, 1),
                mfu=round(6.0 * n * tokens * B / dt / PEAK, 4),
                samples_s=round(B / dt, 3), loss=lv)


def main():
    try:
        print("backend:", jax.default_backend(), flush=True)
    except RuntimeError as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)

    cases = [
        dict(tag="A_b2_noremat_mu16", batch=2, remat=False,
             policy="full", mu_dtype="bfloat16", nu_dtype=None),
        dict(tag="B_b2_noremat_mu16nu16", batch=2, remat=False,
             policy="full", mu_dtype="bfloat16", nu_dtype="bfloat16"),
        dict(tag="C_b3_noremat_mu16nu16", batch=3, remat=False,
             policy="full", mu_dtype="bfloat16", nu_dtype="bfloat16"),
        dict(tag="D_b4_noremat_mu16nu16", batch=4, remat=False,
             policy="full", mu_dtype="bfloat16", nu_dtype="bfloat16"),
        dict(tag="E_mb2_acc16_noremat_mu16nu16", batch=2, grad_accum=16,
             remat=False, policy="full", mu_dtype="bfloat16",
             nu_dtype="bfloat16"),
        dict(tag="F_mb4_acc8_dots_mu16nu16", batch=4, grad_accum=8,
             remat=True, policy="dots", mu_dtype="bfloat16",
             nu_dtype="bfloat16"),
    ]
    for kw in cases:
        try:
            r = measure_1b(**kw)
        except Exception as e:
            r = dict(case=kw["tag"],
                     error=f"{type(e).__name__}: {str(e)[:200]}")
        record(r)
    print("R4B ALL DONE", flush=True)


if __name__ == "__main__":
    main()
