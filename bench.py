"""Benchmark: training-step throughput of the flagship ResSlimViT on the
available accelerator.

Measures end-to-end jitted train steps (fwd + bayesian_tv loss + grad +
adamw) in bf16 at TWO scales:
  * 117M (embed 1024, depth 8, heads 16 — reference configs/interm_117m.yaml)
  * 0.97B (embed 3072, depth 8, heads 24 — configs/interm_1b.yaml trunk),
    batch 2 + full remat so fp32 master params + adam moments fit one chip.
The reference repo publishes no numbers (BASELINE.md), so vs_baseline is
measured against the self-defined north star of 45% MFU (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
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


def _backend_with_retry(attempts: int = 30, delay: float = 60.0) -> str:
    """The axon TPU plugin's chip claim fails while a previous holder's
    lease lingers (10-30 min observed), and xla_bridge CACHES the failed
    plugin init within the process — an in-process retry can never recover.
    Retry by re-exec'ing this script in a fresh interpreter (same PID and
    stdout, so the driver that invoked us sees one process and one JSON
    line); an env counter bounds the recursion."""
    try:
        return jax.default_backend()
    except RuntimeError:
        import sys

        attempt = int(os.environ.get("ORBIT2_BENCH_CLAIM_ATTEMPT", "0"))
        if attempt >= attempts:
            raise
        print(f"chip claim failed (attempt {attempt}); re-exec in {delay:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(delay)
        env = dict(os.environ)
        env["ORBIT2_BENCH_CLAIM_ATTEMPT"] = str(attempt + 1)
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
                  env)


def bench_scale(*, embed, depth, heads, batch, img, remat, dtype, iters,
                decoder_depth=2, mu_dtype=None, nu_dtype=None,
                gelu_approx="exact"):
    """One measured config; returns (dt_seconds, n_params, loss)."""
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=embed, depth=depth,
        decoder_depth=decoder_depth, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=remat,
        dtype=dtype, drop_rate=0.1, drop_path=0.1, gelu_approx=gelu_approx,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 7) + img), dtype=jnp.float32)
    y = jnp.asarray(
        rng.normal(size=(batch, 3, img[0] * 4, img[1] * 4)), dtype=jnp.float32
    )

    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5,
                                  "mu_dtype": mu_dtype, "nu_dtype": nu_dtype})
    opt_state = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)

    def sync(loss, params):
        # host readback forces the whole dependency chain to execute.
        # NB: jax.block_until_ready is NOT sufficient on the axon TPU
        # tunnel (returns immediately); a device->host copy is.
        l = float(loss)
        float(np.asarray(jax.tree.leaves(params)[0]).ravel()[0])
        return l

    key = jax.random.key(1, impl="rbg")  # fast bulk dropout bits on TPU
    for _ in range(3):  # warmup / compile
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    sync(loss, params)

    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    final_loss = sync(loss, params)
    dt = (time.perf_counter() - t0) / iters
    # release device buffers before the next scale runs
    del params, opt_state, x, y
    import gc

    gc.collect()
    return dt, n_params, final_loss


def bench_serving_1b(dtype, iters=12, repeats=3):
    """Deterministic 1B forward at the shipped serving geometry (b2 x
    2048-token tiles), bf16 vs the w8a8 int8 trunk (ops/quant.py).
    Iterations are CHAINED (each input depends on the previous output) so
    dispatch overlap cannot flatter the number — the methodology that
    exposed the round-3 fused-MLP gate artifact
    (scripts/bench_fusedmlp_gate.py). Min of `repeats` interleaved repeats:
    the FIRST post-compile repeat of the bf16 forward runs ~2.7x slow
    (235 vs 87 ms/iter, reproduced across fresh processes) before settling
    — a warm-up of the axon path, not sustained throughput; w8a8 is steady
    from the first repeat."""
    import dataclasses

    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.utils.quantize import quantize_params

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=(64, 128), in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=3072,
        depth=8, decoder_depth=2, num_heads=24, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", dtype=dtype,
        drop_rate=0.0, drop_path=0.0,
    )
    qmodel = dataclasses.replace(model, quant="w8a8")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 7, 64, 128)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    qparams = jax.device_put(
        quantize_params(qmodel, params, x, DEFAULT_VARS, OUT_VARS))

    def make(m):
        return jax.jit(lambda pp, xx: m.apply(
            {"params": pp}, xx, DEFAULT_VARS, OUT_VARS, deterministic=True))

    def timeit(f, p):
        out = f(p, x)
        float(jnp.sum(out.astype(jnp.float32)))  # tunnel-safe sync
        xx = x
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(p, xx)
            xx = xx * (1.0 + 0.0 * jnp.mean(out).astype(xx.dtype))
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    f16, f8 = make(model), make(qmodel)
    t16, t8 = [], []
    for _ in range(repeats):  # interleave impls within each repeat
        t16.append(timeit(f16, params))
        t8.append(timeit(f8, qparams))
    del params, qparams, x
    import gc

    gc.collect()
    return min(t16), min(t8)


def main():
    on_tpu = _backend_with_retry() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    peak = peak_tflops() * 1e12

    # 117M-scale trunk; tile-sized input 64x128 -> 2048 tokens at patch 2
    if on_tpu:
        cfg117 = dict(embed=1024, depth=8, heads=16, batch=8, img=(64, 128),
                      remat=False, iters=20)
    else:  # CPU smoke fallback so the harness never hard-fails
        cfg117 = dict(embed=128, depth=2, heads=4, batch=2, img=(16, 32),
                      remat=False, iters=3)

    # bf16 adam first moment, the shipped config default (configs/*.yaml
    # adam_mu_dtype; measured 197.4 -> 194.4 ms at 117M, +2.8pt MFU at 1B)
    dt, n_params, loss = bench_scale(dtype=dtype, mu_dtype="bfloat16",
                                     **cfg117)
    batch, img = cfg117["batch"], cfg117["img"]
    tokens = (img[0] // 2) * (img[1] // 2)
    # fwd+bwd ~ 6 * params * tokens per sample for the ViT trunk (BASELINE.md)
    mfu = 6.0 * n_params * tokens * batch / dt / peak
    # PaLM-style accounting also credits the attention matmuls
    # (12 * depth * N^2 * D fwd+bwd) — at 2048 tokens/d=64 they are ~31% extra
    # work the 6NP metric ignores (docs/performance.md "attention tax")
    attn_flops = 12.0 * cfg117["depth"] * batch * tokens * tokens * cfg117["embed"]
    mfu_attn = (6.0 * n_params * tokens * batch + attn_flops) / dt / peak

    result = {
        "metric": "train_samples_per_sec_per_chip_117m_bf16",
        "value": round(batch / dt, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(mfu / 0.45, 4),
        "mfu": round(mfu, 4),
        "mfu_incl_attention": round(mfu_attn, 4),
        "step_seconds": round(dt, 5),
        "params_m": round(n_params / 1e6, 2),
        "tokens_per_sample": tokens,
        "backend": jax.default_backend(),
        "device": str(getattr(jax.devices()[0], "device_kind", "cpu")),
        "loss": float(loss),
    }

    if on_tpu:
        # Serving first (the deterministic 1B forward, bf16 vs w8a8 int8
        # trunk — evaluate.py --quant w8a8): BEFORE the 1B training bench,
        # whose ~12GB of fp32 master+adam buffers leave enough HBM residue
        # to triple the bf16 forward's time if it runs after (measured:
        # 87 ms solo vs 253 ms after the train benches).
        try:
            s16, s8 = bench_serving_1b(dtype)
            result.update({
                "serving_1b_bf16_ms": round(s16 * 1e3, 2),
                "serving_1b_bf16_fields_per_sec": round(2 / s16, 2),
                "serving_1b_w8a8_ms": round(s8 * 1e3, 2),
                "serving_1b_w8a8_fields_per_sec": round(2 / s8, 2),
                "serving_1b_w8a8_speedup": round(s16 / s8, 3),
            })
        except Exception as e:
            result["serving_error"] = f"{type(e).__name__}: {str(e)[:200]}"

        # 0.97B single-chip — measured, not recorded. No remat: the
        # fused in-kernel dropout removed the mask residuals, so b2 fits HBM
        # (r2 sweep: remat-full 45.2%, dots 49.3%, none 53.4% MFU). bf16
        # adam moments (configs/interm_1b.yaml adam_mu_dtype+adam_nu_dtype):
        # less optimizer HBM traffic, measured +2.8pt MFU from mu (r3b) and
        # a further +4pt from nu (r4b sweep, 237.7->219.9 ms in-process);
        # fp32 master params retained, moment ARITHMETIC stays fp32.
        # tanh GELU = the shipped interm_1b gelu_approx (a further -4.4%,
        # 225.2 -> 215.3 ms min-of-3, scripts/bench_1b_gelu.py; convergence
        # verified on-chip, convergence_check.py --gelu-tanh).
        dt1b, n1b, loss1b = bench_scale(
            embed=3072, depth=8, heads=24, batch=2, img=(64, 128),
            remat=False, dtype=dtype, iters=10, mu_dtype="bfloat16",
            nu_dtype="bfloat16", gelu_approx="tanh")
        mfu1b = 6.0 * n1b * tokens * 2 / dt1b / peak
        result.update({
            "measured_1b_samples_per_sec": round(2 / dt1b, 4),
            "measured_1b_mfu": round(mfu1b, 4),
            "measured_1b_step_seconds": round(dt1b, 5),
            "measured_1b_params_m": round(n1b / 1e6, 2),
            "measured_1b_loss": float(loss1b),
        })
        # opt-in tanh-GELU (configs gelu_approx: tanh): measured -4.5% trunk
        # step at 117M (scripts/bench_r4_fusion.py); report the full-model
        # delta alongside the erf-exact headline
        dt_t, _, _ = bench_scale(dtype=dtype, mu_dtype="bfloat16",
                                 gelu_approx="tanh", **cfg117)
        result.update({
            "gelu_tanh_samples_per_sec": round(batch / dt_t, 4),
            "gelu_tanh_mfu": round(6.0 * n_params * tokens * batch
                                   / dt_t / peak, 4),
            "gelu_tanh_step_seconds": round(dt_t, 5),
        })

        # The north star (BASELINE.json) is "interm_1b ... at >45% MFU" —
        # vs_baseline tracks the 1B measurement, the north-star config.
        # (117M analytic-6NP MFU is attention-tax-bound at d=64: the
        # uncredited attention FLOPs are ~40% of its step; docs/performance.md)
        result["vs_baseline"] = round(mfu1b / 0.45, 4)
        result["vs_baseline_basis"] = "measured_1b_mfu / 0.45 north-star MFU"
        # 117M: the 6NP basis is hardware-bounded ~31% at d=64 (measured
        # no-LN-no-GELU bound, docs/performance.md "Round-4 fusion-floor
        # attack"); the attention-credited MFU is the honest basis there
        result["vs_baseline_117m"] = round(mfu_attn / 0.45, 4)
        result["vs_baseline_117m_basis"] = ("mfu_incl_attention / 0.45 "
                                            "(6NP is bounded ~0.31 at d=64; "
                                            "6NP-based ratio: "
                                            f"{round(mfu / 0.45, 4)})")

        # Shipped-pipeline number: Trainer.fit over an on-disk synthetic
        # dataset at the same 117M shape (data staging + collate + step),
        # so the headline records what the production path delivers, not
        # only the kernel-level loop. On the axon tunnel the gap vs the raw
        # loop is relay H2D bandwidth (docs/performance.md
        # "Trainer-vs-raw-loop"); on real TPU VMs with DMA it closes.
        try:
            import sys

            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            from bench_r3b_all import trainer_harness

            th = trainer_harness()
            result.update({
                "trainer_loop_samples_per_sec": th["samples_s"],
                "trainer_loop_mfu": th["mfu"],
                "trainer_loop_vs_raw_117m": round(
                    th["samples_s"] / (batch / dt), 4),
                "trainer_loop_basis": "Trainer.fit epochs 1-2 mean, "
                                      "on-disk synth dataset, incl. staging",
                "trainer_loop_data_wait_s": th.get("data_wait_s"),
                "trainer_loop_fence_wait_s": th.get("fence_wait_s"),
                "trainer_loop_h2d_mb_per_epoch": th.get("h2d_mb_per_epoch"),
            })
        except Exception as e:  # never fail the headline on the extra stage
            result["trainer_loop_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
