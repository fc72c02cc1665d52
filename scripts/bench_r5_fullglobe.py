"""Round-5 headline proof: UNTILED full-globe inference on one chip.

The reference structurally cannot run a full 0.25-degree globe through its
ViT: xformers CK attention would materialize ~260k^2 attention probs, so
its whole TILES apparatus exists to split the globe into div^2 overlapping
tiles and stitch the outputs back together
(/root/reference/src/climate_learn/utils/visualize.py:125-311,
reference configs tiling div 4 / overlap 3). Our Pallas flash kernel
streams K/V in VMEM-bounded blocks (ops/flash_attention.py), so N_k is
HBM-bounded only — an untiled 721x1440 @ patch 2 forward (~259k tokens)
should simply run.

This script turns that design claim into measurements:

  A. Serving-forward ladder at 117M (embed 1024, depth 8, heads 16), bf16,
     B=1: 32k -> 65k -> 131k -> 259k tokens. Records ms/field and achieved
     TFLOPS (attention-inclusive analytic FLOPs — at 259k tokens attention
     is ~95% of the forward). On OOM/compile failure records the largest
     working size as the honest bound.
  B. w8a8 at the largest working size (matmuls int8; attention stays bf16,
     so the expected win shrinks as L grows — recorded, not assumed).
  C. Tiled-vs-untiled consistency at full globe: the div=4/overlap=3
     stitched prediction (the reference's ONLY option) vs the untiled
     forward on the same weights/input — PSNR/SSIM between them plus the
     max |delta| inside 8-px-wide bands at the internal tile boundaries,
     where stitching artifacts live.

One chip claim runs everything; exits 7 on claim failure so a shell loop
can retry in a fresh interpreter:
  until PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/bench_r5_fullglobe.py; do sleep 60; done
Results: /tmp/r5_fullglobe.json (recorded into docs/performance.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
PEAK = 197e12
RESULTS = []

# (H, W) low-res inputs; tokens = (H/2)*(W/2). 720x1440 is the 0.25-degree
# globe (721 rows cropped to patch parity, as the reference's own TILES
# divisibility rule forces — intermediate_downscaling.py:535-543).
LADDER = [(256, 512), (360, 720), (512, 1024), (720, 1440)]


def record(r):
    RESULTS.append(r)
    print(json.dumps(r), flush=True)
    with open("/tmp/r5_fullglobe.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def build(quant="none"):
    import jax.numpy as jnp

    from orbit2_tpu.models import ResSlimViT

    return ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=(64, 128), in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=1024,
        depth=8, decoder_depth=2, num_heads=16, learn_pos_emb=True,
        spatial_resolution=25.0, attention_impl="auto", quant=quant,
        dtype=jnp.bfloat16)


def analytic_flops(n_params, h, w, depth=8, dim=1024, heads=16):
    """2*P*L matmul FLOPs + 4*L^2*dim attention FLOPs per layer."""
    l = (h // 2) * (w // 2)
    return 2.0 * n_params * l + depth * 4.0 * l * l * dim


def fwd_ladder():
    import jax
    import jax.numpy as jnp

    model = build()
    rng = np.random.default_rng(0)
    params = None
    largest_ok = None
    for (h, w) in LADDER:
        tokens = (h // 2) * (w // 2)
        try:
            x = jnp.asarray(rng.normal(size=(1, 7, h, w)), jnp.float32)
            if params is None:
                params = model.init(
                    {"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
                n = sum(int(np.prod(p.shape))
                        for p in jax.tree.leaves(params))
            fwd = jax.jit(lambda p, xb: model.apply(
                {"params": p}, xb, DEFAULT_VARS, OUT_VARS,
                deterministic=True))
            t_c0 = time.perf_counter()
            out = fwd(params, x)
            float(jnp.mean(out.astype(jnp.float32)))  # compile + sync
            compile_s = time.perf_counter() - t_c0
            iters = 5 if tokens < 200_000 else 3
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(params, x)
            float(jnp.mean(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters
            fl = analytic_flops(n, h, w)
            record(dict(case="untiled_bf16", img=[h, w], tokens=tokens,
                        ms=round(dt * 1e3, 1),
                        fields_per_s=round(1.0 / dt, 3),
                        tflops=round(fl / dt / 1e12, 1),
                        mfu=round(fl / dt / PEAK, 4),
                        compile_s=round(compile_s, 1),
                        params_m=round(n / 1e6, 1)))
            largest_ok = (h, w)
            del out, x
        except Exception as e:
            record(dict(case="untiled_bf16", img=[h, w], tokens=tokens,
                        error=f"{type(e).__name__}: {str(e)[:300]}"))
            break
    return largest_ok, params


def w8a8_at(params, h, w):
    import jax
    import jax.numpy as jnp

    from orbit2_tpu.utils.quantize import quantize_params

    tokens = (h // 2) * (w // 2)
    try:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 7, h, w)), jnp.float32)
        qmodel = build(quant="w8a8")
        qp = quantize_params(qmodel, jax.device_get(params), x,
                             DEFAULT_VARS, OUT_VARS)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        fwd = jax.jit(lambda p, xb: qmodel.apply(
            {"params": p}, xb, DEFAULT_VARS, OUT_VARS, deterministic=True))
        out = fwd(qp, x)
        float(jnp.mean(out.astype(jnp.float32)))
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(qp, x)
        float(jnp.mean(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        fl = analytic_flops(n, h, w)
        record(dict(case="untiled_w8a8", img=[h, w], tokens=tokens,
                    ms=round(dt * 1e3, 1),
                    fields_per_s=round(1.0 / dt, 3),
                    tflops_bf16_equiv=round(fl / dt / 1e12, 1)))
        del out, x, qp
    except Exception as e:
        record(dict(case="untiled_w8a8", img=[h, w], tokens=tokens,
                    error=f"{type(e).__name__}: {str(e)[:300]}"))


def tiled_vs_untiled(params, h, w, div=4, overlap=3):
    """The reference's stitched output vs our untiled one, same weights."""
    import jax
    import jax.numpy as jnp

    from orbit2_tpu.utils.visualize import psnr, ssim, stitched_inference

    model = build()
    rng = np.random.default_rng(1)
    x_full = rng.normal(size=(7, h, w)).astype(np.float32)

    fwd = jax.jit(lambda p, xb: model.apply(
        {"params": p}, xb, DEFAULT_VARS, OUT_VARS, deterministic=True))

    def fwd_np(xb):
        return np.asarray(
            fwd(params, jnp.asarray(xb)).astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        untiled = fwd_np(x_full[None])[0]  # [3, h*4, w*4]
        t_untiled = time.perf_counter() - t0
        t0 = time.perf_counter()
        tiled = stitched_inference(fwd_np, x_full, div, overlap, mag=4)
        t_tiled = time.perf_counter() - t0

        delta = np.abs(untiled - tiled.astype(untiled.dtype))
        # 8-px bands around internal tile boundaries (output pixels)
        hh, ww = untiled.shape[1], untiled.shape[2]
        band = 8
        bmask = np.zeros((hh, ww), bool)
        for i in range(1, div):
            yb, xb = i * hh // div, i * ww // div
            bmask[max(0, yb - band):yb + band, :] = True
            bmask[:, max(0, xb - band):xb + band] = True
        record(dict(
            case="tiled_vs_untiled", img=[h, w], div=div, overlap=overlap,
            psnr=round(float(np.mean([psnr(untiled[i], tiled[i])
                                      for i in range(3)])), 2),
            ssim=round(float(np.mean([ssim(untiled[i], tiled[i])
                                      for i in range(3)])), 4),
            max_abs_delta=round(float(delta.max()), 5),
            boundary_band_max_delta=round(float(delta[:, bmask].max()), 5),
            interior_max_delta=round(float(delta[:, ~bmask].max()), 5),
            rms_delta=round(float(np.sqrt((delta ** 2).mean())), 6),
            untiled_s=round(t_untiled, 2),
            tiled_stitched_s=round(t_tiled, 2),
        ))
    except Exception as e:
        record(dict(case="tiled_vs_untiled", img=[h, w],
                    error=f"{type(e).__name__}: {str(e)[:300]}"))


def main():
    import jax

    try:
        assert jax.default_backend() == "tpu", jax.default_backend()
    except Exception as e:
        print(f"backend claim failed: {e}", flush=True)
        raise SystemExit(7)
    largest, params = fwd_ladder()
    if largest is None:
        print("no ladder size compiled; nothing further to measure")
        return
    h, w = largest
    w8a8_at(params, h, w)
    tiled_vs_untiled(params, h, w)
    print("FULLGLOBE BATCH COMPLETE", flush=True)


if __name__ == "__main__":
    main()
