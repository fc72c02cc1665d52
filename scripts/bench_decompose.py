"""117M step decomposition: isolate attention, trunk matmuls, optimizer,
loss, and dispatch overhead. Run alone on the chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
B, IMG = 8, (64, 128)


def timeit(fn, *args, iters=20, reduce=lambda o: o):
    out = fn(*args)
    _ = float(jnp.sum(reduce(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(reduce(out)))
    return (time.perf_counter() - t0) / iters


def build(attn="auto"):
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=IMG, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=1024, depth=8,
        decoder_depth=2, num_heads=16, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl=attn, remat=False,
        dtype=jnp.bfloat16, drop_rate=0.0, drop_path=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 7) + IMG), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, 3, IMG[0] * 4, IMG[1] * 4)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    return model, params, x, y


def main():
    # 0) dispatch overhead: trivial jitted op round-trips
    tiny = jax.jit(lambda a: a * 2.0 + 1.0)
    a = jnp.ones((8, 8))
    t = timeit(tiny, a, iters=50)
    print(f"dispatch overhead (tiny op): {t*1e3:6.2f} ms/call", flush=True)

    model, params, x, y = build()

    # 1) fwd only
    fwd = jax.jit(lambda p, xb: model.apply({"params": p}, xb, DEFAULT_VARS,
                                            OUT_VARS, deterministic=True))
    t_fwd = timeit(fwd, params, x)
    print(f"fwd (pallas attn):           {t_fwd*1e3:6.2f} ms", flush=True)

    # 2) fwd with attention replaced by identity (isolates trunk+rest)
    # blocks.py binds dot_product_attention at import time — patch THERE
    import orbit2_tpu.models.components.blocks as blkmod

    orig = blkmod.dot_product_attention
    blkmod.dot_product_attention = lambda q, k, v, **kw: v
    try:
        model2, params2, _, _ = build()
        fwd2 = jax.jit(lambda p, xb: model2.apply(
            {"params": p}, xb, DEFAULT_VARS, OUT_VARS, deterministic=True))
        t_fwd2 = timeit(fwd2, params2, x)
        print(f"fwd (attention = identity):  {t_fwd2*1e3:6.2f} ms", flush=True)

        # 3) full step, attention identity
        tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
        opt2 = tx.init(params2)
        loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
        step2 = make_train_step(model2, loss_metric, None, tx, DEFAULT_VARS,
                                OUT_VARS)
        key = jax.random.key(1, impl="rbg")

        def run2(p, o, k):
            return step2(p, o, x, y, k)

        p2, o2 = params2, opt2
        for _ in range(2):
            key, sub = jax.random.split(key)
            p2, o2, l2 = run2(p2, o2, sub)
        _ = float(l2)
        t0 = time.perf_counter()
        for _ in range(10):
            key, sub = jax.random.split(key)
            p2, o2, l2 = run2(p2, o2, sub)
        _ = float(l2)
        t_step2 = (time.perf_counter() - t0) / 10
        print(f"step (attention = identity): {t_step2*1e3:6.2f} ms", flush=True)
    finally:
        blkmod.dot_product_attention = orig

    # 4) optimizer alone: adamw update on the 117M tree
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    opt = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt_step(g, o, p):
        import optax

        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2

    t_opt = timeit(opt_step, grads, opt, params, iters=20,
                   reduce=lambda out: jax.tree.leaves(out[0])[0])
    print(f"adamw update alone:          {t_opt*1e3:6.2f} ms", flush=True)

    # 5) loss alone on [8,3,256,512]
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    yhat = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, 3, IMG[0] * 4, IMG[1] * 4)), jnp.float32)

    lf = jax.jit(lambda a, b: loss_metric(a, b, var_names=list(OUT_VARS)))
    t_loss = timeit(lf, yhat, y, iters=30)
    print(f"bayesian_tv loss alone:      {t_loss*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
