"""TPU-only validation + profiling bisection. Run manually on the chip:
PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_checks.py

1. flash-attention kernel dropout: determinism, keep-rate, grads finite,
   eval-mode parity with XLA attention
2. forward-time bisection of the 117M ResSlimViT to locate non-matmul
   overhead (encoder-only vs trunk-only vs full)
3. full train-step timing with the optimized path (in-kernel dropout + rbg)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.models.components.blocks import Block
from orbit2_tpu.ops.flash_attention import flash_attention
from orbit2_tpu.registry import METRICS_REGISTRY
import orbit2_tpu.metrics.metrics  # noqa: F401
from orbit2_tpu.training.optim import make_optimizer
from orbit2_tpu.training.train import make_train_step
from flax import linen as nn

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]


def timed(fn, *args, iters=10, label=""):
    # reduce to a scalar in-graph: fetching full outputs through the axon
    # tunnel costs ~10ms/MB and poisons the measurement
    red = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32)))
    _ = float(red(*args))  # compile + sync
    t0 = time.perf_counter()
    for _i in range(iters):
        out = red(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def check_kernel_dropout():
    print("== flash attention in-kernel dropout", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 512, 4, 64)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 512, 4, 64)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 512, 4, 64)), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(3)

    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, dropout_rate=0.1,
                                                dropout_rng=key))
    o1 = np.asarray(f(q, k, v))
    o2 = np.asarray(f(q, k, v))
    assert (o1 == o2).all(), "same seed must be deterministic"
    key2 = jax.random.PRNGKey(4)
    o3 = np.asarray(jax.jit(lambda q, k, v: flash_attention(
        q, k, v, dropout_rate=0.1, dropout_rng=key2))(q, k, v))
    assert not (o1 == o3).all(), "different seed must differ"

    o_nodrop = np.asarray(jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v))
    # dropout keeps expectation: means should be close-ish
    ratio = float(np.abs(o1).mean() / np.abs(o_nodrop).mean())
    print(f"  |o_drop|/|o_nodrop| mean ratio = {ratio:.3f} (expect ~1+-0.15)")
    assert 0.7 < ratio < 1.4

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, dropout_rate=0.1,
                                       dropout_rng=key).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for a in g:
        assert np.isfinite(np.asarray(a, dtype=np.float32)).all()
    print("  dropout grads finite OK", flush=True)


def bisect_forward():
    print("== forward bisection (117M shapes, bf16, deterministic)", flush=True)
    B, L, D, depth, heads, img = 8, 2048, 1024, 8, 16, (64, 128)

    def make(depth_):
        return ResSlimViT(
            default_vars=DEFAULT_VARS, img_size=img, in_channels=7,
            out_channels=3, superres_mag=4, patch_size=2, embed_dim=D,
            depth=depth_, decoder_depth=2, num_heads=heads, learn_pos_emb=True,
            spatial_resolution=111.0, attention_impl="auto",
            dtype=jnp.bfloat16, drop_rate=0.0, drop_path=0.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 7) + img), dtype=jnp.float32)

    m_full = make(depth)
    p_full = m_full.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                         OUT_VARS, deterministic=True)["params"]
    fwd_full = jax.jit(lambda p, xb: m_full.apply({"params": p}, xb,
                                                  DEFAULT_VARS, OUT_VARS,
                                                  deterministic=True))
    t_full = timed(fwd_full, p_full, x, label="full fwd (depth 8)")

    m0 = make(0)
    p0 = m0.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS, OUT_VARS,
                 deterministic=True)["params"]
    fwd0 = jax.jit(lambda p, xb: m0.apply({"params": p}, xb, DEFAULT_VARS,
                                          OUT_VARS, deterministic=True))
    t_enc = timed(fwd0, p0, x, label="depth 0 (encoder+decoder+convs)")

    # bare Block stack at [B, L, D]
    blk = Block(dim=D, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
                attention_impl="auto", dtype=jnp.bfloat16)
    tokens = jnp.asarray(rng.normal(size=(B, L, D)), dtype=jnp.bfloat16)
    bp = blk.init({"params": jax.random.PRNGKey(0)}, tokens, True)["params"]

    def trunk(p, t):
        for _ in range(8):
            t = blk.apply({"params": p}, t, True)
        return t

    t_trunk = timed(jax.jit(trunk), bp, tokens, label="8x Block @ [8,2048,1024]")

    # flash attention alone
    qkv = jnp.asarray(rng.normal(size=(B, L, heads, D // heads)), dtype=jnp.bfloat16)
    t_attn = timed(jax.jit(lambda a: flash_attention(a, a, a)), qkv,
                   label="flash attn fwd x1")
    print(f"  residual (full - enc - trunk) = "
          f"{(t_full - t_enc - t_trunk)*1e3:.2f} ms", flush=True)


def train_step_timing():
    print("== optimized train step (in-kernel dropout + rbg)", flush=True)
    B, D, depth, heads, img = 8, 1024, 8, 16, (64, 128)
    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=img, in_channels=7, out_channels=3,
        superres_mag=4, patch_size=2, embed_dim=D, depth=depth,
        decoder_depth=2, num_heads=heads, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=True,
        dtype=jnp.bfloat16, drop_rate=0.1, drop_path=0.1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 7) + img), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, 3, img[0] * 4, img[1] * 4)),
                    dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = make_optimizer("adamw", {"lr": 1e-4, "weight_decay": 1e-5})
    opt_state = tx.init(params)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(model, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS)
    key = jax.random.key(1, impl="rbg")
    for _ in range(2):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    _ = float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, y, sub)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / iters
    tokens = (img[0] // 2) * (img[1] // 2)
    mfu = 6 * n_params * tokens * B / dt / 197e12
    print(f"  step {dt*1e3:.1f} ms, {B/dt:.2f} samples/s, MFU~{mfu*100:.1f}%",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    check_kernel_dropout()
    bisect_forward()
    train_step_timing()
