"""Find where the attention-free 117M trunk loses efficiency: pure matmul
chain vs Block stack vs the full model's non-trunk parts. Run alone."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, HID, DEPTH = 8, 2048, 1024, 4096, 8
PEAK = 197e12


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def report(name, t, flops):
    print(f"{name:42s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF "
          f"({flops/t/PEAK*100:4.1f}%)", flush=True)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B * N, D)), jnp.bfloat16)

# per-layer trunk matmuls (qkv 3D, proj D, fc1 4D, fc2 4D) = 12 D^2 per token
Wqkv = [jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16) for _ in range(DEPTH)]
Wproj = [jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16) for _ in range(DEPTH)]
W1 = [jnp.asarray(rng.normal(size=(D, HID)) * 0.02, jnp.bfloat16) for _ in range(DEPTH)]
W2 = [jnp.asarray(rng.normal(size=(HID, D)) * 0.02, jnp.bfloat16) for _ in range(DEPTH)]

FLOPS_L = 2 * B * N * (D * 3 * D + D * D + 2 * D * HID)
FLOPS = FLOPS_L * DEPTH


@jax.jit
def pure_matmuls(x):
    for i in range(DEPTH):
        q = x @ Wqkv[i]
        x = q[:, :D] @ Wproj[i] + x
        h = x @ W1[i]
        x = h @ W2[i] + x
    return x


t = timeit(pure_matmuls, x)
report("pure matmul chain (fwd)", t, FLOPS)


@jax.jit
def matmuls_with_ln_gelu(x):
    def ln(a):
        a32 = a.astype(jnp.float32)
        mu = a32.mean(-1, keepdims=True)
        var = a32.var(-1, keepdims=True)
        return ((a32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(a.dtype)

    for i in range(DEPTH):
        y = ln(x)
        q = y @ Wqkv[i]
        x = q[:, :D] @ Wproj[i] + x
        y = ln(x)
        h = jax.nn.gelu(y @ W1[i], approximate=False)
        x = h @ W2[i] + x
    return x


t = timeit(matmuls_with_ln_gelu, x)
report("matmuls + LN + gelu (fwd)", t, FLOPS)


def loss_fn(ws, x):
    wq, wp, w1, w2 = ws
    for i in range(DEPTH):
        q = x @ wq[i]
        x = q[:, :D] @ wp[i] + x
        h = jax.nn.gelu(x @ w1[i], approximate=False)
        x = h @ w2[i] + x
    return jnp.sum(x.astype(jnp.float32) ** 2)


grad_fn = jax.jit(jax.grad(loss_fn, argnums=0))
ws = (Wqkv, Wproj, W1, W2)
t = timeit(grad_fn, ws, x)
report("fwd+bwd matmul chain (3x flops)", t, 3 * FLOPS)

# the model's non-trunk parts: patch-embed + var-agg + decoder + convs
from orbit2_tpu.models import ResSlimViT

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
model0 = ResSlimViT(
    default_vars=DEFAULT_VARS, img_size=(64, 128), in_channels=7,
    out_channels=3, superres_mag=4, patch_size=2, embed_dim=D, depth=0,
    decoder_depth=2, num_heads=16, learn_pos_emb=True,
    spatial_resolution=111.0, attention_impl="auto", remat=False,
    dtype=jnp.bfloat16, drop_rate=0.0, drop_path=0.0)
xin = jnp.asarray(rng.normal(size=(B, 7, 64, 128)), jnp.float32)
p0 = model0.init({"params": jax.random.PRNGKey(0)}, xin, DEFAULT_VARS,
                 OUT_VARS, deterministic=True)["params"]
f0 = jax.jit(lambda p, a: model0.apply({"params": p}, a, DEFAULT_VARS,
                                       OUT_VARS, deterministic=True))
t = timeit(f0, p0, xin)
print(f"{'depth-0 model fwd (embed/agg/head/convs)':42s} {t*1e3:7.2f} ms",
      flush=True)
