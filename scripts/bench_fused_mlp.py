"""Fused-MLP kernel vs the XLA chain at the 117M trunk shape, then the full
117M train step with the fused path live. Run alone on the real chip:
    python scripts/bench_fused_mlp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops.fused_mlp import fused_mlp

T, D, F = 8 * 2048, 1024, 4096
PEAK = 197e12
MLP_FLOPS = 2 * T * (D * F + F * D)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(jnp.asarray(jax.tree.leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force EVERY output leaf (axon: one chain alone would execute)
    _ = float(sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)))
    return (time.perf_counter() - t0) / iters


def report(name, t, flops=MLP_FLOPS):
    print(f"{name:44s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF "
          f"({flops/t/PEAK*100:4.1f}%)", flush=True)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(T, D)) * 0.5, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(D, F)) * D ** -0.5, jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(F, D)) * F ** -0.5, jnp.bfloat16)
b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.bfloat16)
key = jax.random.PRNGKey(3)


def xla_mlp(x, w1, b1, w2, b2, rate=0.0, rng_=None):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    if rate > 0.0:
        rng_, sub = jax.random.split(rng_)
        h = h * jax.random.bernoulli(sub, 1 - rate, h.shape) / (1 - rate)
    out = h @ w2 + b2
    if rate > 0.0:
        out = out * jax.random.bernoulli(rng_, 1 - rate, out.shape) / (1 - rate)
    return out


# ---- forward
report("xla fwd drop0",
       timeit(jax.jit(lambda *a: xla_mlp(*a)), x, w1, b1, w2, b2))
report("fused fwd drop0",
       timeit(jax.jit(lambda *a: fused_mlp(*a)), x, w1, b1, w2, b2))
report("xla fwd drop0.1", timeit(
    jax.jit(lambda *a: xla_mlp(*a, rate=0.1, rng_=key)), x, w1, b1, w2, b2))
report("fused fwd drop0.1", timeit(
    jax.jit(lambda *a: fused_mlp(*a, drop_rate=0.1, rng=key)),
    x, w1, b1, w2, b2))

# ---- fwd + bwd (grads wrt all inputs, like training)
def loss_xla(x, w1, b1, w2, b2):
    return jnp.sum(xla_mlp(x, w1, b1, w2, b2).astype(jnp.float32) ** 2)


def loss_xla_drop(x, w1, b1, w2, b2):
    return jnp.sum(
        xla_mlp(x, w1, b1, w2, b2, rate=0.1, rng_=key).astype(jnp.float32) ** 2)


def loss_fused(x, w1, b1, w2, b2):
    return jnp.sum(fused_mlp(x, w1, b1, w2, b2).astype(jnp.float32) ** 2)


def loss_fused_drop(x, w1, b1, w2, b2):
    return jnp.sum(fused_mlp(x, w1, b1, w2, b2, drop_rate=0.1,
                             rng=key).astype(jnp.float32) ** 2)


ARGS = (x, w1, b1, w2, b2)
BWD_FLOPS = 3 * MLP_FLOPS
for name, fn in (("xla", loss_xla), ("fused", loss_fused),
                 ("xla drop0.1", loss_xla_drop),
                 ("fused drop0.1", loss_fused_drop)):
    g = jax.jit(jax.grad(fn, argnums=(0, 1, 2, 3, 4)))
    report(f"{name} fwd+bwd", timeit(g, *ARGS), BWD_FLOPS)

# ---- full 117M train step with the fused Mlp live (dispatcher picks it up
# on the single TPU device; compare docs/performance.md: 197.4 / 184.5 ms)
from scripts.bench_ablate import run_case  # noqa: E402

run_case("117m step drop0.1 (fused mlp)", remat=False, rng_impl="rbg")
run_case("117m step drop0 (fused mlp)", remat=False, drop=0.0,
         rng_impl="rbg")
