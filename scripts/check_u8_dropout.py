"""On-chip validation of the u8-threshold in-kernel dropout: determinism,
expectation, fwd/bwd mask consistency, and the step-time effect."""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from orbit2_tpu.ops.flash_attention import flash_attention
from orbit2_tpu.ops.dropout import fused_dropout

DROP = 0.1
key = jax.random.PRNGKey(3)
rng = np.random.default_rng(0)
B, N, H, D = 8, 2048, 16, 64
q = jnp.asarray(rng.normal(size=(B,N,H,D))*0.3, jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B,N,H,D))*0.3, jnp.bfloat16)
v = jnp.ones((B,N,H,D), jnp.bfloat16)

f = jax.jit(lambda q,k,v: flash_attention(q,k,v, dropout_rate=DROP, dropout_rng=key))
o1 = np.asarray(f(q,k,v), np.float32); o2 = np.asarray(f(q,k,v), np.float32)
print("deterministic:", bool((o1==o2).all()), flush=True)
print("mean (want ~1.0):", float(o1.mean()), "std:", float(o1.std()), flush=True)

def loss(q,k,v):
    return jnp.sum(flash_attention(q,k,v, dropout_rate=DROP, dropout_rng=key).astype(jnp.float32)**2)
g = jax.jit(jax.grad(loss, argnums=(0,1,2)))(q,k,v)
print("grads finite:", all(bool(jnp.isfinite(x).all()) for x in g), flush=True)

# fused elementwise dropout
x = jnp.ones((16384, 4096), jnp.bfloat16)
d1 = np.asarray(fused_dropout(x, DROP, key), np.float32)
d2 = np.asarray(fused_dropout(x, DROP, key), np.float32)
print("fused deterministic:", bool((d1==d2).all()),
      "mean:", float(d1.mean()), "frac dropped:", float((d1==0).mean()), flush=True)

# timing: fwd attention with dropout
def bench(fn, *a, iters=20):
    o = fn(*a); _ = float(jnp.sum(o))
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*a)
    _ = float(jnp.sum(o))
    return (time.perf_counter()-t0)/iters
t = bench(f, q, k, v)
print(f"fwd+dropout: {t*1e3:.2f} ms (was 4.26 with u32 masks)", flush=True)
