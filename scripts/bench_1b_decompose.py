"""1B step decomposition: optimizer share at the real param tree."""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp, numpy as np, optax
from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.training.optim import make_optimizer

DEFAULT_VARS = ("land_sea_mask","orography","lattitude","landcover",
 "total_precipitation_24hr","2m_temperature_min","2m_temperature_max")
OUT_VARS = DEFAULT_VARS[4:]

model = ResSlimViT(default_vars=DEFAULT_VARS, img_size=(64,128), in_channels=7,
    out_channels=3, superres_mag=4, patch_size=2, embed_dim=3072, depth=8,
    decoder_depth=2, num_heads=24, learn_pos_emb=True, spatial_resolution=111.0,
    attention_impl="auto", remat=False, dtype=jnp.bfloat16,
    drop_rate=0.0, drop_path=0.0)
x = jnp.zeros((2,7,64,128), jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
n = sum(p.size for p in jax.tree.leaves(params))
print(f"params: {n/1e6:.0f}M", flush=True)

tx = make_optimizer("adamw", {"lr":1e-4, "weight_decay":1e-5})
state = tx.init(params)
grads = jax.tree.map(lambda p: p*1e-3, params)

@functools.partial(jax.jit, donate_argnums=(1, 2))
def opt_step(g, s, p):
    u, s2 = tx.update(g, s, p)
    return optax.apply_updates(p, u), s2

tot = jax.jit(lambda p: sum(jnp.sum(l) for l in jax.tree.leaves(p)))
p2, s2 = opt_step(grads, state, params)
_ = float(tot(p2))
t0 = time.perf_counter()
for _ in range(10):
    p2, s2 = opt_step(grads, s2, p2)
_ = float(tot(p2))
print(f"adamw update+apply @0.97B: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
      flush=True)

