"""Break down the depth-0 model's 9.7ms fwd: embed/var-agg vs decoder vs
residual-conv path. Run alone."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.models import ResSlimViT

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
B, IMG, D = 8, (64, 128), 1024
rng = np.random.default_rng(0)
xin = jnp.asarray(rng.normal(size=(B, 7) + IMG), jnp.float32)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def model_fwd(dec_depth):
    m = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=IMG, in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=D, depth=0,
        decoder_depth=dec_depth, num_heads=16, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="auto", remat=False,
        dtype=jnp.bfloat16, drop_rate=0.0, drop_path=0.0)
    p = m.init({"params": jax.random.PRNGKey(0)}, xin, DEFAULT_VARS,
               OUT_VARS, deterministic=True)["params"]
    f = jax.jit(lambda p, a: m.apply({"params": p}, a, DEFAULT_VARS,
                                     OUT_VARS, deterministic=True))
    return f, p, m


f2, p2, m2 = model_fwd(2)
t = timeit(f2, p2, xin)
print(f"depth0 dec2 full fwd:     {t*1e3:6.2f} ms", flush=True)

f0, p0, _ = model_fwd(0)
t = timeit(f0, p0, xin)
print(f"depth0 dec0 full fwd:     {t*1e3:6.2f} ms", flush=True)

# encoder only (embed + var-agg + pos/res embeds)
enc = jax.jit(lambda p, a: m2.apply(
    {"params": p}, a, DEFAULT_VARS, method=m2._forward_encoder,
    deterministic=True))
try:
    t = timeit(enc, p2, xin)
    print(f"encoder only:             {t*1e3:6.2f} ms", flush=True)
except Exception as e:
    print("encoder-only probe failed:", str(e)[:120], flush=True)

# residual conv path alone (path2 convs + pixel shuffle + conv_out shapes)
from flax import linen as nn

from orbit2_tpu.models.components.cnn import PeriodicConv2D  # noqa


class ConvPath(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: [B, 7, 64, 128] fp32
        xs = x[:, :7]
        h = jnp.transpose(xs, (0, 2, 3, 1))  # NHWC
        h = nn.Conv(64, (3, 3), padding="SAME", dtype=jnp.bfloat16)(h)
        h = nn.gelu(h, approximate=False)
        # pixel shuffle 4x: [B,64,128,64] -> [B,256,512,4]
        Bs, H, W, C = h.shape
        r = 4
        h = h.reshape(Bs, H, W, r, r, C // (r * r))
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(Bs, H * r, W * r, C // (r * r))
        h = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.bfloat16)(h)
        return h


cp = ConvPath()
pc = cp.init(jax.random.PRNGKey(0), xin)
fc = jax.jit(lambda p, a: cp.apply(p, a))
t = timeit(fc, pc, xin)
print(f"conv/pixelshuffle path:   {t*1e3:6.2f} ms", flush=True)
