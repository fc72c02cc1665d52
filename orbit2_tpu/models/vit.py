"""Plain VisionTransformer (reference models/hub/vit.py:12-125).

Single patch embedding over all channels, standard blocks, MLP head,
unpatchify without SR scaling. For downscaling it is used behind a
pre-interpolation wrapper (reference loaders.py:383-385).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from orbit2_tpu.registry import register_model
from orbit2_tpu.models.components.blocks import Block, trunc_normal_init
from orbit2_tpu.ops.pos_embed import get_2d_sincos_pos_embed


@register_model("vit")
class VisionTransformer(nn.Module):
    img_size: Tuple[int, int]
    in_channels: int
    out_channels: int
    history: int = 1
    patch_size: int = 16
    drop_path: float = 0.1
    drop_rate: float = 0.1
    learn_pos_emb: bool = False
    embed_dim: int = 1024
    depth: int = 24
    decoder_depth: int = 8
    num_heads: int = 16
    mlp_ratio: float = 4.0
    attention_impl: str = "xla"
    gelu_approx: str = "exact"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _pos_embed_init(self):
        pe = get_2d_sincos_pos_embed(
            self.embed_dim,
            self.img_size[0] // self.patch_size,
            self.img_size[1] // self.patch_size,
        )
        return jnp.asarray(pe, dtype=self.param_dtype)[None]

    @nn.compact
    def __call__(self, x, *args, deterministic: bool = True, **kwargs):
        if x.ndim == 5:
            x = x.reshape(x.shape[0], -1, x.shape[3], x.shape[4])
        B, C, H, W = x.shape
        p = self.patch_size
        D = self.embed_dim

        # patch embed: conv-equivalent single matmul over p*p*C patches
        h, w = H // p, W // p
        patches = x.reshape(B, C, h, p, w, p).transpose(0, 2, 4, 1, 3, 5)
        patches = patches.reshape(B, h * w, C * p * p).astype(self.dtype)
        tokens = nn.Dense(D, dtype=self.dtype, param_dtype=self.param_dtype,
                          kernel_init=trunc_normal_init, name="patch_embed")(patches)

        if self.learn_pos_emb:
            pos_embed = self.param("pos_embed",
                                   lambda key, *_: self._pos_embed_init(),
                                   (), self.param_dtype)
        else:
            pos_embed = self.variable("fixed", "pos_embed", self._pos_embed_init).value
        tokens = tokens + pos_embed.astype(self.dtype)
        tokens = nn.Dropout(self.drop_rate, deterministic=deterministic)(tokens)

        dpr = np.linspace(0, self.drop_path, self.depth)
        for i in range(self.depth):
            tokens = Block(
                dim=D, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=True, proj_drop=self.drop_rate, attn_drop=self.drop_rate,
                drop_path=float(dpr[i]), attention_impl=self.attention_impl,
                gelu_tanh=self.gelu_approx == "tanh",
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"blocks_{i}",
            )(tokens, deterministic)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="norm")(tokens)

        y = tokens
        for i in range(self.decoder_depth):
            y = nn.Dense(D, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=trunc_normal_init, name=f"head_{i}")(y)
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.out_channels * p * p, dtype=self.dtype,
                     param_dtype=self.param_dtype, kernel_init=trunc_normal_init,
                     name="head_out")(y)

        # unpatchify (reference vit.py:88-102)
        c = self.out_channels
        y = y.reshape(B, h, w, p, p, c)
        y = jnp.einsum("nhwpqc->nchpwq", y)
        return y.reshape(B, c, h * p, w * p)
