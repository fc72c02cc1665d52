"""Res_Slim_ViT — the ORBIT-2 flagship residual Slim Vision Transformer.

TPU-native rebuild of reference src/climate_learn/models/hub/res_slimvit.py:20-338.
Architecture parity (same params, same math), different mechanics:

  * Per-variable patch embedding is ONE gathered batched einsum over a
    [num_default_vars, p*p, D] weight stack instead of a ModuleList of V
    tiny Conv2ds (reference :64-66, :250-257) — keeps the MXU busy with a
    single large matmul.
  * Variable aggregation (learnable var_query + one cross-attention
    collapsing V streams to 1, reference :75-78, :205-230) runs as a batched
    einsum attention over the (B*L, V) layout.
  * Position embedding is sin-cos, resized on the fly for the current image
    size inside the jitted graph (reference :270, pos_embed.py:103-138).
  * The TP broadcast/backward-broadcast hooks (reference :223-227, :286-288,
    :296-297) vanish: dropout consistency across the tensor axis follows from
    JAX's explicit PRNG, and GSPMD handles activation replication.
  * The CNN residual path (Conv -> GELU -> PixelShuffle(mag) -> Conv,
    reference :107-112) runs NHWC.

Dataset phases (data_config, reference :148-164) are expressed by building a
new module instance per phase via `.for_phase(...)` — same params, new static
shapes, one jit specialization per phase.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from orbit2_tpu.registry import register_model
from orbit2_tpu.models.components.blocks import (
    Block,
    VariableMappingAttention,
    trunc_normal_init,
)
from orbit2_tpu.ops.pixel_shuffle import pixel_shuffle_nhwc
from orbit2_tpu.ops.pos_embed import (
    get_2d_sincos_pos_embed,
    interpolate_pos_embed_on_the_fly,
)

# static surface channels appended to the residual path input
# (reference find_var_index, res_slimvit.py:302-310)
RESIDUAL_STATIC_VARS = ("land_sea_mask", "orography", "lattitude", "landcover")


def find_var_index(in_variables: Sequence[str], out_variables: Sequence[str]):
    idx = [in_variables.index(v) for v in out_variables]
    idx += [in_variables.index(v) for v in RESIDUAL_STATIC_VARS]
    return idx


@register_model("res_slimvit")
class ResSlimViT(nn.Module):
    default_vars: Tuple[str, ...]
    img_size: Tuple[int, int]
    in_channels: int
    out_channels: int
    history: int = 1
    superres_mag: int = 4
    cnn_ratio: int = 4
    patch_size: int = 2
    drop_path: float = 0.1
    drop_rate: float = 0.1
    learn_pos_emb: bool = False
    embed_dim: int = 1024
    depth: int = 24
    decoder_depth: int = 8
    num_heads: int = 16
    mlp_ratio: float = 4.0
    spatial_resolution: float = 0.0
    attention_impl: str = "xla"
    # "exact" (erf GELU — torch-reference numerics) or "tanh" (approx GELU,
    # measured -4.5% trunk step time at 117M, scripts/bench_r4_fusion.py)
    gelu_approx: str = "exact"
    # "none" | "w8a8": int8 trunk matmuls for SERVING (deterministic
    # forwards only; ops/quant.py). Convert trained params with
    # orbit2_tpu/utils/quantize.py::quantize_params. Measured 1.285x on the
    # 1B trunk chain, flat at 117M (scripts/bench_int8_probe.py).
    quant: str = "none"
    remat: bool = False
    # 'full' recomputes everything in the backward (reference
    # apply_activation_checkpointing semantics); 'dots' saves matmul outputs
    # (jax.checkpoint_policies.checkpoint_dots) trading memory for less
    # recompute — usually the better point on TPU where HBM, not FLOPs,
    # limits batch size
    remat_policy: str = "full"
    # sequence parallelism: shard the token dim over the mesh's "seq" axis.
    # The reference builds seq_par groups but asserts the feature off
    # (intermediate_downscaling.py:165); here GSPMD constraints make it real:
    # tokens stay sharded through LN/MLP/decoder, attention's q·k^T induces
    # the all-gather of k/v over seq that Ulysses-style SP performs manually.
    seq_shard: bool = False
    # pipeline parallelism over the trunk (parallel/pipeline.py): the depth
    # blocks are split into `pipeline_stages` groups over the mesh's "stage"
    # axis with a GPipe microbatch schedule. The reference has no PP (SURVEY
    # §2.7). Block params live STACKED under "blocks_stacked" ([depth, ...]
    # leading dim) instead of per-block blocks_{i} subtrees —
    # parallel/pipeline.py stack/unstack convert between the two layouts for
    # checkpoint interop. With no stage-capable mesh in context the stacked
    # blocks run sequentially (identical math), so CPU tests and init work
    # unchanged.
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0  # 0 -> = pipeline_stages
    # Megatron-style interleaved (circular) schedule: each stage holds
    # `pipeline_interleave` round-robin chunks of depth/(S*V) blocks and a
    # microbatch rides the stage ring V times, shrinking the fill/drain
    # bubble from (S-1)/(M+S-1) to (S-1)/(V*M+S-1). Params then live as
    # [V, S, dc, ...] under "blocks_stacked_iv" (parallel/pipeline.py).
    pipeline_interleave: int = 1
    # Mixture-of-Experts trunk (models/components/moe.py — no reference
    # counterpart, fills the `ep` parallelism slot): every moe_every-th
    # Block swaps its dense Mlp for moe_experts experts; weights shard over
    # the mesh's "expert" axis. Not composable with pipeline_stages > 1
    # (config.py rejects the pair).
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    moe_top_k: int = 1
    # base_img_size freezes pos_embed's param shape across dataset phases
    # (reference keeps the construction-time shape and resizes on the fly)
    base_img_size: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def for_phase(self, spatial_resolution: float, img_size: Tuple[int, int],
                  in_channels: int, out_channels: int) -> "ResSlimViT":
        """data_config equivalent (reference res_slimvit.py:148-164): same
        params, new static geometry."""
        assert out_channels == self.out_channels, (
            "decoder head is sized at construction; out_channels cannot change"
        )
        return dataclasses.replace(
            self,
            spatial_resolution=spatial_resolution,
            img_size=tuple(img_size),
            in_channels=in_channels,
            base_img_size=self.base_img_size or self.img_size,
        )

    def _seq_constraint(self, tokens):
        """Pin [B, L, D] activations to (data-axes, seq, None) when sequence
        parallelism is on. No-op when seq_shard is False."""
        if not self.seq_shard:
            return tokens
        from jax.sharding import PartitionSpec as P
        from orbit2_tpu.parallel.mesh import BATCH_AXES, AXIS_SEQ

        try:
            mesh = jax.sharding.get_abstract_mesh()
            if mesh is None or AXIS_SEQ not in (mesh.axis_names or ()):
                return tokens  # no seq-capable mesh in context (e.g. init)
        except Exception:
            return tokens
        return jax.lax.with_sharding_constraint(
            tokens, P(BATCH_AXES, AXIS_SEQ, None))

    def _pos_embed_init(self, key, shape, dtype):
        base = self.base_img_size or self.img_size
        pe = get_2d_sincos_pos_embed(
            self.embed_dim, base[0] // self.patch_size, base[1] // self.patch_size
        )
        return jnp.asarray(pe, dtype=dtype)[None]

    @nn.compact
    def __call__(self, x, in_variables: Sequence[str], out_variables: Sequence[str],
                 deterministic: bool = True):
        """x: [B, C_in, H, W] (or [B, T, C, H, W], flattened like reference
        :313-314); returns [B, C_out, H*mag, W*mag]."""
        if x.ndim == 5:
            x = x.reshape(x.shape[0], -1, x.shape[3], x.shape[4])
        in_variables = tuple(in_variables)
        out_variables = tuple(out_variables)
        assert len(out_variables) == self.out_channels

        out_var_index = find_var_index(in_variables, out_variables)
        path2 = self._residual_path(x, out_var_index)
        tokens = self._forward_encoder(x, in_variables, deterministic)

        # decoder head: decoder_depth x (Dense + GELU), then projection
        # (reference :115-120, :326)
        y = tokens
        for i in range(self.decoder_depth):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=trunc_normal_init, name=f"head_{i}")(y)
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(
            self.out_channels * (self.superres_mag * self.patch_size) ** 2,
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=trunc_normal_init, name="head_out",
        )(y)

        y = self._unpatchify(y, x.shape[2], x.shape[3])
        # conv_out 3x3 (reference :122, :331) — NHWC
        y = jnp.transpose(y, (0, 2, 3, 1))
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_out")(y)
        y = jnp.transpose(y, (0, 3, 1, 2))

        # crop-to-match add (reference :333-336)
        if path2.shape[2] != y.shape[2] or path2.shape[3] != y.shape[3]:
            path2 = path2[:, :, : y.shape[2], : y.shape[3]]
        preds = y + path2
        return preds

    # ---- CNN residual path -------------------------------------------------

    def _residual_path(self, x, out_var_index):
        """Conv3x3 -> GELU -> PixelShuffle(mag) -> Conv3x3 on the selected
        out-variable + static channels (reference :107-112, :233-242)."""
        mag = self.superres_mag
        sel = x[:, jnp.asarray(out_var_index), :, :]
        h = jnp.transpose(sel, (0, 2, 3, 1))  # NHWC
        h = nn.Conv(self.cnn_ratio * mag * mag, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype, name="path2_conv1")(h)
        h = nn.gelu(h, approximate=False)
        h = pixel_shuffle_nhwc(h, mag)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype, name="path2_conv2")(h)
        return jnp.transpose(h, (0, 3, 1, 2))

    # ---- encoder -------------------------------------------------------------

    def _patchify(self, x):
        """[B, V, H, W] -> [B, V, L, p*p] in conv-weight flatten order."""
        B, V, H, W = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = x.reshape(B, V, h, p, w, p)
        x = x.transpose(0, 1, 2, 4, 3, 5)  # B, V, h, w, p, p
        return x.reshape(B, V, h * w, p * p)

    def _forward_encoder(self, x, in_variables, deterministic):
        B, C, H, W = x.shape
        p = self.patch_size
        D = self.embed_dim
        nvars = len(self.default_vars)
        var_ids = np.asarray([self.default_vars.index(v) for v in in_variables])

        # token embedding: gathered per-variable projection
        # (reference token_embeds ModuleList, :64-66, :250-257)
        token_kernel = self.param(
            "token_embed_kernel", trunc_normal_init, (nvars, p * p, D), self.param_dtype
        )
        token_bias = self.param(
            "token_embed_bias", nn.initializers.zeros, (nvars, D), self.param_dtype
        )
        patches = self._patchify(x).astype(self.dtype)  # [B, V, L, p*p]
        kern = token_kernel[var_ids].astype(self.dtype)  # [V, p*p, D]
        bias = token_bias[var_ids].astype(self.dtype)    # [V, D]
        # produce tokens directly in [B, L, V, D] — the layout the variable
        # aggregation wants — instead of [B, V, L, D] + a large transpose
        # (the reference einsums bvld->blvd every step, res_slimvit.py:211)
        tokens = jnp.einsum("bvlp,vpd->blvd", patches, kern) + bias[None, None, :, :]

        # variable embedding (reference :72, :260-262)
        var_embed = self.param(
            "var_embed", nn.initializers.zeros, (1, nvars, D), self.param_dtype
        )
        tokens = tokens + var_embed[:, var_ids].astype(self.dtype)[:, None, :, :]

        # variable aggregation (reference :205-230)
        L = tokens.shape[1]
        var_query = self.param(
            "var_query", nn.initializers.zeros, (1, 1, D), self.param_dtype
        )
        agg_in = tokens.reshape(B * L, len(in_variables), D)
        agg = VariableMappingAttention(
            dim=D, num_heads=self.num_heads, qkv_bias=False,
            attention_impl=self.attention_impl, dtype=self.dtype,
            param_dtype=self.param_dtype, name="var_agg",
        )(var_query, agg_in, deterministic)
        tokens = agg.reshape(B, L, D)

        # position embedding, resized on the fly (reference :270)
        if self.learn_pos_emb:
            pos_embed = self.param("pos_embed", self._pos_embed_init,
                                   (1, 0, D), self.param_dtype)
        else:
            pos_embed = self.variable(
                "fixed", "pos_embed",
                lambda: self._pos_embed_init(None, None, self.param_dtype),
            ).value
        pe = interpolate_pos_embed_on_the_fly(
            pos_embed.astype(self.dtype), p, (H, W)
        )
        tokens = tokens + pe

        # spatial resolution embedding (reference :62, :277-281)
        res = jnp.asarray([self.spatial_resolution], dtype=self.dtype)
        spatial_emb = nn.Dense(D, dtype=self.dtype, param_dtype=self.param_dtype,
                               kernel_init=trunc_normal_init, name="spatial_embed")(res)
        tokens = tokens + spatial_emb[None, None, :]

        from orbit2_tpu.ops.dropout import dropout as fused_drop

        tokens = fused_drop(tokens, self.drop_rate, deterministic,
                            lambda: self.make_rng("dropout"))

        # transformer trunk (reference :86-103, :291-292)
        dpr = np.linspace(0, self.drop_path, self.depth)
        if self.pipeline_stages > 1:
            tokens = self._pipelined_trunk(tokens, deterministic, dpr)
        else:
            block_cls = Block
            if self.remat:
                policy = None
                if self.remat_policy == "dots":
                    policy = jax.checkpoint_policies.checkpoint_dots
                block_cls = nn.remat(Block, static_argnums=(2,), policy=policy)
            tokens = self._seq_constraint(tokens)
            for i in range(self.depth):
                # MoE lands in every moe_every-th block (2nd, 4th, ... —
                # the GShard/Switch "every other layer" convention)
                moe_here = (self.moe_experts > 0
                            and (i + 1) % self.moe_every == 0)
                blk = block_cls(
                    dim=D, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                    qkv_bias=True, proj_drop=self.drop_rate, attn_drop=self.drop_rate,
                    drop_path=float(dpr[i]), attention_impl=self.attention_impl,
                    gelu_tanh=self.gelu_approx == "tanh", quant=self.quant,
                    moe_experts=self.moe_experts if moe_here else 0,
                    moe_capacity_factor=self.moe_capacity_factor,
                    moe_top_k=self.moe_top_k,
                    dtype=self.dtype, param_dtype=self.param_dtype, name=f"blocks_{i}",
                )
                tokens = self._seq_constraint(blk(tokens, deterministic))
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="norm")(tokens)
        return tokens

    def _pipelined_trunk(self, tokens, deterministic, dpr):
        """Trunk via GPipe pipeline parallelism (parallel/pipeline.py).

        One Block template is shared across all depth positions; its params
        are created STACKED ([depth, ...]) under "blocks_stacked" and sharded
        P("stage") so each pipeline stage holds depth/stages blocks. Per-depth
        stochastic-depth rates are fed as data (DropPath call-time rate).
        Falls back to a sequential sweep over the stacked params — identical
        math — when no stage-capable mesh is in context (init, CPU tests,
        single-chip eval)."""
        from orbit2_tpu.parallel import pipeline as pp

        D = self.embed_dim
        S = self.pipeline_stages
        if self.depth % (S * self.pipeline_interleave):
            raise ValueError(
                f"depth {self.depth} not divisible by pipeline_stages x "
                f"interleave {S}x{self.pipeline_interleave}")
        if self.seq_shard:
            raise ValueError("pipeline_stages > 1 is incompatible with "
                             "seq_shard (v1 scope; see parallel/pipeline.py)")
        template = Block(
            dim=D, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=True, proj_drop=self.drop_rate, attn_drop=self.drop_rate,
            drop_path=0.0, attention_impl=self.attention_impl,
            gelu_tanh=self.gelu_approx == "tanh", quant=self.quant,
            dtype=self.dtype, param_dtype=self.param_dtype, parent=None,
        )

        V = self.pipeline_interleave

        def init_stacked(rng):
            # param shapes are impl-independent; init with the cheap naive
            # attention on a tiny token count
            t_init = template.clone(attention_impl="naive", parent=None)
            dummy = jnp.zeros((1, 8, D), self.dtype)
            trees = [
                t_init.init({"params": k}, dummy, True)["params"]
                for k in jax.random.split(rng, self.depth)
            ]
            flat = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
            return pp.to_interleaved(flat, S, V) if V > 1 else flat

        stacked = self.param(
            pp.STACKED_IV_KEY if V > 1 else pp.STACKED_KEY, init_stacked)

        rngs = {}
        if not deterministic:
            if self.has_rng("dropout"):
                rngs["dropout"] = self.make_rng("dropout")
            if self.has_rng("drop_path"):
                rngs["drop_path"] = self.make_rng("drop_path")

        def block_fn(p, x, rate, r):
            return template.apply({"params": p}, x, deterministic, rate,
                                  rngs=r or {})

        if self.remat:
            policy = (jax.checkpoint_policies.checkpoint_dots
                      if self.remat_policy == "dots" else None)
            block_fn = jax.checkpoint(block_fn, policy=policy)

        dpr_arr = jnp.asarray(dpr, jnp.float32)
        if pp.stage_mesh_size() == S:
            return pp.pipeline_blocks(
                block_fn, stacked, tokens, dpr_arr, stages=S,
                microbatches=self.pipeline_microbatches, interleave=V,
                rngs=rngs)
        return pp.apply_stacked_sequential(
            block_fn, stacked, tokens, dpr_arr, rngs=rngs, interleave=V)

    def _unpatchify(self, y, H, W):
        """[B, L, out*(mag*p)^2] -> [B, out, H*mag, W*mag].

        Exact reproduction of reference :167-179 with scaling=mag: the flat
        head output is re-chunked as an (H*mag/p, W*mag/p) grid of p x p
        patches — NOT an (H/p, W/p) grid of (mag*p)-patches. The arrangement
        is a fixed permutation either way, but checkpoint-import parity
        requires this exact one.
        """
        p = self.patch_size
        mag = self.superres_mag
        c = self.out_channels
        h = H * mag // p
        w = W * mag // p
        B = y.shape[0]
        y = y.reshape(B, h, w, p, p, c)
        y = jnp.einsum("nhwpqc->nchpwq", y)
        return y.reshape(B, c, h * p, w * p)
