"""Transformer building blocks (flax.linen).

Rebuild of reference models/hub/components/{attention.py, mlp.py,
vit_blocks.py}. The Megatron column/row weight splits and the hand-written
autograd collectives (F_Identity_B_AllReduce / all_reduce pairs,
attention.py:46-48, 84-85; mlp.py:59-71) do NOT appear here: tensor
parallelism is expressed as PartitionSpecs on the qkv/proj/fc1/fc2 kernels
(orbit2_tpu/parallel/sharding.py) and GSPMD inserts the identical collectives
— differentiable by construction.

Compute dtype is `dtype` (bf16 in production); parameters stay fp32
(`param_dtype`), replacing the reference's FSDP MixedPrecision policy
(intermediate_downscaling.py:601-607).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from orbit2_tpu.ops.attention import dot_product_attention
from orbit2_tpu.ops.dropout import dropout as fused_drop

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

Dtype = jnp.dtype


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath used at vit_blocks.py:61)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        # Stochastic depth draws from its OWN rng stream: a caller that
        # supplies only {"dropout": key} (MC-dropout ensembles) gets inert
        # DropPath, matching the reference's enable_dropout which flips ONLY
        # nn.Dropout modules to train mode (utils/mc_dropout.py:4-7).
        #
        # `rate` overrides self.rate at call time and may be a TRACED scalar
        # — the pipelined trunk (parallel/pipeline.py) shares one Block
        # template across stages and feeds each block its per-depth
        # stochastic-depth rate as data.
        if deterministic or not self.has_rng("drop_path"):
            return x
        if rate is None:
            if self.rate == 0.0:
                return x
            rate = self.rate
        rng = self.make_rng("drop_path")
        keep = 1.0 - rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerScale(nn.Module):
    """Reference vit_blocks.py:9-21."""

    dim: int
    init_values: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,),
            self.param_dtype,
        )
        return x * gamma.astype(x.dtype)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree ({kernel, bias}) so
    the fused and unfused MLP paths share one checkpoint layout."""

    in_features: int
    features: int
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init,
                       (self.in_features, self.features), self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.features,), self.param_dtype)
             if self.use_bias else None)
        return k, b


class QDense(nn.Module):
    """w8a8 serving replacement for an nn.Dense.

    Declares {kernel_q int8, kernel_scale f32, bias} at the SAME module path
    as the Dense it replaces (same `name=`), so
    orbit2_tpu/utils/quantize.py::quantize_params maps a trained fp
    checkpoint onto it leaf-for-leaf. Serving-only: no gradient exists
    through the round() in the activation quantizer.
    """

    in_features: int
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from orbit2_tpu.ops.quant import w8a8_matmul

        wq = self.param("kernel_q", nn.initializers.zeros,
                        (self.in_features, self.features), jnp.int8)
        ws = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return w8a8_matmul(x.astype(self.dtype), wq, ws, b)


class Mlp(nn.Module):
    """fc1 -> GELU -> drop -> fc2 -> drop (reference mlp.py:22-73).

    Always the plain XLA chain on the model path. The pallas fused-MLP
    kernel (ops/fused_mlp.py) beats XLA by ~1.8 ms/layer in ISOLATION but
    loses at model level in every measured configuration — training
    (~17 ms/step at 117M) AND deterministic forwards (117M fwd 146.8 ms
    with vs 58.7 ms without; 1B 167.7 vs 87–121 — serialized-iteration
    methodology, scripts/bench_fusedmlp_gate.py). The round-3 "fused wins
    eval by 7.6%" gate was an unchained-timing artifact; the custom-call
    boundary blocks XLA's cross-layer fusion/scheduling, which outweighs
    keeping the hidden stripe in VMEM. `use_fused=True` re-enables it for
    experiments (single TPU device, deterministic, erf GELU only)."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    use_bias: bool = True
    # tanh-approx GELU: measured -4.5% trunk step time at 117M
    # (scripts/bench_r4_fusion.py, docs/performance.md) — opt-in because the
    # default erf form is the torch-reference-parity numerics
    gelu_tanh: bool = False
    # "w8a8": int8 serving path (ops/quant.py) — deterministic only
    quant: str = "none"
    # opt-in pallas fused-MLP kernel — measured LOSING at model level
    # everywhere (see class docstring); kept for experiments
    use_fused: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        if self.quant == "w8a8":
            if not deterministic:  # not assert: must survive python -O
                raise ValueError(
                    "w8a8 quantization is serving-only: the rounded int8 "
                    "path is piecewise-constant and carries zero gradient")
            xd = x.astype(self.dtype)
            h = QDense(x.shape[-1], self.hidden_features, self.use_bias,
                       self.dtype, name="fc1")(xd)
            h = nn.gelu(h, approximate=self.gelu_tanh)
            return QDense(self.hidden_features, out_features, self.use_bias,
                          self.dtype, name="fc2")(h)
        k1, b1 = _DenseParams(x.shape[-1], self.hidden_features,
                              self.use_bias, self.param_dtype, name="fc1")()
        k2, b2 = _DenseParams(self.hidden_features, out_features,
                              self.use_bias, self.param_dtype, name="fc2")()
        xd = x.astype(self.dtype)
        if self.use_fused and deterministic and not self.gelu_tanh:
            from orbit2_tpu.ops.fused_mlp import fused_mlp

            fused = fused_mlp(  # erf-exact kernel; declines off-TPU/meshed
                xd, k1.astype(self.dtype),
                None if b1 is None else b1.astype(self.dtype),
                k2.astype(self.dtype),
                None if b2 is None else b2.astype(self.dtype))
            if fused is not None:
                return fused

        h = xd @ k1.astype(self.dtype)
        if b1 is not None:
            h = h + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=self.gelu_tanh)
        h = fused_drop(h, self.drop, deterministic,
                       lambda: self.make_rng("dropout"))
        out = h @ k2.astype(self.dtype)
        if b2 is not None:
            out = out + b2.astype(self.dtype)
        out = fused_drop(out, self.drop, deterministic,
                         lambda: self.make_rng("dropout"))
        return out


class Attention(nn.Module):
    """Self attention with selectable kernel (reference attention.py:12-87)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attention_impl: str = "xla"
    # "w8a8": int8 qkv/proj for serving (ops/quant.py); attention itself
    # (softmax(qk^T)v) stays bf16 — matching the measured probe
    quant: str = "none"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        if self.quant == "w8a8":
            if not deterministic:  # not assert: must survive python -O
                raise ValueError(
                    "w8a8 quantization is serving-only: the rounded int8 "
                    "path is piecewise-constant and carries zero gradient")
            qkv = QDense(C, self.dim * 3, self.qkv_bias, self.dtype,
                         name="qkv")(x)
        else:
            qkv = nn.Dense(
                self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                param_dtype=self.param_dtype, kernel_init=trunc_normal_init,
                name="qkv",
            )(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="k_norm")(k)

        drop_rate = 0.0 if deterministic else self.attn_drop
        rng = self.make_rng("dropout") if drop_rate > 0.0 else None
        x = dot_product_attention(
            q, k, v, impl=self.attention_impl, dropout_rate=drop_rate, dropout_rng=rng
        )
        x = x.reshape(B, N, C)
        if self.quant == "w8a8":
            x = QDense(C, self.dim, self.proj_bias, self.dtype,
                       name="proj")(x)
        else:
            x = nn.Dense(
                self.dim, use_bias=self.proj_bias, dtype=self.dtype,
                param_dtype=self.param_dtype, kernel_init=trunc_normal_init,
                name="proj",
            )(x)
        x = fused_drop(x, self.proj_drop, deterministic,
                       lambda: self.make_rng("dropout"))
        return x


class VariableMappingAttention(nn.Module):
    """Cross attention collapsing V variable token streams to one aggregated
    stream (reference attention.py:98-183). Query comes from a learnable
    var_query; keys/values from the per-variable tokens.

    TPU-first math: because the query is a single learned vector shared by
    every (batch, token) position, the cross-attention is algebraically
    reduced (exactly — same parameters, same function):
      * scores: k_v . q_h == x_v . (W_k[:, h] q_h) — one [D, H] projection
        `u` replaces the full V-stream key projection (D x D per token)
      * values: sum_v attn_vh (W_v x_v)_h == W_v[h] (sum_v attn_vh x_v) —
        the weighted sum runs in input space, then ONE value projection
    This cuts the var-agg matmul cost from ~3 V D^2 to ~D^2 per token while
    producing identical outputs to the reference formulation.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attention_impl: str = "xla"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, var_query, x, deterministic: bool = True):
        """var_query: [1, 1, C] (learned, position-independent);
        x: [B', V, C] where B' = B*L. Returns [B', 1, C]."""
        Bp, N_i, C = x.shape
        H = self.num_heads
        head_dim = self.dim // H
        scale = head_dim**-0.5

        # parameters keep the reference's shapes: q (C, D), kv (C, 2D)
        q_kernel = self.param("q_kernel", trunc_normal_init, (C, self.dim),
                              self.param_dtype)
        kv_kernel = self.param("kv_kernel", trunc_normal_init,
                               (C, 2 * self.dim), self.param_dtype)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,),
                                self.param_dtype)
            kv_bias = self.param("kv_bias", nn.initializers.zeros,
                                 (2 * self.dim,), self.param_dtype)

        w_k = kv_kernel[:, : self.dim].astype(self.dtype)    # (C, D)
        w_v = kv_kernel[:, self.dim :].astype(self.dtype)    # (C, D)

        # q: one vector per head, computed once (not per B*L position)
        q = var_query[0, 0].astype(self.dtype) @ q_kernel.astype(self.dtype)
        if self.qkv_bias:
            q = q + q_bias.astype(self.dtype)
        q_heads = q.reshape(H, head_dim)

        # u[:, h] = W_k[:, h-slice] @ q_h  -> scores via one (C, H) matrix
        u = jnp.einsum("chd,hd->ch", w_k.reshape(C, H, head_dim), q_heads)
        scores = jnp.einsum("bvc,ch->bvh", x.astype(self.dtype), u) * scale
        if self.qkv_bias:
            kb = kv_bias[: self.dim].astype(self.dtype).reshape(H, head_dim)
            scores = scores + jnp.einsum("hd,hd->h", kb, q_heads)[None, None, :] * scale

        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(self.dtype)
        if not deterministic and self.attn_drop > 0.0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.attn_drop, attn.shape)
            attn = jnp.where(keep, attn / (1.0 - self.attn_drop), 0.0)

        # weighted sum in input space, then one value projection per head
        y = jnp.einsum("bvh,bvc->bhc", attn, x.astype(self.dtype))  # [B', H, C]
        vals = jnp.einsum("bhc,chd->bhd", y, w_v.reshape(C, H, head_dim))
        if self.qkv_bias:
            vals = vals + kv_bias[self.dim :].astype(self.dtype).reshape(1, H, head_dim)
        out = vals.reshape(Bp, 1, self.dim)

        out = nn.Dense(
            self.dim, use_bias=self.proj_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal_init, name="proj",
        )(out)
        out = fused_drop(out, self.proj_drop, deterministic,
                         lambda: self.make_rng("dropout"))
        return out


class Block(nn.Module):
    """Pre-LN transformer block (reference vit_blocks.py:25-81):
    x = x + DropPath(LS(Attn(LN(x)))); x = x + DropPath(LS(Mlp(LN(x))))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_bias: bool = True
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    attention_impl: str = "xla"
    gelu_tanh: bool = False
    quant: str = "none"
    # moe_experts > 0 swaps the dense Mlp for a MoEMlp (expert-parallel
    # mixture of experts — models/components/moe.py); the reference has no
    # MoE, this is the `ep` slot of the parallelism taxonomy
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_top_k: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_path_rate=None):
        # drop_path_rate: optional call-time (possibly traced) override of
        # the static drop_path — see DropPath.__call__
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm1")(x)
        y = Attention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm, proj_bias=self.proj_bias, attn_drop=self.attn_drop,
            proj_drop=self.proj_drop, attention_impl=self.attention_impl,
            quant=self.quant, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn",
        )(y, deterministic)
        if self.init_values:
            y = LayerScale(self.dim, self.init_values, self.param_dtype, name="ls1")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(
            y, deterministic, drop_path_rate)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm2")(x)
        if self.moe_experts > 0:
            from orbit2_tpu.models.components.moe import MoEMlp

            if self.quant != "none":
                # expert FFNs have no int8 path yet; silently serving them
                # unquantized would misrepresent w8a8 eval numbers
                raise ValueError(
                    "quant != 'none' is not supported for MoE blocks "
                    "(moe_experts > 0): the expert FFN has no quantized "
                    "path; serve the model with quant='none'")
            y = MoEMlp(
                dim=self.dim,
                hidden_features=int(self.dim * self.mlp_ratio),
                num_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                top_k=self.moe_top_k, drop=self.proj_drop,
                gelu_tanh=self.gelu_tanh,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="moe_mlp",
            )(y, deterministic)
        else:
            y = Mlp(
                hidden_features=int(self.dim * self.mlp_ratio), drop=self.proj_drop,
                use_bias=self.proj_bias, gelu_tanh=self.gelu_tanh,
                quant=self.quant, dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp",
            )(y, deterministic)
        if self.init_values:
            y = LayerScale(self.dim, self.init_values, self.param_dtype, name="ls2")(y)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic, drop_path_rate)
        return x
