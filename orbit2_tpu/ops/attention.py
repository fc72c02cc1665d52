"""Attention implementation dispatch.

The reference selects between three kernels per dtype (FusedAttn.{CK, DEFAULT,
NONE}, reference models/hub/components/attention.py:54-78, chosen at
intermediate_downscaling.py:461-464). The TPU equivalents:

  * "pallas" — Pallas flash attention (ops/flash_attention.py), the CK
    replacement; used when shapes are tile-aligned. Attention-prob dropout
    runs INSIDE the kernel via the TPU PRNG (mask regenerated identically in
    fwd and both bwd kernels) — no [B,H,N,N] mask ever reaches HBM.
  * "xla"    — plain jnp softmax attention that XLA fuses well (SDPA
    equivalent), supports attention dropout.
  * "naive"  — same math, kept as an explicit always-works fallback.

All functions take q, k, v as [B, N, H, Dh] ("BNHD") and return [B, N, H, Dh].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _sdpa(q, k, v, scale: float, dropout_rate: float = 0.0,
          dropout_rng: Optional[jax.Array] = None):
    # [B, N, H, D] -> heads-major compute
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(
    q,
    k,
    v,
    impl: str = "xla",
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """q: [B, Nq, H, Dh]; k/v: [B, Nk, H, Dh]."""
    head_dim = q.shape[-1]
    scale = head_dim**-0.5 if scale is None else scale

    if impl == "auto":
        impl = resolve_impl(impl, q.dtype)

    if impl == "pallas":
        from orbit2_tpu.ops.flash_attention import flash_attention, flash_supported

        if flash_supported(q, k, v):
            from orbit2_tpu.ops.seq_attention import (
                batch_flash_attention,
                data_mesh_active,
                seq_flash_attention,
                seq_mesh_active,
            )

            if seq_mesh_active():
                # GSPMD can't partition a pallas_call over the seq axis;
                # shard_map keeps q token-sharded and all-gathers k/v
                return seq_flash_attention(q, k, v, sm_scale=scale,
                                           dropout_rate=dropout_rate,
                                           dropout_rng=dropout_rng)
            if data_mesh_active():
                # dp/fsdp/tp mesh without seq sharding: run the kernel
                # per-device under shard_map (a bare pallas_call would be
                # GSPMD-opaque and replicate the full activation)
                out = batch_flash_attention(q, k, v, sm_scale=scale,
                                            dropout_rate=dropout_rate,
                                            dropout_rng=dropout_rng)
                if out is not None:
                    return out
                impl = "xla"  # indivisible shapes: partitionable fallback
            else:
                # attention-prob dropout runs INSIDE the kernel (TPU PRNG) —
                # the XLA fallback would materialize [B,H,N,N] probs + u32
                # masks, which ablations showed dominates the train step
                return flash_attention(q, k, v, sm_scale=scale,
                                       dropout_rate=dropout_rate,
                                       dropout_rng=dropout_rng)
        else:
            impl = "xla"  # graceful fallback

    if impl in ("xla", "naive"):
        return _sdpa(q, k, v, scale, dropout_rate, dropout_rng)
    raise ValueError(f"unknown attention impl {impl!r}")


def resolve_impl(requested: str, dtype) -> str:
    """'auto' -> pallas for bf16 on TPU, else xla — mirroring the reference's
    dtype-based kernel pick (intermediate_downscaling.py:461-464)."""
    if requested != "auto":
        return requested
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and dtype == jnp.bfloat16:
        return "pallas"
    return "xla"
