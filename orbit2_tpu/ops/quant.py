"""w8a8 int8 quantized matmul for serving (deterministic forwards).

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS). Measured on-chip (scripts/bench_int8_probe.py, round 4): XLA lowers
int8 `dot_general` to the fast path at ~1.3x realized speedup on the 1B
trunk matmul shapes, and a full trunk-layer chain with per-row dynamic
activation quantization + rescale epilogues keeps 1.285x end-to-end at 1B
serving shapes (b2 x 2048 tok, D=3072) with 2.3% relative output RMSE.
At MODEL level (whole ResSlimViT deterministic forward,
scripts/bench_w8a8_serving.py) the win is ~1.9x vs the best bf16 forward
at 1B with ~1% relative output RMSE; opt-in via
`evaluate.py --quant w8a8` / `Trainer.test(quant="w8a8")`, never a
default — training numerics are untouched.

Scheme (the standard dynamic w8a8):
  * weights: per-output-channel symmetric int8, quantized ONCE offline
    (orbit2_tpu/utils/quantize.py) — also halves serving HBM for the trunk;
  * activations: per-row (per-token) dynamic symmetric int8, quantized
    in-graph (two cheap VPU passes, fused by XLA);
  * accumulate int32 on the MXU, rescale by (row_scale x col_scale).

No gradients: `jnp.round` is piecewise-constant, so this path is
serving-only — the model modules assert deterministic=True when active.

Reference slot: this accelerates the same deterministic forward the
reference runs through xformers CK fused attention + cuDNN GEMMs
(attention.py:54-65); the reference has no quantized path at all.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization of a [K, N] kernel.

    Returns (wq int8 [K, N], scale float32 [N]) with w ~= wq * scale.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return wq, scale


def w8a8_matmul(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """x [..., K] @ dequant(wq [K, N]) with dynamic per-row activation quant.

    The int8 dot accumulates int32 on the MXU double-rate path; the rescale
    epilogue multiplies by (per-row activation scale) x (per-column weight
    scale) in fp32 and casts to `out_dtype` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
