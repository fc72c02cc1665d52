"""Pallas TPU flash attention (forward + backward).

The TPU replacement for the reference's xformers Composable-Kernel fused
attention (reference models/hub/components/attention.py:54-65, selected for
bf16 at intermediate_downscaling.py:461-464). Non-causal, full attention —
climate SR attends over the whole tile.

Design (per pallas_guide.md):
  * arrays reshaped to [B*H, N, D]; grid = (B*H, N // BLOCK_Q)
  * each program holds one q block [BLOCK_Q, D] in VMEM and streams k/v in
    BLOCK_K chunks via a fori_loop with a running (max, sum, acc) online
    softmax — scores never hit HBM (the memory win over naive SDPA)
  * bf16 inputs, fp32 accumulation (preferred_element_type), bf16 out
  * backward = two kernels: dq over q blocks, dk/dv over k blocks, both
    recomputing probabilities from the saved logsumexp (standard
    flash-attention-2 recipe), wired up with jax.custom_vjp
  * padding: the wrapper pads N up to a block multiple; masked lanes get
    -inf scores (static masks — shapes are compile-time constants)

For ~260k-token full-globe inference this kernel keeps only O(BLOCK_Q * N)
VMEM live per program; the seq-parallel axis (M5) will shard N itself.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30


def _interpret() -> bool:
    """Interpreter mode off-TPU so kernels are testable on the CPU mesh."""
    return jax.default_backend() != "tpu"



def flash_supported(q, k, v) -> bool:
    """Cheap static check used by the dispatcher (ops/attention.py)."""
    if jax.default_backend() != "tpu":
        return False
    if q.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    n_q, n_k, d = q.shape[1], k.shape[1], q.shape[-1]
    if d > 256:
        return False
    return n_q >= 128 and n_k >= 128


# ---- forward ----------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    block_q, d = q.shape
    n_k_pad = k_ref.shape[1]
    num_kb = n_k_pad // block_k

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [BQ, BK]
        # mask padded kv positions (static kv_len)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + kb * block_k < kv_len, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse stored sublane-replicated (8, block_q): TPU blocks need the
    # second-to-last dim divisible by 8 (see pallas_guide tiling constraints)
    lse_row = (m + jnp.log(l))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _flash_fwd(q, k, v, sm_scale, block_q, block_k, kv_len):
    """q/k/v: [BH, N, D] (padded). kv_len = true (unpadded) kv length.
    Returns (o, lse)."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    grid = (bh, n_q // block_q)

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, block_k=block_k,
                          kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, n_q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_q * n_k * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * n_q * n_k,
        ),
        interpret=_interpret(),
    )(q, k, v)
    return o, lse


# ---- backward ---------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               sm_scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :][:, None]
    delta = delta_ref[0, 0, :][:, None]
    block_q, d = q.shape
    num_kb = k_ref.shape[1] // block_k

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + kb * block_k < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, sm_scale, block_q, q_len):
    k = k_ref[0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    num_qb = q_ref.shape[1] // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        # s_T: [BK, BQ]
        s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * sm_scale
        row_q = jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
        s_t = jnp.where(row_q + qb * block_q < q_len, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lse.T)
        dv = dv + jax.lax.dot_general(p_t, do, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = p_t * (dp_t - delta.T) * sm_scale
        dk = dk + jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(sm_scale, block_q, block_k, kv_len, res, do):
    q, k, v, o, lse = res
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    delta_row = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta_row[:, None, :], (bh, 8, n_q))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, block_k=block_k,
                          kv_len=kv_len),
        grid=(bh, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, block_q=block_q,
                          q_len=n_q),
        grid=(bh, n_k // block_k),
        in_specs=[
            pl.BlockSpec((1, n_q, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_q), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_q), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---- public wrapper ---------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, sm_scale, block_q, block_k, kv_len):
    o, _ = _flash_fwd(q, k, v, sm_scale, block_q, block_k, kv_len)
    return o


def _flash_core_fwd(q, k, v, sm_scale, block_q, block_k, kv_len):
    o, lse = _flash_fwd(q, k, v, sm_scale, block_q, block_k, kv_len)
    return o, (q, k, v, o, lse)


_flash_core.defvjp(_flash_core_fwd, _flash_bwd)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(q, k, v, sm_scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """q/k/v: [B, N, H, D] (BNHD like ops.attention); returns [B, N, H, D]."""
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    sm_scale = d**-0.5 if sm_scale is None else sm_scale

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    n_q_pad = math.ceil(n_q / block_q) * block_q
    n_k_pad = math.ceil(n_k / block_k) * block_k
    qf = _pad_to(qf, n_q_pad, 1)
    kf = _pad_to(kf, n_k_pad, 1)
    vf = _pad_to(vf, n_k_pad, 1)

    o = _flash_core(qf, kf, vf, sm_scale, block_q, block_k, n_k)
    o = o[:, :n_q].reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    return o
