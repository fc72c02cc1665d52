"""Ring attention over the sequence-parallel axis.

Lifts the KV-gather seq-parallel memory bound (ops/seq_attention.py
all-gathers full k/v: 2·N·H·D bytes per device — 4.3GB at the 260k-token
full-globe case): here k/v chunks ppermute around the `seq` ICI ring, so
per-device K/V memory stays O(N/seq) while each hop's transfer overlaps the
flash kernel on the resident chunk (compute per hop ~N_local² vs transfer
~N_local — compute-bound for realistic shapes).

Fills the reference's `seq_par` slot (intermediate_downscaling.py:165 — a
stub upstream) beyond round 1's gather variant.

Structure: ONE custom_vjp around the whole ring.
  fwd: per hop, the one-shot/streaming flash kernel (ops/flash_attention.py)
       returns the chunk's (o_j, lse_j); partials combine in log2 space with
       a running max — the final (o, lse) is bit-for-bit the softmax over
       the full sequence.
  bwd: the standard flash-attention-2 decomposition against the GLOBAL lse:
       per hop the existing dq/dkv kernels produce dq += dq_j and chunk
       partials (dk_j, dv_j) that rotate WITH their chunk; after a full
       cycle every accumulator is home with all devices' contributions.

Attention-prob dropout is not supported on the ring path (masks would need
global chunk indexing across hops); the KV-gather path handles dropout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from orbit2_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_K,
    DEFAULT_BLOCK_Q,
    _flash_bwd,
    _flash_fwd,
)


def _perm(axis_name):
    n = jax.lax.axis_size(axis_name)
    return [(i, (i + 1) % n) for i in range(n)]


def _fit_block(n: int, cap: int) -> int:
    """Largest multiple of 128 that divides n and is <= cap. The flash grids
    floor-divide (n // block), so a block that does not divide n would
    silently skip tail rows/tokens — block choice must be exact."""
    b = min(cap, n)
    b -= b % 128
    while b > 128 and n % b:
        b -= 128
    return max(b, 128)


def _chunk_fwd(q, k, v, sm_scale, block_q, block_k):
    seed = jnp.zeros((1,), jnp.int32)
    bq = _fit_block(q.shape[1], block_q)
    bk = _fit_block(k.shape[1], block_k)
    o, lse = _flash_fwd(q, k, v, seed, sm_scale, bq, bk, k.shape[1], 0.0)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_core(q, k, v, axis_name, sm_scale, block_q, block_k):
    o, _ = _ring_fwd_impl(q, k, v, axis_name, sm_scale, block_q, block_k)
    return o


def _ring_fwd_impl(q, k, v, axis_name, sm_scale, block_q, block_k):
    bh, n_l, d = q.shape
    steps = jax.lax.axis_size(axis_name)
    perm = _perm(axis_name)

    def body(_, carry):
        m, num, den, k_cur, v_cur = carry
        o_j, lse8 = _chunk_fwd(q, k_cur, v_cur, sm_scale, block_q, block_k)
        lse_j = lse8[:, 0, :]                       # [BH, N_l] base-2
        m_new = jnp.maximum(m, lse_j)
        c_old = jnp.exp2(m - m_new)
        c_new = jnp.exp2(lse_j - m_new)
        num = num * c_old[..., None] + o_j.astype(jnp.float32) * c_new[..., None]
        den = den * c_old + c_new
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m_new, num, den, k_nxt, v_nxt

    init = (jnp.full((bh, n_l), -jnp.inf, jnp.float32),
            jnp.zeros((bh, n_l, d), jnp.float32),
            jnp.zeros((bh, n_l), jnp.float32),
            k, v)
    m, num, den, _, _ = jax.lax.fori_loop(0, steps, body, init)
    o = (num / den[..., None]).astype(q.dtype)
    lse = m + jnp.log2(den)                          # global base-2 lse
    lse8 = jnp.broadcast_to(lse[:, None, :], (bh, 8, n_l))
    return o, lse8


def _ring_core_fwd(q, k, v, axis_name, sm_scale, block_q, block_k):
    o, lse8 = _ring_fwd_impl(q, k, v, axis_name, sm_scale, block_q, block_k)
    return o, (q, k, v, o, lse8)


def _ring_core_bwd(axis_name, sm_scale, block_q, block_k, res, do):
    q, k, v, o, lse8 = res
    bh, n_l, d = q.shape
    steps = jax.lax.axis_size(axis_name)
    perm = _perm(axis_name)
    seed = jnp.zeros((1,), jnp.int32)
    bq = _fit_block(n_l, block_q)
    bk = _fit_block(n_l, block_k)

    def body(_, carry):
        dq, k_cur, v_cur, dk_cur, dv_cur = carry
        dq_j, dk_j, dv_j, _ = _flash_bwd(
            sm_scale, bq, bk, n_l, 0.0, None,
            (q, k_cur, v_cur, seed, o, lse8), do)
        dq = dq + dq_j.astype(jnp.float32)
        dk_cur = dk_cur + dk_j.astype(jnp.float32)
        dv_cur = dv_cur + dv_j.astype(jnp.float32)
        # rotate the chunk together with its gradient accumulators: after a
        # full cycle both are back on the chunk's home device
        k_cur, v_cur, dk_cur, dv_cur = (
            jax.lax.ppermute(t, axis_name, perm)
            for t in (k_cur, v_cur, dk_cur, dv_cur))
        return dq, k_cur, v_cur, dk_cur, dv_cur

    init = (jnp.zeros((bh, n_l, d), jnp.float32), k, v,
            jnp.zeros((bh, n_l, d), jnp.float32),
            jnp.zeros((bh, n_l, d), jnp.float32))
    dq, _, _, dk, dv = jax.lax.fori_loop(0, steps, body, init)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_flash_attention(q, k, v, axis_name: str,
                         sm_scale: Optional[float] = None,
                         block_q: Optional[int] = None,
                         block_k: Optional[int] = None):
    """q/k/v: LOCAL shards [B, N_local, H, D] inside shard_map over
    `axis_name`. Returns [B, N_local, H, D]. N_local must be a multiple of
    128 (TPU lane tiling); no padding on the ring path."""
    b, n_l, h, d = q.shape
    if n_l % 128:
        raise ValueError(f"ring attention needs N_local % 128 == 0, got {n_l}")
    sm_scale = d**-0.5 if sm_scale is None else sm_scale
    from orbit2_tpu.ops.flash_attention import scale_block_for_head_dim

    # d-aware scaling applies only to the defaults; explicit blocks win
    if block_q is None:
        block_q = scale_block_for_head_dim(DEFAULT_BLOCK_Q, d)
    if block_k is None:
        block_k = scale_block_for_head_dim(DEFAULT_BLOCK_K, d)

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n_l, d)

    o = _ring_core(to_bhnd(q), to_bhnd(k), to_bhnd(v), axis_name, sm_scale,
                   block_q, block_k)
    return o.reshape(b, h, n_l, d).transpose(0, 2, 1, 3)
