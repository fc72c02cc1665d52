"""Pallas TPU flash attention (forward + backward).

The TPU replacement for the reference's xformers Composable-Kernel fused
attention (reference models/hub/components/attention.py:54-65, selected for
bf16 at intermediate_downscaling.py:461-464). Non-causal, full attention —
climate SR attends over the whole tile.

Design (per pallas_guide.md):
  * arrays reshaped to [B*H, N, D]; 3D grid (B*H/G, N_q/BQ, N_k/BK) with the
    k dimension innermost ("arbitrary" semantics) so k/v stream through VMEM
    block by block while the online-softmax state (m, l, acc) lives in VMEM
    scratch — N_k is unbounded by VMEM (full-globe ~260k tokens works)
  * G batch-head pairs are packed per program (unrolled in-kernel loop):
    at head_dim 64 the two matmuls use half the MXU's K/N width and per-
    program overhead dominates — packing amortizes it across G heads
    (measured on v5e: G=4 lifts the fwd kernel ~38 -> ~60+ TFLOPS @ d64)
  * bf16 inputs, fp32 accumulation (preferred_element_type), bf16 out
  * logsumexp saved sublane-replicated (bh, 8, N_q) to satisfy TPU tiling
  * backward = two kernels (flash-attention-2 recipe): dq streams k/v with a
    (B*H/G, N_q/BQ, N_k/BK) grid; dk/dv streams q/do with a
    (B*H/G, N_k/BK, N_q/BQ) grid, probabilities recomputed from the saved lse
  * padding: the wrapper pads N up to block multiples; padded k/v columns are
    masked to -inf (static masks), padded q rows are harmless (do == 0)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024       # r2 sweep: best fwd+grad total (one-shot fwd)
DEFAULT_BLOCK_Q_DROPOUT = 512  # dropout bits add BQxBK u32 to VMEM: 1024 OOMs
DEFAULT_BLOCK_K = 2048  # swept on v5e: bk=2048 38 TFLOPS vs bk=512 23 (docs/performance.md)
DEFAULT_GROUP = 1       # >1 measured neutral-to-worse and can OOM the compiler
_NEG_INF = -1e30
# softmax runs in base 2 (exp2/log2): cheaper than e-base exp on the VPU.
# The saved "lse" is base-2 (m2 + log2(l)); only these kernels consume it.
_LOG2E = 1.4426950408889634


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


def scale_block_for_head_dim(block: int, d: int) -> int:
    """Block defaults were swept at head dim 64; per-program VMEM scales
    ~linearly with d, so halve the block per d-doubling (10B-scale models
    run d=256 — unscaled blocks blow the 16MB scoped vmem in the backward
    kernels). Stays a multiple of 128."""
    while d > 64 and block > 128:
        d //= 2
        block //= 2
    return block


def _pick_group(bh: int, block_k: int, n_k: int, d: int, group=None) -> int:
    """Largest G dividing B*H under a VMEM budget: k+v blocks are the
    footprint drivers at (G, BK, D) bf16 each, double-buffered."""
    if group is not None:
        g = int(group)
    else:
        # ~8MB for double-buffered k+v leaves room for q/o/acc/s temporaries
        budget = 8 * 1024 * 1024
        per = 2 * block_k * d * 2 * 2  # k and v, bf16, double-buffered
        g = max(1, min(DEFAULT_GROUP, budget // max(per, 1)))
    while g > 1 and bh % g:
        g -= 1
    return max(1, g)


def _mask_cols(s, kb, block_k, kv_len, padded_len=None):
    """-inf for padded kv columns. Static no-op when nothing is padded —
    the kernel is VPU-bound, so skipping this full pass over the scores
    matters in the common unpadded case."""
    if padded_len is not None and kv_len == padded_len:
        return s
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col + kb * block_k < kv_len, s, _NEG_INF)


def _dropout_mult(seed_ref, bh, i, kb, shape, drop_rate):
    """Reproducible per-(batch*head, q-block, k-block) dropout multiplier
    mask/keep of `shape` == (BQ, BK). Seeded so forward and both backward
    kernels regenerate the identical mask (fwd grid (bh,i,kb); dkv grid maps
    (bh,j,qb) -> (bh, i=qb, kb=j)). `bh` is the FLAT batch*head index
    (group-packed kernels pass g*G+sub), so masks are invariant to G.
    Bit generation is shared with the fused elementwise dropout
    (ops/kernel_prng.py) — hardware PRNG on TPU, murmur3 hash under the
    interpreter."""
    from orbit2_tpu.ops.kernel_prng import keep_mult

    block_seed = seed_ref[0] + bh * 1000003 + i * 7919 + kb
    return keep_mult(block_seed, shape, drop_rate)


# ---- forward ----------------------------------------------------------------

def _fwd_kernel_oneshot(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                        sm_scale, block_k, kv_len, padded_len, drop_rate,
                        group):
    """Single-k-block specialization (kv fits one block — the production
    2048-token case): plain one-shot softmax, no online m/l scratch, no
    rescale passes, no @pl.when epilogue. Measured on v5e @ B8 N2048 H16 d64:
    44.1 TF vs 34.4 for the streaming kernel (matmul-pair ceiling 48.2)."""
    gi = pl.program_id(0)
    i = pl.program_id(1)

    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (sm_scale * _LOG2E)
        s = _mask_cols(s, 0, block_k, kv_len, padded_len)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if drop_rate > 0.0:
            # same (bh, q-block, k-block=0) mask as the streaming kernel, so
            # the backward kernels regenerate it unchanged
            p = p * _dropout_mult(seed_ref, gi * group + g, i, 0, p.shape,
                                  drop_rate)
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[g] = (acc / l).astype(o_ref.dtype)
        lse = (m + jnp.log2(l))[:, 0]
        lse_ref[g] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                acc_ref, *, sm_scale, block_k, kv_len, padded_len, drop_rate,
                group):
    gi = pl.program_id(0)
    i = pl.program_id(1)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for g in range(group):
        # keep matmul inputs in their native (bf16) dtype: the MXU's bf16
        # path with fp32 accumulation is ~2x the f32 path
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (sm_scale * _LOG2E)
        s = _mask_cols(s, kb, block_k, kv_len, padded_len)

        m_prev = m_ref[g]
        l_prev = l_ref[g]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        m_ref[g] = m_new
        l_ref[g] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if drop_rate > 0.0:
            # dropout after softmax (torch SDPA semantics): the normalizer l
            # uses undropped p; only the value-accumulation path is masked
            p = p * _dropout_mult(seed_ref, gi * group + g, i, kb, p.shape,
                                  drop_rate)
        acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        l = l_ref[:]
        o_ref[:] = (acc_ref[:] / l).astype(o_ref.dtype)
        lse = (m_ref[:] + jnp.log2(l))[:, :, 0]  # (G, BQ) base-2 lse
        # sublane-replicated (G, 8, BQ): TPU blocks need 2nd-to-last dim % 8
        lse_ref[:] = jnp.broadcast_to(lse[:, None, :], lse_ref.shape)


def _flash_fwd(q, k, v, seed, sm_scale, block_q, block_k, kv_len, drop_rate,
               group=None):
    """q/k/v: [BH, N, D] (padded). kv_len = true (unpadded) kv length."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    g = _pick_group(bh, block_k, n_k, d, group)
    cost = pl.CostEstimate(
        flops=4 * bh * n_q * n_k * d,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
        transcendentals=bh * n_q * n_k,
    )

    if n_k == block_k:  # whole kv in one block: one-shot softmax, no scratch
        o, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_oneshot, sm_scale=sm_scale,
                              block_k=block_k, kv_len=kv_len, padded_len=n_k,
                              drop_rate=drop_rate, group=g),
            grid=(bh // g, n_q // block_q),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((g, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, block_k, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, block_k, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((g, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 8, block_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
                jax.ShapeDtypeStruct((bh, 8, n_q), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=cost,
            interpret=_interpret(),
        )(seed, q, k, v)
        return o, lse

    grid = (bh // g, n_q // block_q, n_k // block_k)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, block_k=block_k,
                          kv_len=kv_len, padded_len=n_k, drop_rate=drop_rate,
                          group=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g, block_q, d), lambda b, i, kb: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, i, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, i, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, block_q, d), lambda b, i, kb: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, block_q), lambda b, i, kb: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, n_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((g, block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((g, block_q, d), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=_interpret(),
    )(seed, q, k, v)
    return o, lse


# ---- backward ---------------------------------------------------------------

def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, acc_ref, *, sm_scale, block_k, kv_len, padded_len,
               drop_rate, group):
    gi = pl.program_id(0)
    i = pl.program_id(1)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for g in range(group):
        q = q_ref[g]
        do = do_ref[g]
        lse = lse_ref[g, 0, :][:, None]
        delta = delta_ref[g, 0, :][:, None]
        k = k_ref[g]
        v = v_ref[g]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (sm_scale * _LOG2E)
        s = _mask_cols(s, kb, block_k, kv_len, padded_len)
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if drop_rate > 0.0:
            # dp flows through the dropout mask; delta = rowsum(do*o) already
            # equals rowsum(p_dropped * dy), so the standard identity holds
            dp = dp * _dropout_mult(seed_ref, gi * group + g, i, kb, dp.shape,
                                    drop_rate)
        ds = p * (dp - delta) * sm_scale
        acc_ref[g] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        dq_ref[:] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale, block_q, q_len,
                drop_rate, group):
    gi = pl.program_id(0)
    j = pl.program_id(1)
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for g in range(group):
        k = k_ref[g]
        v = v_ref[g]
        q = q_ref[g]
        do = do_ref[g]
        lse = lse_ref[g, 0, :][:, None]
        delta = delta_ref[g, 0, :][:, None]

        # s_T: [BK, BQ]; padded q rows are harmless — their do is zero
        s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * (sm_scale * _LOG2E)
        p_t = jnp.exp2(s_t - lse.T)
        if drop_rate > 0.0:
            # regenerate the fwd mask for (q-block=qb, k-block=j), transposed
            mult_t = _dropout_mult(seed_ref, gi * group + g, qb, j,
                                   (p_t.shape[1], p_t.shape[0]), drop_rate).T
            y_t = p_t * mult_t
        else:
            y_t = p_t
        dv_acc[g] += jax.lax.dot_general(y_t.astype(do.dtype), do,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if drop_rate > 0.0:
            dp_t = dp_t * mult_t
        ds_t = p_t * (dp_t - delta.T) * sm_scale
        dk_acc[g] += jax.lax.dot_general(ds_t.astype(q.dtype), q,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(qb == num_qb - 1)
    def _():
        dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(sm_scale, block_q, block_k, kv_len, drop_rate, group, res, do):
    q, k, v, seed, o, lse = res
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    g = _pick_group(bh, block_k, n_k, d, group)
    delta_row = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta_row[:, None, :], (bh, 8, n_q))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, block_k=block_k,
                          kv_len=kv_len, padded_len=n_k, drop_rate=drop_rate,
                          group=g),
        grid=(bh // g, n_q // block_q, n_k // block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g, block_q, d), lambda b, i, kb: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, i, kb: (b, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, i, kb: (b, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_q, d), lambda b, i, kb: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, block_q), lambda b, i, kb: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, block_q), lambda b, i, kb: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, block_q, d), lambda b, i, kb: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((g, block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seed, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, block_q=block_q,
                          q_len=n_q, drop_rate=drop_rate, group=g),
        grid=(bh // g, n_k // block_k, n_q // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g, block_q, d), lambda b, j, qb: (b, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, j, qb: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, j, qb: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_q, d), lambda b, j, qb: (b, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, block_q), lambda b, j, qb: (b, 0, qb), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, block_q), lambda b, j, qb: (b, 0, qb), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, block_k, d), lambda b, j, qb: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_k, d), lambda b, j, qb: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, block_k, d), jnp.float32),
            pltpu.VMEM((g, block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seed, q, k, v, do, lse, delta)
    import numpy as _np

    seed_ct = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, seed_ct


# ---- public wrapper ---------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_core(q, k, v, seed, sm_scale, block_q, block_k, kv_len, drop_rate,
                group):
    o, _ = _flash_fwd(q, k, v, seed, sm_scale, block_q, block_k, kv_len,
                      drop_rate, group)
    return o


def _flash_core_fwd(q, k, v, seed, sm_scale, block_q, block_k, kv_len,
                    drop_rate, group):
    o, lse = _flash_fwd(q, k, v, seed, sm_scale, block_q, block_k, kv_len,
                        drop_rate, group)
    return o, (q, k, v, seed, o, lse)


_flash_core.defvjp(_flash_core_fwd, _flash_bwd)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(q, k, v, sm_scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    dropout_rate: float = 0.0,
                    dropout_rng=None,
                    group: Optional[int] = None):
    """q/k/v: [B, N, H, D] (BNHD like ops.attention); returns [B, N, H, D].

    dropout_rate > 0 applies attention-probability dropout INSIDE the kernel
    via the TPU PRNG (pltpu.prng_random_bits) — no [B,H,N,N] mask ever
    materializes in HBM, unlike the XLA fallback. The mask is regenerated in
    the backward kernels from the same (seed, block-index) pair.

    `group` packs that many batch*head pairs per program (None = auto)."""
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    sm_scale = d**-0.5 if sm_scale is None else sm_scale
    # d-aware scaling applies only to the defaults — an explicit caller
    # block (kernel sweeps) is honored as-is
    if block_q is None:
        block_q = scale_block_for_head_dim(
            DEFAULT_BLOCK_Q_DROPOUT if dropout_rate > 0.0
            else DEFAULT_BLOCK_Q, d)
    if block_k is None:
        block_k = scale_block_for_head_dim(DEFAULT_BLOCK_K, d)
    # blocks stay multiples of 128 (MXU/VPU lanes); shrink for short seqs
    while block_q > 128 and block_q > n_q:
        block_q //= 2
    while block_k > 128 and block_k > n_k:
        block_k //= 2

    if dropout_rate > 0.0:
        assert dropout_rng is not None, "dropout needs a PRNG key"
        seed = jax.random.randint(dropout_rng, (1,), -2**31, 2**31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), dtype=jnp.int32)

    # NOTE (r2): a transpose-free 4D-BlockSpec variant was built and
    # rejected by Mosaic on hardware — blocks would slice H (a tiled sublane
    # dim of [B,N,H,D]) to width 1, violating the (8,128) last-two-dims
    # tiling. The explicit transposes below are the layout change Mosaic
    # needs either way (docs/performance.md).
    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    n_q_pad = math.ceil(n_q / block_q) * block_q
    n_k_pad = math.ceil(n_k / block_k) * block_k
    qf = _pad_to(qf, n_q_pad, 1)
    kf = _pad_to(kf, n_k_pad, 1)
    vf = _pad_to(vf, n_k_pad, 1)

    o = _flash_core(qf, kf, vf, seed, sm_scale, block_q, block_k, n_k,
                    float(dropout_rate), group)
    o = o[:, :n_q].reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
    return o
