"""Fused transformer MLP (fc1 -> GELU -> dropout -> fc2 -> dropout) as one
pallas TPU kernel pair.

Replaces the reference Mlp's five XLA passes (reference mlp.py:22-73; our
models/components/blocks.py:64-90) with a single kernel that keeps the
[T, F] hidden activation entirely in VMEM: XLA must materialize h to HBM
because it feeds a matmul (fc2), and the two dropout masks add two more
full-tensor passes. At the 117M step shape ([16k, 1024] x F=4096, bf16)
that is ~0.5 GB/layer of avoidable HBM traffic per fwd+bwd
(docs/performance.md "Where the 117M step actually goes").

Design (per pallas_guide.md):
  * fwd: grid (T/BT, F/BF), F innermost ("arbitrary"): x block [BT, D] stays
    resident across the F sweep; each step computes h = drop(gelu(x@W1f+b1f))
    for one F block and accumulates h @ W2f into an fp32 [BT, D2] scratch.
    Output written on the last F step (+b2, output dropout).
  * bwd = two kernels (weight/bias grads need sum-over-T, dx needs
    sum-over-F):
      - dx: grid (T/BT, F/BF), recomputes h_pre per block, accumulates
        dpre @ W1f^T.
      - dW1/db1/dW2/db2: grid (F/BF, T/BT), T innermost, fp32 accumulators
        for one F-block's weight slices, written at the last T step.
  * dropout masks regenerate in-kernel from (seed, block-index) exactly as
    the forward drew them (ops/kernel_prng.py — same guarantee as the flash
    attention and fused-dropout kernels). seed[0] salts the hidden mask
    (folded with t and f), seed[1] the output mask (folded with t).
  * bf16 inputs, fp32 matmul accumulation (preferred_element_type), GELU +
    its derivative evaluated in fp32 (exact erf form, matching
    nn.gelu(approximate=False)).

GSPMD cannot partition a pallas_call, so the dispatcher (fused_mlp_ok) keeps
the XLA path under a multi-device mesh — same policy as ops/dropout.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbit2_tpu.ops.kernel_prng import interpret_mode as _interpret
from orbit2_tpu.ops.kernel_prng import keep_mult

DEFAULT_BLOCK_T = 512
DEFAULT_BLOCK_F = 512
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16MB scoped VMEM

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic has
    no erf lowering, but exp is native. fp32 in/out."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    """Exact-form GELU: x * Phi(x), fp32 (nn.gelu(approximate=False);
    erf approximated to 1.5e-7 — far below bf16 resolution)."""
    return x * 0.5 * (1.0 + _erf(x * _INV_SQRT2))


def _dgelu(x):
    """d/dx gelu(x) = Phi(x) + x * phi(x), fp32."""
    phi = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    big_phi = 0.5 * (1.0 + _erf(x * _INV_SQRT2))
    return big_phi + x * phi


_MASK_UNIT = 256


def _units(n):
    """Mask-unit edge for a block edge of n: fixed 256 when it divides, the
    whole edge otherwise (tiny test blocks). All kernels of one fused_mlp
    call see block edges that are either multiples of 256 or equal to each
    other, so the unit decomposition — and therefore the regenerated mask
    bits — is identical across the fwd/dx/dw kernels even though the dw
    kernel runs smaller blocks."""
    return _MASK_UNIT if n % _MASK_UNIT == 0 else n


def _unit_grid(seed, t0, f0, shape, rate):
    """Mask multiplier for a block whose top-left sits at unit coords
    (t0, f0), assembled from per-unit PRNG draws."""
    ut, uf = _units(shape[0]), _units(shape[1])
    rows = []
    for i in range(shape[0] // ut):
        cols = [keep_mult(seed + (t0 + i) * 1000003 + (f0 + j) * 7919,
                          (ut, uf), rate)
                for j in range(shape[1] // uf)]
        rows.append(cols[0] if len(cols) == 1 else jnp.concatenate(cols, 1))
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, 0)


def _mask1(seed_ref, t, f, shape, rate):
    ut, uf = _units(shape[0]), _units(shape[1])
    return _unit_grid(seed_ref[0], t * (shape[0] // ut), f * (shape[1] // uf),
                      shape, rate)


def _mask2(seed_ref, t, shape, rate):
    # output mask: rows unit-decomposed, full width (no f split anywhere)
    ut = _units(shape[0])
    rows = [keep_mult(seed_ref[1] + (t * (shape[0] // ut) + i) * 1000003,
                      (ut, shape[1]), rate)
            for i in range(shape[0] // ut)]
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, 0)


# ---------------------------------------------------------------- forward


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                acc_ref, *, nf, rate):
    t, f = pl.program_id(0), pl.program_id(1)

    @pl.when(f == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h += b1_ref[...].astype(jnp.float32)
    h = _gelu(h)
    if rate > 0.0:
        h *= _mask1(seed_ref, t, f, h.shape, rate)
    acc_ref[...] += jnp.dot(h.astype(x.dtype), w2_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _done():
        out = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        if rate > 0.0:
            out *= _mask2(seed_ref, t, out.shape, rate)
        o_ref[...] = out.astype(o_ref.dtype)


def _fwd(x, w1, b1, w2, b2, seed, rate, bt, bf):
    tt, d = x.shape
    f, d2 = w2.shape
    nt, nf = tt // bt, f // bf
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nf=nf, rate=rate),
        grid=(nt, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, d), lambda t, f_: (t, 0)),
            pl.BlockSpec((d, bf), lambda t, f_: (0, f_)),
            pl.BlockSpec((1, bf), lambda t, f_: (0, f_)),
            pl.BlockSpec((bf, d2), lambda t, f_: (f_, 0)),
            pl.BlockSpec((1, d2), lambda t, f_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, d2), lambda t, f_: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((tt, d2), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, d2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(seed, x, w1, b1, w2, b2)


# ---------------------------------------------------------------- backward


def _dx_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, do_ref, dx_ref,
               acc_ref, do2_ref, *, nf, rate):
    t, f = pl.program_id(0), pl.program_id(1)

    @pl.when(f == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        do = do_ref[...].astype(jnp.float32)
        if rate > 0.0:
            do *= _mask2(seed_ref, t, do.shape, rate)
        do2_ref[...] = do.astype(do_ref.dtype)

    x = x_ref[...]
    h_pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre += b1_ref[...].astype(jnp.float32)
    # dh = do2 @ W2f^T  -> contract over D2
    dh = jax.lax.dot_general(
        do2_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        dh *= _mask1(seed_ref, t, f, dh.shape, rate)
    dpre = dh * _dgelu(h_pre)
    # dx += dpre @ W1f^T -> contract over F block
    acc_ref[...] += jax.lax.dot_general(
        dpre.astype(x.dtype), w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _done():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _dw_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, do_ref,
               dw1_ref, db1_ref, dw2_ref, db2_ref,
               dw1_acc, db1_acc, dw2_acc, db2_acc, *, nt, rate):
    f, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)

    @pl.when(jnp.logical_and(t == 0, f == 0))
    def _init2():
        db2_acc[...] = jnp.zeros_like(db2_acc)

    x = x_ref[...]
    do = do_ref[...].astype(jnp.float32)
    if rate > 0.0:
        do *= _mask2(seed_ref, t, do.shape, rate)
    do_b = do.astype(x.dtype)

    h_pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre += b1_ref[...].astype(jnp.float32)
    g = _gelu(h_pre)
    m1 = _mask1(seed_ref, t, f, g.shape, rate) if rate > 0.0 else None
    h = g * m1 if rate > 0.0 else g
    # dW2f += h^T @ do2 -> contract over T block
    dw2_acc[...] += jax.lax.dot_general(
        h.astype(x.dtype), do_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        do_b, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        dh *= m1
    dpre = dh * _dgelu(h_pre)
    dw1_acc[...] += jax.lax.dot_general(
        x, dpre.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # bias grads kept sublane-replicated (8 rows) — (1, N) f32 stores break
    # the TPU (8, 128) tiling (same trick as the flash kernel's lse)
    db1_acc[...] += jnp.broadcast_to(
        jnp.sum(dpre, axis=0, keepdims=True), db1_acc.shape)

    @pl.when(f == 0)
    def _db2():
        db2_acc[...] += jnp.broadcast_to(
            jnp.sum(do, axis=0, keepdims=True), db2_acc.shape)

    @pl.when(t == nt - 1)
    def _done():
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)
        dw2_ref[...] = dw2_acc[...].astype(dw2_ref.dtype)
        db2_ref[...] = db2_acc[...].astype(db2_ref.dtype)


def _legal_shrinks(b, rate, lo):
    """Descending legal backward edges for a forward block edge b. Every
    candidate must DIVIDE b — the forward edge divides the global dim, so
    this keeps the backward grid exact (a non-divisor edge would truncate
    the grid and silently skip rows/columns of the weight gradient). With
    dropout a candidate must additionally regenerate the forward's mask
    decomposition: a multiple of the 256 mask unit, or b itself when b is
    not one (a sub-unit edge IS its own unit, see _units) — in that case b
    is the ONLY legal edge."""
    if rate > 0.0 and b % _MASK_UNIT:
        return [b]
    out = [b]
    c = b // 2
    while c >= lo:
        if b % c == 0 and (rate == 0.0 or c % _MASK_UNIT == 0):
            out.append(c)
        c //= 2
    return out


def _cap_edge(b, cap, rate):
    """Largest legal edge <= cap, or b itself when no legal candidate is
    that small (e.g. b=384 with dropout: 384 is its own mask unit, so the
    dw kernel must run the full edge and rely on the `fits` check)."""
    for c in _legal_shrinks(b, rate, lo=8):
        if c <= cap:
            return c
    return b


def _shrink(vmem_fn, bt0, bf0, rate, lo_t, lo_f):
    """Pick (bt, bf) from the legal candidate grids: shrink the T edge
    first (keeps the F contraction wide for the MXU), then the F edge with
    T at its smallest. Returns the smallest legal pair when nothing fits —
    the caller's `fits` check then declines the fused path."""
    cand_t = _legal_shrinks(bt0, rate, lo_t)
    cand_f = _legal_shrinks(bf0, rate, lo_f)
    for t_c in cand_t:
        if vmem_fn(t_c, bf0) <= _VMEM_BUDGET:
            return t_c, bf0
    for f_c in cand_f:
        if vmem_fn(cand_t[-1], f_c) <= _VMEM_BUDGET:
            return cand_t[-1], f_c
    return cand_t[-1], cand_f[-1]


def _dx_vmem_fn(d, d2, itemsize):
    def _vmem(bt_, bf_):
        return (bt_ * d * 4 + bt_ * (d + d2) * itemsize +
                2 * (d * bf_ + bf_ * d2) * itemsize +
                3 * bt_ * bf_ * 4)
    return _vmem


def _dw_vmem_fn(d, d2, itemsize):
    def _vmem(bt_, bf_):
        return ((d * bf_ + bf_ * d2) * 4 +          # fp32 dW accumulators
                2 * (d * bf_ + bf_ * d2) * itemsize +  # w blocks x2
                2 * bt_ * (d + d2) * itemsize +        # x/do blocks
                4 * bt_ * bf_ * 4)                   # h/dh/dpre tiles
    return _vmem


def _bwd_blocks(d, f, d2, itemsize, bt, bf, rate):
    """Deterministic backward block choice for forward blocks (bt, bf).
    Returns (bt_dx, bf_dx, bt_dw, bf_dw, fits); fits=False means even at the
    mask-consistency floors a kernel exceeds the VMEM budget — with dropout
    the caller must then fall back (running anyway would need sub-floor
    blocks, i.e. silently wrong regenerated masks)."""
    dx_vmem = _dx_vmem_fn(d, d2, itemsize)
    bt_dx, bf_dx = _shrink(dx_vmem, bt, bf, rate, lo_t=64, lo_f=128)
    # the dw kernel runs smaller blocks: at 512x512 its VMEM working set
    # (4 streamed blocks + 4 fp32 accumulators) makes the TPU compiler crash
    # when the surrounding graph also carries LN-backward fusions — 256x256
    # compiles everywhere and the dW matmuls keep a big contraction dim
    # (measured bisection: scripts/debug_fused_compile.py). The cap picks a
    # LEGAL edge (divides the forward edge; mask-consistent), not min(b,256),
    # which for b=384 would truncate the grid and drop gradient rows.
    dw_vmem = _dw_vmem_fn(d, d2, itemsize)
    bt_dw, bf_dw = _shrink(dw_vmem, _cap_edge(bt, 256, rate),
                           _cap_edge(bf, 256, rate), rate, lo_t=64, lo_f=128)
    fits = (dx_vmem(bt_dx, bf_dx) <= _VMEM_BUDGET
            and dw_vmem(bt_dw, bf_dw) <= _VMEM_BUDGET)
    return bt_dx, bf_dx, bt_dw, bf_dw, fits


def _bwd(x, w1, b1, w2, seed, rate, bt, bf, do):
    tt, d = x.shape
    f, d2 = w2.shape

    # dx kernel holds an fp32 [bt, D] accumulator — shrink for large D;
    # fused_mlp pre-checked `fits` when dropout is active, so sub-floor
    # (mask-divergent) blocks can't be reached here
    bt_dx, bf_dx, bt_dw, bf_dw, _fits = _bwd_blocks(
        d, f, d2, x.dtype.itemsize, bt, bf, rate)
    nt, nf = tt // bt_dx, f // bf_dx

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, nf=nf, rate=rate),
        grid=(nt, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt_dx, d), lambda t, f_: (t, 0)),
            pl.BlockSpec((d, bf_dx), lambda t, f_: (0, f_)),
            pl.BlockSpec((1, bf_dx), lambda t, f_: (0, f_)),
            pl.BlockSpec((bf_dx, d2), lambda t, f_: (f_, 0)),
            pl.BlockSpec((bt_dx, d2), lambda t, f_: (t, 0)),
        ],
        out_specs=pl.BlockSpec((bt_dx, d), lambda t, f_: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((tt, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt_dx, d), jnp.float32),
                        pltpu.VMEM((bt_dx, d2), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(seed, x, w1, b1, w2, do)

    # dw blocks chosen by _bwd_blocks above (capped at 256, shrunk to VMEM,
    # floored at the mask-consistency edges)
    nt_dw, nf_dw = tt // bt_dw, f // bf_dw
    dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_dw_kernel, nt=nt_dw, rate=rate),
        grid=(nf_dw, nt_dw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt_dw, d), lambda f_, t: (t, 0)),
            pl.BlockSpec((d, bf_dw), lambda f_, t: (0, f_)),
            pl.BlockSpec((1, bf_dw), lambda f_, t: (0, f_)),
            pl.BlockSpec((bf_dw, d2), lambda f_, t: (f_, 0)),
            pl.BlockSpec((bt_dw, d2), lambda f_, t: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((d, bf_dw), lambda f_, t: (0, f_)),
            pl.BlockSpec((8, bf_dw), lambda f_, t: (0, f_)),
            pl.BlockSpec((bf_dw, d2), lambda f_, t: (f_, 0)),
            pl.BlockSpec((8, d2), lambda f_, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, f), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, d2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, bf_dw), jnp.float32),
            pltpu.VMEM((8, bf_dw), jnp.float32),
            pltpu.VMEM((bf_dw, d2), jnp.float32),
            pltpu.VMEM((8, d2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(seed, x, w1, b1, w2, do)
    return dx, dw1, db1[0:1], dw2, db2[0:1]


# ---------------------------------------------------------------- wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _core(x, w1, b1, w2, b2, seed, rate, bt, bf):
    return _fwd(x, w1, b1, w2, b2, seed, rate, bt, bf)


def _core_fwd(x, w1, b1, w2, b2, seed, rate, bt, bf):
    out = _fwd(x, w1, b1, w2, b2, seed, rate, bt, bf)
    return out, (x, w1, b1, w2, seed)


def _core_bwd(rate, bt, bf, res, do):
    x, w1, b1, w2, seed = res
    dx, dw1, db1, dw2, db2 = _bwd(x, w1, b1, w2, seed, rate, bt, bf, do)
    zero_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    # b1/b2 enter _core as [1, F]/[1, D2]; grads match those shapes and flow
    # back through the wrapper's reshape/astype
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype), zero_seed)


_core.defvjp(_core_fwd, _core_bwd)


def _pick_blocks(tt, d, f, d2, itemsize):
    """Largest (bt, bf) from the default that divides the shapes and fits
    the FORWARD kernel's VMEM budget (x block + double-buffered weight
    blocks + the fp32 [bt, D2] accumulator). The backward kernels pick
    their own, smaller, blocks (_bwd) — large-D shapes like the 1B/10B
    trunks fit the forward (serving) path even when training would not."""
    bt, bf = min(DEFAULT_BLOCK_T, tt), min(DEFAULT_BLOCK_F, f)
    while bt > 8 and tt % bt:
        bt //= 2
    while bf > 128 and f % bf:
        bf //= 2
    if tt % bt or f % bf:
        return None

    def vmem(bt_, bf_):
        x_blk = bt_ * d * itemsize
        w_blks = 2 * (d * bf_ + bf_ * d2) * itemsize  # double-buffered
        acc = bt_ * d2 * 4
        h_tiles = 2 * bt_ * bf_ * 4
        return x_blk + w_blks + acc + h_tiles

    while vmem(bt, bf) > _VMEM_BUDGET and bt > 64:
        bt //= 2
    while vmem(bt, bf) > _VMEM_BUDGET and bf > 128:
        bf //= 2
    if vmem(bt, bf) > _VMEM_BUDGET:
        return None
    return bt, bf


def fused_mlp_ok(x=None) -> bool:
    """Pallas path only on-TPU and outside a multi-device mesh (GSPMD cannot
    partition a pallas_call — policy shared with ops/dropout.py)."""
    from orbit2_tpu.ops.seq_attention import data_mesh_active

    return jax.default_backend() == "tpu" and not data_mesh_active()


def fused_mlp(x, w1, b1, w2, b2, drop_rate: float = 0.0,
              rng: Optional[jax.Array] = None,
              force: bool = False,
              block_t: Optional[int] = None,
              block_f: Optional[int] = None) -> Optional[jax.Array]:
    """drop(gelu(x @ w1 + b1) @ w2 + b2) with the hidden activation kept in
    VMEM. x: [..., D]; w1: [D, F]; b1: [F]; w2: [F, D2]; b2: [D2].

    Returns None when the fused path doesn't apply (off-TPU unless `force`,
    active mesh, missing biases, or shapes that don't tile) — the caller
    falls back to the XLA path.
    """
    if not force and not fused_mlp_ok():
        return None
    if b1 is None or b2 is None:
        return None
    if drop_rate > 0.0 and rng is None:
        raise ValueError("dropout needs a PRNG key")

    shape = x.shape
    d = shape[-1]
    tt = int(np.prod(shape[:-1]))
    f, d2 = w2.shape
    if tt % 8 or d % 128 or f % 128 or d2 % 128:
        return None
    if block_t is not None and block_f is not None:
        bt, bf = block_t, block_f
        if tt % bt or f % bf:
            return None
    else:
        blocks = _pick_blocks(tt, d, f, d2, x.dtype.itemsize)
        if blocks is None:
            return None
        bt, bf = blocks

    # dropout implies training: the backward must be able to regenerate the
    # EXACT forward masks, which pins its blocks to mask-consistent edges
    # (_bwd_floors). If no VMEM-feasible backward exists at those floors,
    # decline the fused path entirely rather than risk silently divergent
    # masks under grad. (rate=0 backwards have no mask constraint; the
    # forward-only serving path for huge D is likewise unaffected.)
    if drop_rate > 0.0:
        *_bw, fits = _bwd_blocks(d, f, d2, x.dtype.itemsize, bt, bf,
                                 float(drop_rate))
        if not fits:
            return None

    if drop_rate > 0.0:
        seed = jax.random.randint(rng, (2,), -2 ** 31, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((2,), jnp.int32)

    x2d = x.reshape(tt, d)
    out = _core(x2d, w1, b1.reshape(1, f).astype(w1.dtype),
                w2, b2.reshape(1, d2).astype(w2.dtype), seed,
                float(drop_rate), bt, bf)
    return out.reshape(*shape[:-1], d2)
