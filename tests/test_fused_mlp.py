"""Fused MLP pallas kernel (interpret mode on the CPU mesh).

Forward and gradients vs the plain XLA chain at rate 0, and vs a
masked XLA reference built from the kernel's OWN regenerated dropout masks
(the same fwd/bwd seed-mapping guarantee the flash-attention dropout tests
enforce).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.ops.fused_mlp import fused_mlp
from orbit2_tpu.ops.kernel_prng import keep_mult

T, D, F, D2 = 64, 128, 256, 128
BT, BF = 32, 128  # multi-block in both grid dims


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, D)) * 0.5, dtype)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * (D ** -0.5), dtype)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.1, dtype)
    w2 = jnp.asarray(rng.normal(size=(F, D2)) * (F ** -0.5), dtype)
    b2 = jnp.asarray(rng.normal(size=(D2,)) * 0.1, dtype)
    return x, w1, b1, w2, b2


def _xla_mlp(x, w1, b1, w2, b2, m1=None, m2=None):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    if m1 is not None:
        h = h * m1
    out = h @ w2 + b2
    if m2 is not None:
        out = out * m2
    return out


def test_forward_matches_xla():
    x, w1, b1, w2, b2 = _inputs()
    got = fused_mlp(x, w1, b1, w2, b2, force=True, block_t=BT, block_f=BF)
    assert got is not None
    want = _xla_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla():
    x, w1, b1, w2, b2 = _inputs(1)

    def loss_fused(*args):
        return jnp.sum(fused_mlp(*args, force=True,
                                 block_t=BT, block_f=BF) ** 2)

    def loss_xla(*args):
        return jnp.sum(_xla_mlp(*args) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)
        assert a.shape == b.shape, name


def _full_masks(seed, rate):
    """Assemble the kernel's per-block masks into full [T, F] / [T, D2]
    multipliers using the same fold formulas (fused_mlp._mask1/_mask2)."""
    m1 = np.zeros((T, F), np.float32)
    m2 = np.zeros((T, D2), np.float32)
    for t in range(T // BT):
        for f in range(F // BF):
            blk = keep_mult(seed[0] + t * 1000003 + f * 7919,
                            (BT, BF), rate)
            m1[t * BT:(t + 1) * BT, f * BF:(f + 1) * BF] = np.asarray(blk)
        m2[t * BT:(t + 1) * BT] = np.asarray(
            keep_mult(seed[1] + t * 1000003, (BT, D2), rate))
    return jnp.asarray(m1), jnp.asarray(m2)


def test_dropout_forward_and_grads_match_masked_reference():
    rate = 0.25
    x, w1, b1, w2, b2 = _inputs(2)
    key = jax.random.PRNGKey(5)
    seed = np.asarray(jax.random.randint(key, (2,), -2 ** 31, 2 ** 31 - 1,
                                         dtype=jnp.int32))
    m1, m2 = _full_masks(seed, rate)

    got = fused_mlp(x, w1, b1, w2, b2, drop_rate=rate, rng=key,
                    force=True, block_t=BT, block_f=BF)
    want = _xla_mlp(x, w1, b1, w2, b2, m1, m2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(*args):
        return jnp.sum(fused_mlp(*args, drop_rate=rate, rng=key,
                                 force=True, block_t=BT, block_f=BF) ** 2)

    def loss_ref(*args):
        return jnp.sum(_xla_mlp(*args, m1, m2) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_dropout_mask_statistics():
    rate = 0.5
    x, w1, b1, w2, b2 = _inputs(3)
    ones = jnp.ones_like(x)
    # with identity-ish weights the zero pattern of the output dropout is
    # directly visible: count kept fraction over many elements
    out = fused_mlp(ones, w1, b1, w2, b2, drop_rate=rate,
                    rng=jax.random.PRNGKey(9), force=True,
                    block_t=BT, block_f=BF)
    kept = float(jnp.mean((out != 0).astype(jnp.float32)))
    assert 0.35 < kept < 0.65  # ~keep fraction of the OUTPUT mask


def test_fallbacks():
    x, w1, b1, w2, b2 = _inputs(4)
    # off-TPU without force -> None (dispatcher policy)
    assert fused_mlp(x, w1, b1, w2, b2) is None
    # non-tiling shape -> None
    bad = jnp.zeros((T, D + 3))
    assert fused_mlp(bad, jnp.zeros((D + 3, F)), b1, w2, b2,
                     force=True) is None
    # missing bias -> None
    assert fused_mlp(x, w1, None, w2, b2, force=True) is None


def test_mask_units_consistent_across_block_sizes():
    """The dw kernel runs 256-blocks while fwd/dx run up to 512-blocks; the
    dropout masks are drawn on a fixed 256-unit grid so all three kernels
    regenerate identical bits regardless of their own block size."""
    from orbit2_tpu.ops.fused_mlp import _mask1, _mask2

    seed = jnp.asarray([1234567, 7654321], jnp.int32)
    rate = 0.3
    # a (512, 512) fwd block at block coords (t=1, f=2)
    big = np.asarray(_mask1(seed, 1, 2, (512, 512), rate))
    # the same region as four (256, 256) dw blocks
    for i in range(2):
        for j in range(2):
            small = np.asarray(_mask1(seed, 2 + i, 4 + j, (256, 256), rate))
            np.testing.assert_array_equal(
                big[i * 256:(i + 1) * 256, j * 256:(j + 1) * 256], small)
    # output mask rows: (512, 128) block t=1 == two (256, 128) blocks 2,3
    big2 = np.asarray(_mask2(seed, 1, (512, 128), rate))
    for i in range(2):
        small2 = np.asarray(_mask2(seed, 2 + i, (256, 128), rate))
        np.testing.assert_array_equal(big2[i * 256:(i + 1) * 256], small2)


def test_batched_input_shape():
    """[B, N, D] inputs flatten and reshape back."""
    x, w1, b1, w2, b2 = _inputs(6)
    xb = x.reshape(4, T // 4, D)
    got = fused_mlp(xb, w1, b1, w2, b2, force=True,
                    block_t=BT, block_f=BF)
    assert got.shape == (4, T // 4, D2)
    want = _xla_mlp(xb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dropout_bwd_infeasible_falls_back():
    """With dropout, a sub-256 forward block edge pins the backward to that
    exact edge (sub-unit shrink would silently regenerate DIFFERENT masks).
    When no VMEM-feasible backward exists at that pinned edge, fused_mlp
    must decline up front — regression for the r3 review finding where the
    dx/dw shrink loops could halve a 128 block to 64 under dropout."""
    from orbit2_tpu.ops.fused_mlp import _bwd_blocks

    d = f = d2 = 4096
    # fp32, fwd blocks (128, 512): dx needs > budget even at (128, 256)
    bt_dx, bf_dx, bt_dw, bf_dw, fits = _bwd_blocks(
        d, f, d2, 4, bt=128, bf=512, rate=0.25)
    assert bt_dx == 128 and bt_dw == 128  # pinned at the fwd edge, never 64
    assert not fits

    tt = 384  # % 128 == 0 but % 256 != 0 — forces the sub-unit fwd edge
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(tt, d)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, f)) * d ** -0.5, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d2)) * f ** -0.5, jnp.float32)
    b1 = jnp.zeros((f,), jnp.float32)
    b2 = jnp.zeros((d2,), jnp.float32)
    out = fused_mlp(x, w1, b1, w2, b2, drop_rate=0.25,
                    rng=jax.random.PRNGKey(0), force=True,
                    block_t=128, block_f=512)
    assert out is None
    # rate 0 has no mask-consistency constraint: blocks shrink freely and
    # the same shape fits in bf16 (the training dtype)
    *_blks, fits0 = _bwd_blocks(d, f, d2, 2, bt=128, bf=512, rate=0.0)
    assert fits0


def test_dropout_bwd_shrink_stays_mask_consistent(monkeypatch):
    """When VMEM pressure shrinks the backward blocks but the edges stay on
    the 256-unit grid, gradients still match the masked XLA reference built
    from the FORWARD's block geometry."""
    import orbit2_tpu.ops.fused_mlp as fm

    monkeypatch.setattr(fm, "_VMEM_BUDGET", int(2.5 * 1024 * 1024))
    tt, d, f, d2 = 512, 128, 512, 128
    bt, bf, rate = 512, 256, 0.3
    # dx shrinks bt 512 -> 256 under the tiny budget; both on the unit grid
    bt_dx, _bf_dx, _bt_dw, _bf_dw, fits = fm._bwd_blocks(
        d, f, d2, 4, bt=bt, bf=bf, rate=rate)
    assert fits and bt_dx == 256

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(tt, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, f)) * d ** -0.5, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d2)) * f ** -0.5, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d2,)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(21)
    seed = np.asarray(jax.random.randint(key, (2,), -2 ** 31, 2 ** 31 - 1,
                                         dtype=jnp.int32))
    from orbit2_tpu.ops.fused_mlp import _mask1, _mask2

    seed_j = jnp.asarray(seed)
    m1 = jnp.concatenate([_mask1(seed_j, 0, j, (bt, bf), rate)
                          for j in range(f // bf)], axis=1)
    m2 = _mask2(seed_j, 0, (bt, d2), rate)

    def loss_fused(*args):
        return jnp.sum(fm.fused_mlp(*args, drop_rate=rate, rng=key,
                                    force=True, block_t=bt, block_f=bf) ** 2)

    def loss_ref(*args):
        return jnp.sum(_xla_mlp(*args, m1, m2) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_bwd_dw_blocks_divide_nonpow2_edges():
    """Regression (r3 review): the dw-kernel cap was min(bt, 256), which for
    a 384-row forward edge gave a 256 block over a 384 grid — nt_dw = 1 and
    rows 256-383 silently never reached dW/db. Every backward edge must
    DIVIDE the forward edge; with dropout a 384 edge is its own mask unit,
    so the dw kernel must keep the full edge (or decline via fits)."""
    from orbit2_tpu.ops.fused_mlp import _bwd_blocks

    d, f, d2 = 128, 512, 128
    # rate 0: cap picks 192 (divides 384), never 256
    bt_dx, bf_dx, bt_dw, bf_dw, fits = _bwd_blocks(
        d, f, d2, 4, bt=384, bf=512, rate=0.0)
    assert 384 % bt_dx == 0 and 512 % bf_dx == 0
    assert 384 % bt_dw == 0 and 512 % bf_dw == 0
    assert bt_dw <= 256 and fits
    # dropout: 384 is its own mask unit -> the only legal T edge is 384
    bt_dx, _, bt_dw, _, _ = _bwd_blocks(d, f, d2, 4, bt=384, bf=512, rate=0.3)
    assert bt_dx == 384 and bt_dw == 384


def test_grad_matches_xla_at_384_rows():
    """End-to-end gradient correctness at the truncation shape: 384 rows,
    auto-picked blocks (bt=384 > the old 256 dw cap), rate 0."""
    tt, d, f, d2 = 384, 128, 512, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(tt, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, f)) * d ** -0.5, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d2)) * f ** -0.5, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d2,)) * 0.1, jnp.float32)

    def loss_fused(*args):
        return jnp.sum(fused_mlp(*args, force=True) ** 2)

    def loss_ref(*args):
        return jnp.sum(_xla_mlp(*args) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for gf, gr, name in zip(g_fused, g_ref, ["x", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
