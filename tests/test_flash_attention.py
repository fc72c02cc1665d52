"""Flash attention kernel vs reference SDPA — forward and gradients
(interpret mode on CPU; compiled Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.ops.flash_attention import flash_attention


def sdpa_ref(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def make_qkv(b=2, n=256, h=2, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, n, h, d)), dtype=jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("n", [128, 256])
def test_forward_matches_sdpa(n):
    q, k, v = make_qkv(n=n)
    got = flash_attention(q, k, v)
    want = sdpa_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_forward_with_padding():
    """n not a block multiple -> wrapper pads and masks."""
    q, k, v = make_qkv(n=200)
    got = flash_attention(q, k, v)
    want = sdpa_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_sdpa():
    q, k, v = make_qkv(n=256, b=1, h=2, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_ref(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_gradients_with_padding():
    q, k, v = make_qkv(n=160, b=1, h=1, d=32, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_ref(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


# ---- in-kernel dropout (TPU PRNG; interpret mode on CPU) ---------------------
#
# The kernel applies dropout to softmax probs post-normalization (torch SDPA
# semantics) and regenerates the mask in both backward kernels from the same
# (seed, block-index) mapping — these tests pin that mapping (ADVICE r1 #5).

DROP = 0.25


def test_dropout_deterministic_and_scaled():
    b, n, h, d = 2, 256, 2, 64
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)) * 0.3, dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)) * 0.3, dtype=jnp.float32)
    v = jnp.ones((b, n, h, d), dtype=jnp.float32)

    key = jax.random.PRNGKey(7)
    o1 = np.asarray(flash_attention(q, k, v, dropout_rate=DROP, dropout_rng=key,
                                    block_q=128, block_k=128))
    o2 = np.asarray(flash_attention(q, k, v, dropout_rate=DROP, dropout_rng=key,
                                    block_q=128, block_k=128))
    np.testing.assert_array_equal(o1, o2)  # same key -> same mask

    o3 = np.asarray(flash_attention(q, k, v, dropout_rate=DROP,
                                    dropout_rng=jax.random.PRNGKey(8),
                                    block_q=128, block_k=128))
    assert np.abs(o1 - o3).max() > 1e-3  # different key -> different mask

    # v == 1: each output element is sum_j p_ij * mult_ij with E[mult] = 1,
    # so the global mean must stay ~1 while dropout injects variance
    assert abs(o1.mean() - 1.0) < 0.02
    assert o1.std() > 0.01


def _extract_mult(key, n, drop, bq, bk):
    """Recover the kernel's dropout multiplier matrix: with v = I the output
    IS softmax(s) * mult, so mult = out / softmax(s). The mask depends only
    on (seed, block indices) — any probe q/k works (d must equal n for the
    identity-v trick)."""
    prng = np.random.default_rng(99)
    q = jnp.asarray(prng.normal(size=(1, n, 1, n)) * 0.05, dtype=jnp.float32)
    k = jnp.asarray(prng.normal(size=(1, n, 1, n)) * 0.05, dtype=jnp.float32)
    v_eye = jnp.eye(n, dtype=jnp.float32)[None, :, None, :]  # [1, n, 1, n]
    out = np.asarray(flash_attention(q, k, v_eye, dropout_rate=drop,
                                     dropout_rng=key, block_q=bq, block_k=bk))
    s = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k))
    s = s * (q.shape[-1] ** -0.5)
    p = np.asarray(jax.nn.softmax(jnp.asarray(s), axis=-1))[0, 0]
    mult = out[0, :, 0, :] / p
    # snap numerical noise to the exact {0, 1/keep} alphabet
    keep = 1.0 - drop
    snapped = np.where(mult > 0.5 / keep, 1.0 / keep, 0.0)
    np.testing.assert_allclose(mult, snapped, atol=1e-2)
    return snapped


def test_dropout_mask_statistics():
    n = 256
    mult = _extract_mult(jax.random.PRNGKey(3), n, DROP, 128, 128)
    frac_dropped = (mult == 0.0).mean()
    assert abs(frac_dropped - DROP) < 0.03
    # blocks must not repeat the same mask: compare the 4 (128,128) tiles
    tiles = [mult[i:i+128, j:j+128] for i in (0, 128) for j in (0, 128)]
    for a in range(4):
        for bidx in range(a + 1, 4):
            assert np.abs(tiles[a] - tiles[bidx]).max() > 0


def test_dropout_gradients_match_masked_reference():
    """jax.grad of the dropout kernel vs an SDPA reference that uses the
    kernel's own regenerated mask — catches any fwd/bwd seed-mapping drift
    across the dq and dkv kernels (multi-block grid)."""
    n, d = 256, 64
    bq = bk = 128
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(1, n, 1, d)) * 0.3, dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, n, 1, d)) * 0.3, dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, n, 1, d)), dtype=jnp.float32)
    key = jax.random.PRNGKey(11)

    # mask depends only on (seed, block indices) — extraction with v=I uses
    # the same q/k/key/blocks, so it is the mask the grad test sees
    mult = jnp.asarray(_extract_mult(key, n, DROP, bq, bk))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, dropout_rate=DROP, dropout_rng=key,
                            block_q=bq, block_k=bk)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        p = p * mult[None, None]
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return jnp.sum(o ** 2)

    o_flash = flash_attention(q, k, v, dropout_rate=DROP, dropout_rng=key,
                              block_q=bq, block_k=bk)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    o_ref = jnp.einsum("bhqk,bkhd->bqhd",
                       jax.nn.softmax(s, axis=-1) * mult[None, None], v)
    np.testing.assert_allclose(np.asarray(o_flash), np.asarray(o_ref),
                               atol=2e-5, rtol=2e-5)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=5e-4)


def test_multiblock_backward():
    """dq/dkv stream multiple blocks (scratch accumulation): grads vs SDPA."""
    q, k, v = make_qkv(b=1, n=512, h=2, d=32, seed=10)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=256) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_ref(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_rectangular_nq_nk():
    """n_q != n_k (cross-attention shapes): one-shot and streaming paths."""
    rng = np.random.default_rng(11)

    def mk(n, d=32):
        return jnp.asarray(rng.normal(size=(2, n, 2, d)), jnp.float32)

    for n_q, n_k, bk in ((128, 384, 384), (384, 128, 128), (256, 512, 128)):
        q = mk(n_q)
        k, v = mk(n_k), mk(n_k)
        got = flash_attention(q, k, v, block_q=128, block_k=bk)
        want = sdpa_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_large_head_dim_fwd_and_grad():
    """d=256 (10B-scale head dim): blocks auto-shrink per d-doubling so the
    backward kernels fit scoped VMEM on hardware; numerics must still match
    the SDPA reference."""
    from orbit2_tpu.ops.flash_attention import scale_block_for_head_dim

    assert scale_block_for_head_dim(1024, 256) == 256
    assert scale_block_for_head_dim(2048, 256) == 512
    assert scale_block_for_head_dim(1024, 64) == 1024
    assert scale_block_for_head_dim(128, 512) == 128

    q, k, v = make_qkv(n=256, b=1, h=2, d=256, seed=12)
    got = flash_attention(q, k, v)
    want = sdpa_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_ref(q, k, v) ** 2)

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
