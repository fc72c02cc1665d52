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
