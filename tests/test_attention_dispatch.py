"""Attention dispatcher: impl resolution, fallbacks, dropout routing
(reference FusedAttn.{CK, DEFAULT, NONE} selection semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.ops.attention import dot_product_attention, resolve_impl
from orbit2_tpu.ops.flash_attention import flash_supported


def qkv(n=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(2, n, 2, d)), dtype=jnp.float32)
    return mk(), mk(), mk()


def test_resolve_auto_cpu_is_xla():
    assert resolve_impl("auto", jnp.bfloat16) == "xla"  # tests run on CPU
    assert resolve_impl("naive", jnp.float32) == "naive"


def test_flash_unsupported_on_cpu():
    q, k, v = qkv()
    assert not flash_supported(q, k, v)


def test_xla_and_naive_agree():
    q, k, v = qkv()
    a = dot_product_attention(q, k, v, impl="xla")
    b = dot_product_attention(q, k, v, impl="naive")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_falls_back_gracefully_on_cpu():
    q, k, v = qkv()
    a = dot_product_attention(q, k, v, impl="pallas")  # -> xla fallback
    b = dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_auto_resolves_inside_call():
    q, k, v = qkv()
    a = dot_product_attention(q, k, v, impl="auto")
    assert np.isfinite(np.asarray(a)).all()


def test_dropout_changes_output_and_preserves_scale():
    q, k, v = qkv(seed=3)
    base = dot_product_attention(q, k, v, impl="xla")
    drop = dot_product_attention(q, k, v, impl="xla", dropout_rate=0.3,
                                 dropout_rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(base), np.asarray(drop))
    # expectation roughly preserved (1/keep rescaling)
    ratio = float(np.abs(np.asarray(drop)).mean() /
                  np.abs(np.asarray(base)).mean())
    assert 0.6 < ratio < 1.6


def test_unknown_impl_raises():
    q, k, v = qkv()
    with pytest.raises(ValueError):
        dot_product_attention(q, k, v, impl="cuda")


def test_cross_attention_shapes():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(3, 1, 2, 8)), dtype=jnp.float32)  # Nq=1
    k = jnp.asarray(rng.normal(size=(3, 7, 2, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(3, 7, 2, 8)), dtype=jnp.float32)
    out = dot_product_attention(q, k, v, impl="xla")
    assert out.shape == (3, 1, 2, 8)
