"""Fused in-kernel dropout op (ops/dropout.py) — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.ops.dropout import dropout, fused_dropout

RATE = 0.25


def test_scaling_and_determinism():
    x = jnp.ones((512, 1024), jnp.float32)
    key = jax.random.PRNGKey(0)
    o1 = np.asarray(fused_dropout(x, RATE, key))
    o2 = np.asarray(fused_dropout(x, RATE, key))
    np.testing.assert_array_equal(o1, o2)
    o3 = np.asarray(fused_dropout(x, RATE, jax.random.PRNGKey(1)))
    assert np.abs(o1 - o3).max() > 0
    # values are exactly {0, 1/keep}; drop fraction ~ RATE; E[x] preserved
    keep = 1.0 - RATE
    assert set(np.unique(o1)) <= {0.0, np.float32(1.0 / keep)}
    assert abs((o1 == 0).mean() - RATE) < 0.02
    assert abs(o1.mean() - 1.0) < 0.02


def test_grad_regenerates_identical_mask():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(512, 1024)), jnp.float32)
    key = jax.random.PRNGKey(3)

    out = np.asarray(fused_dropout(x, RATE, key))
    mask = out / np.asarray(x)  # elementwise multiplier the kernel used

    g = jax.grad(lambda x: jnp.sum(fused_dropout(x, RATE, key) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), mask * 3.0, rtol=1e-6)


def test_nd_shapes_and_padding():
    key = jax.random.PRNGKey(7)
    for shape in [(2, 512, 512), (3, 7, 200)]:  # 3d, and non-aligned fallback
        x = jnp.ones(shape, jnp.float32)
        o = np.asarray(fused_dropout(x, RATE, key))
        assert o.shape == shape
        assert abs((o == 0).mean() - RATE) < 0.05


def test_dispatcher_deterministic_path():
    x = jnp.ones((8, 128), jnp.float32)
    called = []

    def rng_fn():
        called.append(1)
        return jax.random.PRNGKey(0)

    out = dropout(x, 0.5, True, rng_fn)
    assert out is x and not called
    out = dropout(x, 0.0, False, rng_fn)
    assert out is x and not called
    # CPU backend -> XLA path, still correct semantics
    out = np.asarray(dropout(x, 0.5, False, rng_fn))
    assert called and set(np.unique(out)) <= {0.0, 2.0}
