"""Parallelism tests on an 8-virtual-device CPU mesh: sharding rules,
TP/FSDP numerical parity vs single device — the tests the reference never
had (SURVEY.md §4 'Multi-node behavior is untested')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_specs,
    shard_params,
    spec_for,
)

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]


def tiny_model(**kw):
    kwargs = dict(
        default_vars=DEFAULT_VARS, img_size=(16, 32), in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=64, depth=2,
        decoder_depth=1, num_heads=4, learn_pos_emb=True,
    )
    kwargs.update(kw)
    return ResSlimViT(**kwargs)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_mesh_axes_and_layout():
    mesh = make_mesh(replica=2, fsdp=2, tensor=2)
    assert dict(mesh.shape) == {"stage": 1, "replica": 2, "fsdp": 2,
                                "expert": 1, "seq": 1, "tensor": 2}


def test_spec_rules():
    mesh = make_mesh(fsdp=2, tensor=2, replica=2)
    assert spec_for("blocks_0/attn/qkv/kernel", (64, 192), mesh) == P("fsdp", "tensor")
    assert spec_for("blocks_0/attn/proj/kernel", (64, 64), mesh) == P("tensor", "fsdp")
    assert spec_for("blocks_0/mlp/fc1/kernel", (64, 256), mesh) == P("fsdp", "tensor")
    assert spec_for("blocks_0/mlp/fc2/kernel", (256, 64), mesh) == P("tensor", "fsdp")
    assert spec_for("blocks_0/norm1/scale", (64,), mesh) == P()
    # non-divisible dims drop the axis instead of failing
    assert spec_for("blocks_0/attn/qkv/kernel", (63, 192), mesh) == P(None, "tensor")


def _init(m):
    x = jnp.ones((8, 7, 16, 32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS, OUT_VARS)
    return v["params"]


@pytest.mark.parametrize("axes", [dict(fsdp=8), dict(tensor=4, fsdp=2),
                                  dict(replica=2, fsdp=2, tensor=2)])
def test_sharded_forward_matches_single_device(axes):
    """The GSPMD-sharded forward must be numerically identical (up to fp
    reduction order) to the unsharded one — the property the reference
    could only eyeball via Grad_Inspect prints (dist_functions.py:53-54)."""
    m = tiny_model()
    params = _init(m)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 7, 16, 32)),
                    dtype=jnp.float32)

    y_ref = m.apply({"params": params}, x, DEFAULT_VARS, OUT_VARS)

    mesh = make_mesh(**axes)
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(p, xb):
        return m.apply({"params": p}, xb, DEFAULT_VARS, OUT_VARS)

    with mesh:
        y = fwd(sharded, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4, rtol=2e-4)


def test_sharded_grads_match_single_device():
    m = tiny_model()
    params = _init(m)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 7, 16, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, 3, 64, 128)), dtype=jnp.float32)

    def loss_fn(p, xb, yb):
        yhat = m.apply({"params": p}, xb, DEFAULT_VARS, OUT_VARS)
        return jnp.mean((yhat - yb) ** 2)

    g_ref = jax.grad(loss_fn)(params, x, y)

    mesh = make_mesh(fsdp=4, tensor=2)
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    with mesh:
        g = jax.jit(jax.grad(loss_fn))(sharded, xs, ys)

    flat_ref = jax.tree.leaves(g_ref)
    flat = jax.tree.leaves(g)
    for a, b in zip(flat_ref, flat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3)


def test_param_specs_cover_tree():
    m = tiny_model()
    params = _init(m)
    mesh = make_mesh(fsdp=4, tensor=2)
    specs = param_specs(params, mesh)
    leaves_p = jax.tree.leaves(params)
    leaves_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(leaves_p) == len(leaves_s)
    # at least the attention/mlp kernels are tensor-sharded
    n_tensor = sum(1 for s in leaves_s if "tensor" in jax.tree.leaves(tuple(s)))
    assert n_tensor >= 4 * 2  # qkv+proj+fc1+fc2 per block x depth


def test_seq_parallel_forward_matches_single_device():
    """Sequence-parallel (seq axis) forward parity — the axis the reference
    stubs out (intermediate_downscaling.py:165 assert)."""
    import dataclasses

    m = dataclasses.replace(tiny_model(), seq_shard=True)
    m_ref = tiny_model()
    params = _init(m_ref)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 7, 16, 32)),
                    dtype=jnp.float32)
    y_ref = m_ref.apply({"params": params}, x, DEFAULT_VARS, OUT_VARS)

    mesh = make_mesh(replica=1, fsdp=2, seq=2, tensor=2)
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(p, xb):
        return m.apply({"params": p}, xb, DEFAULT_VARS, OUT_VARS)

    with mesh:
        y = fwd(sharded, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


def test_seq_flash_attention_matches_unsharded():
    """shard_map flash attention with KV all-gather over the seq axis must
    equal the plain kernel (and the reference SDPA math)."""
    from orbit2_tpu.ops.seq_attention import seq_flash_attention
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.parallel.mesh import batch_sharding

    B, N, H, D = 4, 256, 2, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.float32)

    want = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(replica=1, fsdp=2, seq=2, tensor=2)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda a, b, c: seq_flash_attention(a, b, c))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_seq_flash_attention_grads_match():
    from orbit2_tpu.ops.seq_attention import seq_flash_attention
    from orbit2_tpu.ops.flash_attention import flash_attention

    B, N, H, D = 2, 256, 2, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.float32)

    def loss_ref(a):
        return jnp.sum(flash_attention(a, a, a) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(q))

    mesh = make_mesh(replica=1, fsdp=1, seq=4, tensor=2)
    with jax.set_mesh(mesh):
        def loss_sp(a):
            return jnp.sum(seq_flash_attention(a, a, a) ** 2)
        g = jax.jit(jax.grad(loss_sp))(q)
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=5e-4, rtol=5e-4)


def test_seq_dropout_decorrelated_across_shards():
    """With attention dropout under seq parallelism, each shard folds its
    axis index into the rng — identical per-shard inputs must yield
    DIFFERENT outputs (r1 ADVICE: local q-block indices restart at 0 on
    every shard, so an unfolded rng correlates the masks)."""
    from orbit2_tpu.ops.seq_attention import seq_flash_attention

    B, N, H, D = 2, 256, 2, 32
    half = N // 2
    rng = np.random.default_rng(2)

    def doubled():
        a = rng.normal(size=(B, half, H, D)).astype(np.float32)
        return jnp.asarray(np.concatenate([a, a], axis=1))

    q, k, v = doubled(), doubled(), doubled()
    mesh = make_mesh(replica=2, fsdp=1, seq=2, tensor=2)
    key = jax.random.PRNGKey(5)

    with jax.set_mesh(mesh):
        clean = jax.jit(lambda a, b, c: seq_flash_attention(a, b, c))(q, k, v)
        drop = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, dropout_rate=0.3, dropout_rng=key))(q, k, v)
        drop2 = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, dropout_rate=0.3, dropout_rng=key))(q, k, v)

    clean = np.asarray(clean)
    drop = np.asarray(drop)
    # both shards saw identical q and the same gathered k/v: without dropout
    # the two halves are bit-identical
    np.testing.assert_array_equal(clean[:, :half], clean[:, half:])
    # dropout masks must differ across shards (fold_in(axis_index))
    assert np.abs(drop[:, :half] - drop[:, half:]).max() > 1e-3
    # and stay deterministic for a fixed key
    np.testing.assert_array_equal(drop, np.asarray(drop2))


def _ring_wrap(mesh, fn):
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, "seq", None, None)
    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)


@pytest.mark.parametrize("seq", [2, 4])
def test_ring_attention_matches_unsharded(seq):
    """ppermute ring attention == plain flash kernel (fwd), K/V memory
    O(N/seq) per device."""
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.ring_attention import ring_flash_attention

    B, N, H, D = 2, 512, 2, 32
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
               for _ in range(3))
    want = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(replica=8 // seq, fsdp=1, seq=seq, tensor=1)
    fn = _ring_wrap(mesh, lambda a, b, c: ring_flash_attention(a, b, c, "seq"))
    with jax.set_mesh(mesh):
        got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_ring_attention_grads_match():
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.ring_attention import ring_flash_attention

    B, N, H, D = 1, 512, 2, 32
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    mesh = make_mesh(replica=2, fsdp=1, seq=4, tensor=1)
    inner = _ring_wrap(mesh, lambda a, b, c: ring_flash_attention(a, b, c, "seq"))

    def loss_sp(q, k, v):
        return jnp.sum(inner(q, k, v) ** 2)

    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_seq_flash_attention_ring_impl_matches_gather():
    """The dispatcher's ring path == gather path == plain kernel."""
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.seq_attention import seq_flash_attention

    B, N, H, D = 2, 256, 2, 32
    rng = np.random.default_rng(6)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
               for _ in range(3))
    want = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(replica=2, fsdp=1, seq=2, tensor=2)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, impl="ring"))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_batch_flash_attention_matches_unsharded():
    """dp/fsdp/tp mesh WITHOUT a seq axis: the shard_map-per-device kernel
    path must equal the plain kernel (a bare pallas_call would be
    GSPMD-opaque and replicate)."""
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.seq_attention import batch_flash_attention

    B, N, H, D = 4, 256, 2, 32
    rng = np.random.default_rng(8)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
               for _ in range(3))
    want = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(replica=2, fsdp=2, seq=1, tensor=2)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda a, b, c: batch_flash_attention(a, b, c))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)

    # indivisible batch -> None (dispatcher falls back to XLA attention)
    q3 = q[:3]
    with jax.set_mesh(mesh):
        assert batch_flash_attention(q3, k[:3], v[:3]) is None


def test_batch_flash_attention_dropout_decorrelated():
    from orbit2_tpu.ops.seq_attention import batch_flash_attention

    B, N, H, D = 4, 256, 2, 32
    rng = np.random.default_rng(9)
    one = rng.normal(size=(1, N, H, D)).astype(np.float32)
    q = jnp.asarray(np.repeat(one, B, axis=0))  # identical per-batch rows
    k, v = q, q
    key = jax.random.PRNGKey(2)

    mesh = make_mesh(replica=2, fsdp=2, seq=1, tensor=2)
    with jax.set_mesh(mesh):
        drop = jax.jit(lambda a, b, c: batch_flash_attention(
            a, b, c, dropout_rate=0.3, dropout_rng=key))(q, k, v)
    drop = np.asarray(drop)
    # batch rows live on different dp shards: masks must differ
    assert np.abs(drop[0] - drop[2]).max() > 1e-3


def test_ring_attention_non_divisible_blocks():
    """Block caps that do not divide N_local must not skip tail rows/tokens:
    the flash grids floor-divide, so the ring has to pick blocks that divide
    N_local exactly (r2 code-review finding — min() clamping left tail q
    rows unwritten and tail kv tokens unattended). N_local=384 with cap 256
    forces the fitted block to 128 (grid of 3)."""
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.ring_attention import _fit_block, ring_flash_attention

    assert _fit_block(384, 256) == 128
    assert _fit_block(2304, 1024) == 768
    assert _fit_block(2176, 1024) == 128
    assert _fit_block(2048, 2048) == 2048

    B, N, H, D = 2, 768, 2, 32  # N_local = 384 per seq shard
    rng = np.random.default_rng(12)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
               for _ in range(3))
    want = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(replica=2, fsdp=1, seq=2, tensor=2)
    fn = _ring_wrap(mesh, lambda a, b, c: ring_flash_attention(
        a, b, c, "seq", block_q=256, block_k=256))
    with jax.set_mesh(mesh):
        got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)

    # grads too (the bwd used the same min() clamping)
    def loss_sp(q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_seq_flash_attention_ulysses_impl_matches_plain():
    """The all-to-all (DeepSpeed-Ulysses) seq path == plain kernel: tokens
    swap to heads over the seq axis, full-sequence flash per head subset,
    swap back."""
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.seq_attention import seq_flash_attention

    B, N, H, D = 2, 256, 4, 32
    rng = np.random.default_rng(7)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
               for _ in range(3))
    want = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(replica=2, fsdp=1, seq=2, tensor=2)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, impl="ulysses"))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_seq_flash_attention_ulysses_grads_match():
    from orbit2_tpu.ops.flash_attention import flash_attention
    from orbit2_tpu.ops.seq_attention import seq_flash_attention

    B, N, H, D = 2, 512, 4, 32
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)

    def loss_ref(a):
        return jnp.sum(flash_attention(a, a, a) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(q))

    mesh = make_mesh(replica=2, fsdp=1, seq=4, tensor=1)
    with jax.set_mesh(mesh):
        def loss_sp(a):
            return jnp.sum(seq_flash_attention(a, a, a, impl="ulysses") ** 2)
        g = jax.jit(jax.grad(loss_sp))(q)
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=5e-4, rtol=5e-4)


def test_seq_flash_attention_ulysses_dropout():
    """Ulysses supports attention dropout natively (each device holds the
    full sequence for its head subset): deterministic per key, different
    from the clean output."""
    from orbit2_tpu.ops.seq_attention import seq_flash_attention

    B, N, H, D = 2, 256, 4, 32
    rng = np.random.default_rng(9)
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
               for _ in range(3))
    key = jax.random.PRNGKey(11)

    mesh = make_mesh(replica=1, fsdp=2, seq=2, tensor=2)
    with jax.set_mesh(mesh):
        clean = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, impl="ulysses"))(q, k, v)
        drop = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, dropout_rate=0.3, dropout_rng=key,
            impl="ulysses"))(q, k, v)
        drop2 = jax.jit(lambda a, b, c: seq_flash_attention(
            a, b, c, dropout_rate=0.3, dropout_rng=key,
            impl="ulysses"))(q, k, v)

    assert np.abs(np.asarray(drop) - np.asarray(clean)).max() > 1e-3
    np.testing.assert_array_equal(np.asarray(drop), np.asarray(drop2))


def test_seq_flash_attention_ulysses_head_divisibility():
    """Local heads not divisible by the seq axis must raise, not silently
    mis-shard (H=2 split over tensor=2 leaves 1 local head for seq=2)."""
    from orbit2_tpu.ops.seq_attention import seq_flash_attention

    B, N, H, D = 2, 256, 2, 32
    q = jnp.zeros((B, N, H, D), jnp.float32)
    mesh = make_mesh(replica=2, fsdp=1, seq=2, tensor=2)
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="ulysses"):
            jax.jit(lambda a: seq_flash_attention(
                a, a, a, impl="ulysses"))(q)
