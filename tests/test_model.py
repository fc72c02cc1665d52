"""Model tests: shape contracts for every hub model (the reference tests
shapes only for the simple models, tests/models/test_models.py:17-108, and
skips Res_Slim_ViT entirely — here the flagship is covered too), plus
behavioral checks: pixel-shuffle/unpatchify parity, pos-embed resize,
dropout determinism, variable-subset selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.models.baselines import Interpolation, Persistence
from orbit2_tpu.ops.pixel_shuffle import pixel_shuffle_nchw, pixel_shuffle_nhwc
from orbit2_tpu.ops.pos_embed import (
    get_2d_sincos_pos_embed,
    interpolate_pos_embed_on_the_fly,
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


@pytest.fixture(scope="module")
def model_and_params():
    m = tiny_model()
    x = jnp.ones((2, 7, 16, 32))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS, OUT_VARS)
    return m, variables


def test_forward_shape(model_and_params):
    m, v = model_and_params
    x = jnp.ones((2, 7, 16, 32))
    y = m.apply(v, x, DEFAULT_VARS, OUT_VARS)
    assert y.shape == (2, 3, 64, 128)


def test_param_count_formula():
    """params ~ depth*12D^2 like the reference arithmetic (SURVEY.md §2.2)."""
    m = tiny_model()
    x = jnp.ones((1, 7, 16, 32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS, OUT_VARS)
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    D, depth = 64, 2
    rough = depth * 12 * D * D
    assert rough < n < rough * 6  # embeds/head/pos dominate at tiny scale


def test_history_input_flattened(model_and_params):
    m, v = model_and_params
    x5 = jnp.ones((2, 1, 7, 16, 32))
    y = m.apply(v, x5, DEFAULT_VARS, OUT_VARS)
    assert y.shape == (2, 3, 64, 128)


def test_variable_subset_uses_right_embeddings(model_and_params):
    """Passing a reordered in_variables must change which token embeddings
    are used (reference get_var_ids, res_slimvit.py:182-190)."""
    m, v = model_and_params
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 7, 16, 32)),
                    dtype=jnp.float32)
    y1 = m.apply(v, x, DEFAULT_VARS, OUT_VARS)
    reordered = DEFAULT_VARS[:4] + ("2m_temperature_min",
                                    "total_precipitation_24hr",
                                    "2m_temperature_max")
    y2 = m.apply(v, x, reordered, OUT_VARS)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_dropout_deterministic_vs_train(model_and_params):
    m, v = model_and_params
    x = jnp.ones((2, 7, 16, 32))
    y1 = m.apply(v, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
    y2 = m.apply(v, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    yt1 = m.apply(v, x, DEFAULT_VARS, OUT_VARS, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    yt2 = m.apply(v, x, DEFAULT_VARS, OUT_VARS, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(yt1), np.asarray(yt2))


def test_phase_switch_same_params(model_and_params):
    """for_phase changes geometry without touching params
    (reference data_config, res_slimvit.py:148-164)."""
    m, v = model_and_params
    m2 = m.for_phase(spatial_resolution=111.0, img_size=(32, 64),
                     in_channels=7, out_channels=3)
    x = jnp.ones((1, 7, 32, 64))
    y = m2.apply(v, x, DEFAULT_VARS, OUT_VARS)
    assert y.shape == (1, 3, 128, 256)


def test_pixel_shuffle_matches_torch_semantics():
    """out[b, c, h*r+i, w*r+j] == in[b, c*r^2 + i*r + j, h, w]."""
    r = 2
    x = np.arange(2 * 8 * 3 * 4, dtype=np.float32).reshape(2, 8, 3, 4)
    y = np.asarray(pixel_shuffle_nchw(jnp.asarray(x), r))
    for b in (0, 1):
        for c in (0, 1):
            for h in (0, 2):
                for w in (0, 3):
                    for i in (0, 1):
                        for j in (0, 1):
                            assert y[b, c, h * r + i, w * r + j] == x[b, c * r * r + i * r + j, h, w]
    # NHWC variant agrees with NCHW variant
    y2 = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x.transpose(0, 2, 3, 1)), r))
    np.testing.assert_allclose(y2.transpose(0, 3, 1, 2), y)


def test_sincos_pos_embed_properties():
    pe = get_2d_sincos_pos_embed(64, 8, 16)
    assert pe.shape == (128, 64)
    # first position: sin(0)=0 / cos(0)=1 halves per h/w split
    np.testing.assert_allclose(pe[0, :16], 0, atol=1e-12)
    np.testing.assert_allclose(pe[0, 16:32], 1, atol=1e-12)


def test_pos_embed_resize_identity_and_shape():
    pe = jnp.asarray(get_2d_sincos_pos_embed(32, 8, 16))[None]
    same = interpolate_pos_embed_on_the_fly(pe, 2, (16, 32))
    assert same is pe  # no-op when grids match
    up = interpolate_pos_embed_on_the_fly(pe, 2, (32, 64))
    assert up.shape == (1, 16 * 32, 32)


def test_interpolation_baseline():
    x = jnp.ones((2, 3, 8, 16))
    y = Interpolation(scale_factor=2.0, mode="bilinear")(x)
    assert y.shape == (2, 3, 16, 32)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)


def test_persistence_baseline():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 4, 4)),
                    dtype=jnp.float32)
    y = Persistence(channels=(1, 3))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[:, [1, 3]])


def test_varagg_reduction_matches_naive_cross_attention():
    """The algebraically-reduced VariableMappingAttention must equal the
    naive formulation (q/kv projections + softmax + value matmul) exactly —
    same params, same math (reference attention.py:132-183 with N_a=1)."""
    from orbit2_tpu.models.components.blocks import VariableMappingAttention

    D, H, V, Bp = 32, 4, 7, 10
    hd = D // H
    m = VariableMappingAttention(dim=D, num_heads=H, qkv_bias=False,
                                 attn_drop=0.0, proj_drop=0.0)
    rng = np.random.default_rng(0)
    var_query = jnp.asarray(rng.normal(size=(1, 1, D)), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(Bp, V, D)), dtype=jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, var_query, x)["params"]
    got = np.asarray(m.apply({"params": params}, var_query, x))

    # naive reference math with the same parameters
    qk = np.asarray(params["q_kernel"])
    kvk = np.asarray(params["kv_kernel"])
    pk = np.asarray(params["proj"]["kernel"])
    pb = np.asarray(params["proj"]["bias"])
    q = (np.asarray(var_query)[0, 0] @ qk).reshape(H, hd)
    kv = np.asarray(x) @ kvk  # [Bp, V, 2D]
    k = kv[..., :D].reshape(Bp, V, H, hd)
    v = kv[..., D:].reshape(Bp, V, H, hd)
    scores = np.einsum("hd,bvhd->bvh", q, k) * hd**-0.5
    attn = np.exp(scores - scores.max(axis=1, keepdims=True))
    attn = attn / attn.sum(axis=1, keepdims=True)
    out = np.einsum("bvh,bvhd->bhd", attn, v).reshape(Bp, 1, D)
    want = out @ pk + pb
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_gelu_approx_tanh_option(model_and_params):
    """gelu_approx='tanh' (opt-in, -4.5% trunk step time measured at 117M,
    scripts/bench_r4_fusion.py) shares the param tree with the exact-erf
    default and produces a close-but-different forward; unknown values are
    rejected at config validation."""
    m_exact, v = model_and_params
    m_tanh = tiny_model(gelu_approx="tanh")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 7, 16, 32)),
                    dtype=jnp.float32)
    y_exact = np.asarray(m_exact.apply(v, x, DEFAULT_VARS, OUT_VARS))
    y_tanh = np.asarray(m_tanh.apply(v, x, DEFAULT_VARS, OUT_VARS))
    assert np.abs(y_exact - y_tanh).max() > 0          # different numerics
    np.testing.assert_allclose(y_tanh, y_exact, atol=0.05)  # same function

    from orbit2_tpu.config import ConfigError, ModelConfig

    with pytest.raises(ConfigError, match="gelu_approx"):
        ModelConfig(gelu_approx="fast").validate()
