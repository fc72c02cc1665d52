"""Torch state-dict importer + pretrain key-filtering tests (the parity
bridge, reference intermediate_downscaling.py:116-153)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.training.checkpoint import (
    import_torch_state_dict,
    load_pretrained_params,
)

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
D, DEPTH, DEC, P, MAG, HEADS = 32, 2, 1, 2, 4, 2


def make_model(img=(16, 32)):
    return ResSlimViT(default_vars=DEFAULT_VARS, img_size=img, in_channels=7,
                      out_channels=3, superres_mag=MAG, patch_size=P,
                      embed_dim=D, depth=DEPTH, decoder_depth=DEC,
                      num_heads=HEADS, learn_pos_emb=True)


def fake_torch_state_dict(rng, img=(16, 32)):
    """A reference-layout Res_Slim_ViT state_dict (torch naming/shape
    conventions) filled with random values."""
    sd = {}
    V = len(DEFAULT_VARS)
    L = (img[0] // P) * (img[1] // P)
    for i in range(V):
        sd[f"token_embeds.{i}.proj.weight"] = rng.normal(size=(D, 1, P, P)).astype(np.float32)
        sd[f"token_embeds.{i}.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
    sd["var_embed"] = rng.normal(size=(1, V, D)).astype(np.float32)
    sd["var_query"] = rng.normal(size=(1, 1, D)).astype(np.float32)
    sd["pos_embed"] = rng.normal(size=(1, L, D)).astype(np.float32)
    sd["spatial_embed.weight"] = rng.normal(size=(D, 1)).astype(np.float32)
    sd["spatial_embed.bias"] = rng.normal(size=(D,)).astype(np.float32)
    for lin, od in [("var_agg.q", D), ("var_agg.kv", 2 * D), ("var_agg.proj", D)]:
        sd[f"{lin}.weight"] = rng.normal(size=(od if "proj" not in lin else D, D)).astype(np.float32)
    sd["var_agg.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
    for b in range(DEPTH):
        for ln in ("norm1", "norm2"):
            sd[f"blocks.{b}.{ln}.weight"] = np.ones(D, np.float32)
            sd[f"blocks.{b}.{ln}.bias"] = np.zeros(D, np.float32)
        sd[f"blocks.{b}.attn.qkv.weight"] = rng.normal(size=(3 * D, D)).astype(np.float32)
        sd[f"blocks.{b}.attn.qkv.bias"] = rng.normal(size=(3 * D,)).astype(np.float32)
        sd[f"blocks.{b}.attn.proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"blocks.{b}.attn.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[f"blocks.{b}.mlp.fc1.weight"] = rng.normal(size=(4 * D, D)).astype(np.float32)
        sd[f"blocks.{b}.mlp.fc1.bias"] = rng.normal(size=(4 * D,)).astype(np.float32)
        sd[f"blocks.{b}.mlp.fc2.weight"] = rng.normal(size=(D, 4 * D)).astype(np.float32)
        sd[f"blocks.{b}.mlp.fc2.bias"] = rng.normal(size=(D,)).astype(np.float32)
    sd["norm.weight"] = np.ones(D, np.float32)
    sd["norm.bias"] = np.zeros(D, np.float32)
    for i in range(DEC):
        sd[f"head.{2*i}.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"head.{2*i}.bias"] = rng.normal(size=(D,)).astype(np.float32)
    out_dim = 3 * (MAG * P) ** 2
    sd[f"head.{2*DEC}.weight"] = rng.normal(size=(out_dim, D)).astype(np.float32)
    sd[f"head.{2*DEC}.bias"] = rng.normal(size=(out_dim,)).astype(np.float32)
    sd["conv_out.weight"] = rng.normal(size=(3, 3, 3, 3)).astype(np.float32)
    sd["conv_out.bias"] = rng.normal(size=(3,)).astype(np.float32)
    sd["path2.0.weight"] = rng.normal(size=(4 * MAG * MAG, 7, 3, 3)).astype(np.float32)
    sd["path2.0.bias"] = rng.normal(size=(4 * MAG * MAG,)).astype(np.float32)
    sd["path2.3.weight"] = rng.normal(size=(3, 4, 3, 3)).astype(np.float32)
    sd["path2.3.bias"] = rng.normal(size=(3,)).astype(np.float32)
    return sd


def test_import_structure_matches_model_init():
    rng = np.random.default_rng(0)
    sd = fake_torch_state_dict(rng)
    imported = import_torch_state_dict(sd, depth=DEPTH, decoder_depth=DEC)

    m = make_model()
    x = jnp.ones((1, 7, 16, 32))
    ref = m.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS, OUT_VARS)["params"]

    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(ref)[0]}
    imp_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(imported)[0]}
    assert set(imp_paths) == set(ref_paths)
    for k in ref_paths:
        assert imp_paths[k] == ref_paths[k], k


def test_imported_params_run_forward():
    rng = np.random.default_rng(1)
    sd = fake_torch_state_dict(rng)
    imported = import_torch_state_dict(sd, depth=DEPTH, decoder_depth=DEC)
    m = make_model()
    x = jnp.asarray(rng.normal(size=(1, 7, 16, 32)) * 0.01, dtype=jnp.float32)
    y = m.apply({"params": jax.tree.map(jnp.asarray, imported)}, x,
                DEFAULT_VARS, OUT_VARS)
    assert y.shape == (1, 3, 64, 128)
    assert np.isfinite(np.asarray(y)).all()


def test_pretrain_filtering_and_pos_embed_resize():
    rng = np.random.default_rng(2)
    sd = fake_torch_state_dict(rng, img=(16, 32))
    pre = import_torch_state_dict(sd, depth=DEPTH, decoder_depth=DEC)

    m_big = make_model(img=(32, 64))  # different grid -> pos_embed resize
    x = jnp.ones((1, 7, 32, 64))
    tgt = m_big.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                     OUT_VARS)["params"]
    merged, report = load_pretrained_params(tgt, pre, patch_size=P,
                                            img_size=(32, 64))
    assert any(k[-1] == "pos_embed" for k in report["resized"])
    assert merged["pos_embed"].shape == tgt["pos_embed"].shape
    # everything else transferred
    assert len(report["dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(merged["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(pre["blocks_0"]["attn"]["qkv"]["kernel"]))


def test_export_round_trips_through_import():
    """export_torch_state_dict is the exact inverse of the importer: a real
    model init exported to torch layout and re-imported must be bit-equal,
    and the exported keys/shapes must match the reference state_dict
    layout."""
    from orbit2_tpu.training.checkpoint import export_torch_state_dict

    model = make_model()
    x = jnp.zeros((1, 7, 16, 32), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(3)}, x, DEFAULT_VARS,
                        OUT_VARS, deterministic=True)["params"]

    sd = export_torch_state_dict(params, patch_size=P)

    # layout check: exported keys/shapes == the reference-layout fixture
    ref = fake_torch_state_dict(np.random.default_rng(0))
    missing_bias = {k for k in ref if k not in sd}
    # the model init may or may not include q/kv biases; everything else
    # must match exactly
    assert all("var_agg" in k and k.endswith("bias") for k in missing_bias), \
        missing_bias
    for k in sd:
        assert k in ref or ("var_agg" in k and k.endswith("bias")), k
        if k in ref:
            assert sd[k].shape == ref[k].shape, (k, sd[k].shape, ref[k].shape)

    back = import_torch_state_dict(sd, depth=DEPTH, decoder_depth=DEC)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(jnp.asarray, back)))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))
