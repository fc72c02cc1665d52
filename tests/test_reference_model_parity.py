"""Whole-model forward parity against the ACTUAL torch reference
Res_Slim_ViT (/root/reference/src/climate_learn/models/hub/res_slimvit.py).

The reference runs here on CPU torch with a single-process gloo group and
FusedAttn.NONE (its always-works SDPA path, attention.py:73-79). Its
state_dict is exported to numpy, imported through
`checkpoint.import_torch_state_dict`, and the two forwards must agree to
fp32 tolerance — this retires the silent-architecture-mismatch risk that
op-level parity tests (tests/test_torch_parity.py) cannot catch.

The reference's unavailable heavy deps are shimmed with minimal equivalents
(timm: trunc_normal_/DropPath/to_2tuple — inert in eval mode; xformers: never
called on the NONE path). The climate_learn package skeleton is constructed
manually so importing the model module does not pull the package __init__
(which needs lpips/torchvision/sympy/torchmetrics).
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"

from orbit2_tpu.utils.torch_reference import (  # noqa: E402
    load_reference_model,
    reference_available,
)

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]

# small but non-trivial: multiple blocks, multiple heads, real decoder
EMBED, DEPTH, DEC_DEPTH, HEADS, P, MAG = 64, 2, 2, 4, 2, 4
IMG = (16, 32)
RES = 625.0


@pytest.fixture(scope="module")
def reference_model():
    if not reference_available(REF_SRC):
        pytest.skip("reference source or torch not available")
    return load_reference_model(
        default_vars=DEFAULT_VARS, img_size=IMG,
        in_channels=len(DEFAULT_VARS), out_channels=len(OUT_VARS),
        spatial_resolution=RES, superres_mag=MAG, cnn_ratio=4, patch_size=P,
        embed_dim=EMBED, depth=DEPTH, decoder_depth=DEC_DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, drop_path=0.1, drop_rate=0.1,
        learn_pos_emb=True, ref_src=REF_SRC)


def _flax_model():
    from orbit2_tpu.models import ResSlimViT

    return ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=IMG,
        in_channels=len(DEFAULT_VARS), out_channels=len(OUT_VARS),
        superres_mag=MAG, cnn_ratio=4, patch_size=P, embed_dim=EMBED,
        depth=DEPTH, decoder_depth=DEC_DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, drop_path=0.1, drop_rate=0.1, learn_pos_emb=True,
        spatial_resolution=RES, attention_impl="xla",
    )


def test_forward_parity_with_torch_reference(reference_model):
    from orbit2_tpu.training.checkpoint import import_torch_state_dict

    sd = {k: v.detach().cpu().numpy()
          for k, v in reference_model.state_dict().items()}
    params = import_torch_state_dict(sd, depth=DEPTH, decoder_depth=DEC_DEPTH)

    rng = np.random.default_rng(42)
    x = rng.normal(size=(2, len(DEFAULT_VARS)) + IMG).astype(np.float32)

    with torch.no_grad():
        want = reference_model(
            torch.from_numpy(x), list(DEFAULT_VARS), list(OUT_VARS)).numpy()

    model = _flax_model()
    got = np.asarray(model.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x),
        DEFAULT_VARS, OUT_VARS, deterministic=True))

    assert got.shape == want.shape == (2, len(OUT_VARS), IMG[0] * MAG, IMG[1] * MAG)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_loss_parity_on_reference_output(reference_model):
    """bayesian_tv of the imported-params flax forward vs the torch forward:
    loss-level agreement (the metric itself is golden-tested elsewhere)."""
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.checkpoint import import_torch_state_dict

    sd = {k: v.detach().cpu().numpy()
          for k, v in reference_model.state_dict().items()}
    params = import_torch_state_dict(sd, depth=DEPTH, decoder_depth=DEC_DEPTH)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, len(DEFAULT_VARS)) + IMG).astype(np.float32)
    y = rng.normal(size=(2, len(OUT_VARS), IMG[0] * MAG, IMG[1] * MAG)
                   ).astype(np.float32)

    with torch.no_grad():
        yhat_ref = reference_model(
            torch.from_numpy(x), list(DEFAULT_VARS), list(OUT_VARS)).numpy()

    model = _flax_model()
    yhat = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x),
        DEFAULT_VARS, OUT_VARS, deterministic=True)

    loss = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    l_ref = float(loss(jnp.asarray(yhat_ref), jnp.asarray(y),
                       var_names=list(OUT_VARS)))
    l_got = float(loss(jnp.asarray(yhat), jnp.asarray(y),
                       var_names=list(OUT_VARS)))
    assert abs(l_ref - l_got) < 1e-4 * max(1.0, abs(l_ref))


def _split_tp(sd, tp, num_heads):
    """Split a full reference state_dict into per-TP-rank shards using the
    reference's Megatron layout (the inverse of consolidate_torch_tp_shards).
    Row-parallel biases are split additively (each rank bias/tp) since the
    reference adds every rank's full bias before the all-reduce SUM."""
    import re

    shards = [dict() for _ in range(tp)]
    for key, t in sd.items():
        v = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        for r in range(tp):
            h0, h1 = r * num_heads // tp, (r + 1) * num_heads // tp
            if re.search(r"attn\.qkv\.weight$", key):
                w = v.reshape(3, num_heads, -1, v.shape[1])
                shards[r][key] = w[:, h0:h1].reshape(-1, v.shape[1])
            elif re.search(r"attn\.qkv\.bias$", key):
                shards[r][key] = v.reshape(3, num_heads, -1)[:, h0:h1].reshape(-1)
            elif re.search(r"var_agg\.kv\.weight$", key):
                w = v.reshape(2, num_heads, -1, v.shape[1])
                shards[r][key] = w[:, h0:h1].reshape(-1, v.shape[1])
            elif re.search(r"var_agg\.kv\.bias$", key):
                shards[r][key] = v.reshape(2, num_heads, -1)[:, h0:h1].reshape(-1)
            elif re.search(r"var_agg\.q\.weight$", key):
                w = v.reshape(num_heads, -1, v.shape[1])
                shards[r][key] = w[h0:h1].reshape(-1, v.shape[1])
            elif re.search(r"var_agg\.q\.bias$", key):
                shards[r][key] = v.reshape(num_heads, -1)[h0:h1].reshape(-1)
            elif re.search(r"mlp\.fc1\.(weight|bias)$", key):
                n = v.shape[0] // tp
                shards[r][key] = v[r * n:(r + 1) * n]
            elif re.search(r"(attn\.proj|var_agg\.proj|mlp\.fc2)\.weight$", key):
                n = v.shape[1] // tp
                shards[r][key] = v[:, r * n:(r + 1) * n]
            elif re.search(r"(attn\.proj|var_agg\.proj|mlp\.fc2)\.bias$", key):
                shards[r][key] = v / tp
            else:
                shards[r][key] = v
    return shards


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_shard_consolidation_roundtrip(reference_model, tp):
    """SURVEY hard-part #6: per-TP-rank reference checkpoints
    (interm_epoch_E.ckpt_rank_R) consolidate back to the full state_dict,
    and the consolidated import still matches the torch forward."""
    from orbit2_tpu.training.checkpoint import (
        consolidate_torch_tp_shards,
        import_torch_state_dict,
    )

    sd = {k: v.detach().cpu().numpy()
          for k, v in reference_model.state_dict().items()}
    shards = _split_tp(sd, tp, HEADS)
    merged = consolidate_torch_tp_shards(shards, num_heads=HEADS)

    assert set(merged) == set(sd)
    for k in sd:
        np.testing.assert_allclose(merged[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)

    # end-to-end: consolidated shards -> flax params -> forward parity
    params = import_torch_state_dict(merged, depth=DEPTH,
                                     decoder_depth=DEC_DEPTH)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, len(DEFAULT_VARS)) + IMG).astype(np.float32)
    with torch.no_grad():
        want = reference_model(
            torch.from_numpy(x), list(DEFAULT_VARS), list(OUT_VARS)).numpy()
    got = np.asarray(_flax_model().apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x),
        DEFAULT_VARS, OUT_VARS, deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_load_reference_state_dict_rank_discovery(tmp_path, reference_model):
    """`.ckpt_rank_R` siblings are discovered and consolidated (the
    reference's tensor-parallel save format,
    examples/intermediate_downscaling.py:781)."""
    from orbit2_tpu.utils.torch_reference import load_reference_state_dict

    sd = {k: v.detach().cpu().numpy()
          for k, v in reference_model.state_dict().items()}
    shards = _split_tp(sd, 2, HEADS)
    for r, shard in enumerate(shards):
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(np.asarray(v))
                     for k, v in shard.items()}},
                   tmp_path / f"interm_epoch_3.ckpt_rank_{r}")

    merged = load_reference_state_dict(
        str(tmp_path / "interm_epoch_3.ckpt_rank_0"), num_heads=HEADS)
    for k in sd:
        np.testing.assert_allclose(merged[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)

    # single-file (tp=1) path
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
               tmp_path / "single.ckpt")
    single = load_reference_state_dict(str(tmp_path / "single.ckpt"),
                                       num_heads=HEADS)
    np.testing.assert_allclose(single["pos_embed"], sd["pos_embed"])


def test_training_trajectory_parity_with_torch_reference():
    """K-step AdamW TRAINING trajectory against the actual torch reference:
    same exported init, same synthetic batches, same lr/betas/weight decay,
    both on CPU fp32 with dropout off. Per-step losses must agree to fp32
    tolerance — this retires the backward/optimizer silent-numerics risk
    that forward-only parity cannot catch (reference train step:
    examples/intermediate_downscaling.py:281-306 with plain fp32
    loss.backward()+optimizer.step() at :726-742, AdamW built by
    loaders.py:398-399)."""
    if not reference_available(REF_SRC):
        pytest.skip("reference source or torch not available")
    from orbit2_tpu.training.checkpoint import import_torch_state_dict
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import clip_replace_constant

    K, LR, BETAS, WD = 5, 2e-3, (0.9, 0.99), 1e-5
    ref = load_reference_model(
        default_vars=DEFAULT_VARS, img_size=IMG,
        in_channels=len(DEFAULT_VARS), out_channels=len(OUT_VARS),
        spatial_resolution=RES, superres_mag=MAG, cnn_ratio=4, patch_size=P,
        embed_dim=EMBED, depth=DEPTH, decoder_depth=DEC_DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, drop_path=0.0, drop_rate=0.0,
        learn_pos_emb=True, ref_src=REF_SRC)
    ref.train()
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in ref.state_dict().items()}  # init snapshot BEFORE steps

    rng = np.random.default_rng(11)
    xs = rng.normal(size=(K, 2, len(DEFAULT_VARS)) + IMG).astype(np.float32)
    ys = rng.normal(size=(K, 2, len(OUT_VARS), IMG[0] * MAG, IMG[1] * MAG)
                    ).astype(np.float32)
    # make the precip channel's clamp active on both sides
    prcp = OUT_VARS.index("total_precipitation_24hr")
    ys[:, :, prcp] = np.abs(ys[:, :, prcp]) * 0.01

    # --- torch trajectory (mirrors the reference training_step) ---
    opt_t = torch.optim.AdamW(ref.parameters(), lr=LR, betas=BETAS,
                              weight_decay=WD)
    losses_t = []
    for k in range(K):
        yhat = ref(torch.from_numpy(xs[k]), list(DEFAULT_VARS), list(OUT_VARS))
        yhat = torch.where(
            torch.arange(yhat.shape[1])[None, :, None, None] == prcp,
            torch.clamp(yhat, min=0.0), yhat)  # clip_replace_constant :267-271
        loss = torch.mean((yhat - torch.from_numpy(ys[k])) ** 2)
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.detach()))

    # --- jax trajectory from the SAME init (the pre-step snapshot) ---
    params = jax.tree.map(jnp.asarray,
                          import_torch_state_dict(sd, depth=DEPTH,
                                                  decoder_depth=DEC_DEPTH))
    model = _flax_model()

    def loss_fn(p, x, y):
        yhat = model.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                           deterministic=True)
        yhat = clip_replace_constant(y, yhat, OUT_VARS)
        return jnp.mean((yhat - y) ** 2)

    opt_j = make_optimizer("adamw", {"lr": LR, "betas": BETAS,
                                     "weight_decay": WD})
    state = opt_j.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    losses_j = []
    for k in range(K):
        loss, grads = grad_fn(params, jnp.asarray(xs[k]), jnp.asarray(ys[k]))
        updates, state = opt_j.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4, atol=1e-6)
    # the trajectory must actually move (first->last loss changes)
    assert abs(losses_t[0] - losses_t[-1]) > 1e-5


def test_exported_checkpoint_loads_into_torch_reference(reference_model):
    """The reverse interop: a flax-side param tree exported with
    export_torch_state_dict must load_state_dict(strict=True) into the torch
    reference and produce the same forward — models trained in this
    framework are usable by reference users."""
    from orbit2_tpu.training.checkpoint import export_torch_state_dict

    model = _flax_model()
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, len(DEFAULT_VARS)) + IMG).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(4)}, jnp.asarray(x),
                        DEFAULT_VARS, OUT_VARS, deterministic=True)["params"]

    sd = export_torch_state_dict(params, patch_size=P)
    ref_keys = set(reference_model.state_dict().keys())
    exp_keys = set(sd.keys())
    # the flax init has no q/kv biases when the reference uses qkv_bias=False
    # either; any other asymmetry is a layout bug
    assert exp_keys - ref_keys == set(), exp_keys - ref_keys
    missing = ref_keys - exp_keys
    assert all("var_agg" in k and k.endswith("bias") for k in missing), missing

    reference_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=not missing)
    with torch.no_grad():
        want = reference_model(
            torch.from_numpy(x), list(DEFAULT_VARS), list(OUT_VARS)).numpy()

    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x), DEFAULT_VARS, OUT_VARS,
        deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
