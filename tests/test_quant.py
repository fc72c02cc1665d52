"""w8a8 serving path: op accuracy, param conversion, model-level parity.

The quantized path is an opt-in SERVING feature (model.quant="w8a8",
ops/quant.py, utils/quantize.py) measured at 1.285x on the 1B trunk chain
(scripts/bench_int8_probe.py). These tests pin its semantics on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.ops.quant import quantize_weight, w8a8_matmul
from orbit2_tpu.utils.quantize import quantize_params

IN_VARS = ("land_sea_mask", "orography", "lattitude", "landcover", "t2m")
OUT_VARS = ("t2m",)
H, W = 8, 16


def test_w8a8_matmul_close_to_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(48,)), jnp.float32)
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (48,)
    ref = x @ w + b
    got = w8a8_matmul(x, wq, ws, b)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_w8a8_weight_roundtrip_bound():
    # per-channel symmetric: |w - wq*s| <= s/2 elementwise
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    wq, s = quantize_weight(w)
    err = jnp.abs(wq.astype(jnp.float32) * s[None, :] - w)
    assert float(jnp.max(err - s[None, :] / 2)) <= 1e-6


def _models():
    model = ResSlimViT(
        default_vars=IN_VARS, img_size=(H, W), in_channels=len(IN_VARS),
        out_channels=1, superres_mag=2, patch_size=2, embed_dim=64,
        depth=2, decoder_depth=1, num_heads=4, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="xla",
        drop_rate=0.0, drop_path=0.0, dtype=jnp.float32)
    return model, dataclasses.replace(model, quant="w8a8")


def test_model_quant_forward_close_and_int8():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, len(IN_VARS), H, W)), jnp.float32)
    model, qmodel = _models()
    params = model.init({"params": jax.random.PRNGKey(0)}, x, IN_VARS,
                        OUT_VARS, deterministic=True)["params"]
    qparams = quantize_params(qmodel, params, x, IN_VARS, OUT_VARS)

    # the trunk denses hold int8 kernels (half the serving bytes)
    blk = qparams["blocks_0"]
    for mod, name in (("attn", "qkv"), ("attn", "proj"),
                      ("mlp", "fc1"), ("mlp", "fc2")):
        node = blk[mod][name]
        assert node["kernel_q"].dtype == jnp.int8
        assert "kernel" not in node

    ref = model.apply({"params": params}, x, IN_VARS, OUT_VARS,
                      deterministic=True)
    got = qmodel.apply({"params": qparams}, x, IN_VARS, OUT_VARS,
                       deterministic=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel
    # and it actually changed something (int8 is not a no-op)
    assert not np.allclose(np.asarray(got), np.asarray(ref))


def test_quant_is_serving_only():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, len(IN_VARS), H, W)), jnp.float32)
    _, qmodel = _models()
    qmodel = dataclasses.replace(qmodel, drop_rate=0.1)
    qparams = qmodel.init({"params": jax.random.PRNGKey(0)}, x, IN_VARS,
                          OUT_VARS, deterministic=True)["params"]
    # ValueError, not AssertionError: the guard must survive python -O
    with pytest.raises(ValueError, match="serving-only"):
        qmodel.apply({"params": qparams}, x, IN_VARS, OUT_VARS,
                     deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
