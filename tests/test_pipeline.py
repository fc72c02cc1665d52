"""Pipeline-parallel trunk tests (parallel/pipeline.py).

The reference has NO pipeline parallelism (SURVEY §2.7 PP: absent); this is
the TPU-native upgrade filling that slot. Properties verified on the 8-device
CPU mesh:

  * stack/unstack converters round-trip the blocks_{i} checkpoint layout
  * the pipelined forward equals the vanilla per-block model bit-for-bit
    (same params via stack_block_params)
  * the no-mesh sequential fallback equals the meshed pipelined execution
  * gradients match the vanilla model's
  * the FULL train step (grad + adamw, dropout + stochastic depth on) runs
    on a stage x fsdp mesh and trains
  * config validation rejects the unsupported combinations
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.config import ConfigError, load_config
from orbit2_tpu.models import ResSlimViT
from orbit2_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_specs,
    shard_params,
    stack_block_params,
    unstack_block_params,
)
from jax.sharding import PartitionSpec as P

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]


def tiny_model(**kw):
    kwargs = dict(
        default_vars=DEFAULT_VARS, img_size=(16, 32), in_channels=7,
        out_channels=3, superres_mag=4, patch_size=2, embed_dim=64, depth=4,
        decoder_depth=1, num_heads=4, learn_pos_emb=True, drop_rate=0.0,
        drop_path=0.0, attention_impl="xla",
    )
    kwargs.update(kw)
    return ResSlimViT(**kwargs)


def _x(b=8):
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(b, 7, 16, 32)), jnp.float32)


def test_stack_unstack_roundtrip():
    m = tiny_model()
    params = m.init({"params": jax.random.PRNGKey(0)}, _x(2), DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
    stacked = stack_block_params(params)
    assert "blocks_stacked" in stacked and "blocks_0" not in stacked
    qkv = stacked["blocks_stacked"]["attn"]["qkv"]["kernel"]
    assert qkv.shape[0] == 4  # depth-stacked
    back = unstack_block_params(stacked)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_stack_rejects_holes():
    with pytest.raises(ValueError, match="non-contiguous"):
        stack_block_params({"blocks_0": {"w": jnp.zeros(2)},
                            "blocks_2": {"w": jnp.zeros(2)}})


def test_stacked_param_specs_stage_sharded():
    mesh = make_mesh(stage=2, fsdp=2, tensor=2)
    m = tiny_model(pipeline_stages=2)
    params = m.init({"params": jax.random.PRNGKey(0)}, _x(2), DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
    specs = param_specs(params, mesh)

    # stage leads; the per-block Megatron column/row splits follow behind
    # the stack (PP composes with TP via GSPMD auto axes)
    qkv = tuple(specs["blocks_stacked"]["attn"]["qkv"]["kernel"])
    assert qkv[0] == "stage" and qkv[1:] == ("fsdp", "tensor")
    proj = tuple(specs["blocks_stacked"]["attn"]["proj"]["kernel"])
    assert proj[0] == "stage" and proj[1:] == ("tensor", "fsdp")
    norm = tuple(specs["blocks_stacked"]["norm1"]["scale"])
    assert norm[0] == "stage" and all(a is None for a in norm[1:])


def _vanilla_and_pipelined(depth=4, stages=2, **kw):
    """Same weights in both layouts: vanilla per-block model and the
    pipelined model fed stack_block_params(vanilla params)."""
    mv = tiny_model(depth=depth, **kw)
    pv = mv.init({"params": jax.random.PRNGKey(0)}, _x(2), DEFAULT_VARS,
                 OUT_VARS, deterministic=True)["params"]
    mp = tiny_model(depth=depth, pipeline_stages=stages, **kw)
    pp = stack_block_params(pv)
    return mv, pv, mp, pp


def test_pipelined_forward_matches_vanilla_on_mesh():
    mv, pv, mp, pp = _vanilla_and_pipelined()
    x = _x(8)
    ref = mv.apply({"params": pv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)

    mesh = make_mesh(stage=2, replica=2, fsdp=2)
    with mesh:
        sp = shard_params(pp, mesh)
        xs = jax.device_put(x, batch_sharding(mesh))

        @jax.jit
        def fwd(p, x):
            return mp.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                            deterministic=True)

        out = fwd(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_fallback_matches_meshed():
    _, _, mp, pp = _vanilla_and_pipelined()
    x = _x(4)
    # no mesh in context -> sequential sweep over the stacked params
    seq = mp.apply({"params": pp}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    mesh = make_mesh(stage=2, fsdp=2)
    with mesh:
        sp = shard_params(pp, mesh)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, x: mp.apply(
            {"params": p}, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
        )(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_microbatches_more_than_stages():
    _, _, mp, pp = _vanilla_and_pipelined()
    mp4 = dataclasses.replace(mp, pipeline_microbatches=4)
    x = _x(8)
    ref = mp.apply({"params": pp}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    mesh = make_mesh(stage=2, fsdp=2)
    with mesh:
        sp = shard_params(pp, mesh)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, x: mp4.apply(
            {"params": p}, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
        )(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_forward_matches_vanilla_with_tensor_par():
    """PP x TP: stage=2 x fsdp=2 x tensor=2 — the stacked params carry the
    Megatron column/row specs behind the stage dim and the pipelined
    forward still equals the vanilla single-device model."""
    mv, pv, mp, pp = _vanilla_and_pipelined()
    x = _x(8)
    ref = mv.apply({"params": pv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    mesh = make_mesh(stage=2, fsdp=2, tensor=2)
    with mesh:
        sp = shard_params(pp, mesh)
        qkv_shard = sp["blocks_stacked"]["attn"]["qkv"]["kernel"].sharding
        assert tuple(qkv_shard.spec) == ("stage", "fsdp", "tensor")
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, x: mp.apply(
            {"params": p}, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
        )(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_grads_match_vanilla():
    mv, pv, mp, pp = _vanilla_and_pipelined()
    x = _x(4)
    y = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 3, 64, 128)), jnp.float32)

    def loss_v(p):
        out = mv.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                       deterministic=True)
        return jnp.mean((out - y) ** 2)

    def loss_p(p):
        out = mp.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                       deterministic=True)
        return jnp.mean((out - y) ** 2)

    g_ref = jax.grad(loss_v)(pv)
    # tensor=2 in the mesh: TP backward (row/column all-reduces behind the
    # stacked stage dim) must reproduce the single-device grads too
    mesh = make_mesh(stage=2, fsdp=2, tensor=2)
    with mesh:
        sp = shard_params(pp, mesh)
        g_pp = jax.jit(jax.grad(loss_p))(sp)
    g_pp = unstack_block_params(jax.device_get(g_pp))
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    for (pa, la), (pb, lb) in zip(sorted(flat_ref, key=lambda t: str(t[0])),
                                  sorted(flat_pp, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=5e-4, atol=1e-5)


def test_pipelined_train_step_with_dropout():
    """Full train step (grad + adamw) with dropout AND stochastic depth on a
    stage x fsdp mesh: runs, loss finite, params move."""
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    m = tiny_model(depth=4, pipeline_stages=2, drop_rate=0.1, drop_path=0.1)
    x = _x(8)
    y = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 3, 64, 128)), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
    tx = make_optimizer("adamw", {"lr": 1e-3})
    mesh = make_mesh(stage=2, fsdp=2, replica=2)
    loss_metric = METRICS_REGISTRY["bayesian_tv"](aggregate_only=True)
    step = make_train_step(m, loss_metric, None, tx, DEFAULT_VARS, OUT_VARS,
                           mesh=mesh)
    with mesh:
        sp = shard_params(params, mesh)
        before = float(jnp.sum(jnp.abs(
            sp["blocks_stacked"]["attn"]["qkv"]["kernel"])))
        st = tx.init(sp)
        xs = jax.device_put(x, batch_sharding(mesh))
        ys = jax.device_put(y, batch_sharding(mesh))
        new_p, _, loss = step(sp, st, xs, ys, jax.random.PRNGKey(2))
        after = float(jnp.sum(jnp.abs(
            new_p["blocks_stacked"]["attn"]["qkv"]["kernel"])))
    assert np.isfinite(float(loss))
    assert before != after


def test_pretrain_import_across_layouts():
    """A vanilla blocks_{i} checkpoint fine-tunes into a pipelined model and
    vice versa (training/checkpoint.py layout conversion)."""
    from orbit2_tpu.training.checkpoint import load_pretrained_params

    mv, pv, mp, _ = _vanilla_and_pipelined()
    x = _x(2)
    ref = mv.apply({"params": pv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)

    # vanilla ckpt -> pipelined target
    tgt = mp.init({"params": jax.random.PRNGKey(7)}, x, DEFAULT_VARS,
                  OUT_VARS, deterministic=True)["params"]
    merged, report = load_pretrained_params(tgt, pv, patch_size=2)
    assert not report["dropped"]
    out = mp.apply({"params": merged}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # pipelined ckpt -> vanilla target
    tgt_v = mv.init({"params": jax.random.PRNGKey(8)}, x, DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
    merged_v, report_v = load_pretrained_params(
        tgt_v, stack_block_params(pv), patch_size=2)
    assert not report_v["dropped"]
    out_v = mv.apply({"params": merged_v}, x, DEFAULT_VARS, OUT_VARS,
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_config_validation():
    base = dict(
        trainer=dict(task="downscaling", batch_size=8),
        model=dict(preset="res_slimvit", depth=4, num_heads=4),
        data=dict(default_vars=list(DEFAULT_VARS),
                  dict_in_variables={"d": list(DEFAULT_VARS)},
                  dict_out_variables={"d": list(OUT_VARS)},
                  low_res_dir={"d": "/tmp/x"}, high_res_dir={"d": "/tmp/y"},
                  spatial_resolution={"d": 625.0}),
    )

    cfg = load_config({**base, "parallelism": dict(pipeline=2)})
    assert cfg.parallelism.pipeline == 2
    # PP x TP is supported (stacked params keep the Megatron specs)
    cfg_tp = load_config({**base,
                          "parallelism": dict(pipeline=2, tensor_par=2)})
    assert cfg_tp.parallelism.world_size == 4

    with pytest.raises(ConfigError, match="seq_par"):
        load_config({**base,
                     "parallelism": dict(pipeline=2, seq_par=2)})
    with pytest.raises(ConfigError, match="divisible by"):
        load_config({**base, "parallelism": dict(pipeline=3)})
    bad_bs = dict(base)
    bad_bs["trainer"] = dict(task="downscaling", batch_size=6)
    with pytest.raises(ConfigError, match="batch_size"):
        load_config({**bad_bs, "parallelism": dict(pipeline=4)})


def test_pipeline_model_rejects_seq_shard():
    m = tiny_model(depth=4, pipeline_stages=2, seq_shard=True)
    with pytest.raises(ValueError, match="seq_shard"):
        m.init({"params": jax.random.PRNGKey(0)}, _x(2), DEFAULT_VARS,
               OUT_VARS, deterministic=True)


# -- interleaved (circular) schedule ---------------------------------------

def _vanilla_and_interleaved(depth=4, stages=2, interleave=2, mb=4, **kw):
    """Same weights: vanilla per-block model and the interleaved-pipeline
    model fed to_interleaved(stack_block_params(vanilla params))."""
    from orbit2_tpu.parallel.pipeline import to_interleaved

    mv = tiny_model(depth=depth, **kw)
    pv = mv.init({"params": jax.random.PRNGKey(0)}, _x(2), DEFAULT_VARS,
                 OUT_VARS, deterministic=True)["params"]
    mp = tiny_model(depth=depth, pipeline_stages=stages,
                    pipeline_interleave=interleave,
                    pipeline_microbatches=mb, **kw)
    flat = stack_block_params(pv)
    piv = dict(flat)
    piv["blocks_stacked_iv"] = to_interleaved(
        piv.pop("blocks_stacked"), stages, interleave)
    return mv, pv, mp, piv


def test_interleaved_param_layout_and_specs():
    mesh = make_mesh(stage=2, fsdp=2, tensor=2)
    m = tiny_model(depth=4, pipeline_stages=2, pipeline_interleave=2,
                   pipeline_microbatches=4)
    params = m.init({"params": jax.random.PRNGKey(0)}, _x(4), DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
    assert "blocks_stacked_iv" in params and "blocks_stacked" not in params
    qkv = params["blocks_stacked_iv"]["attn"]["qkv"]["kernel"]
    assert qkv.shape[:3] == (2, 2, 1)  # [V, S, dc]
    specs = param_specs(params, mesh)
    sq = tuple(specs["blocks_stacked_iv"]["attn"]["qkv"]["kernel"])
    # stage on dim 1 (each stage owns its V chunks in place), Megatron
    # column split behind the stack
    assert sq[:3] == (None, "stage", None) and sq[3:] == ("fsdp", "tensor")


def test_interleaved_forward_matches_vanilla_on_mesh():
    mv, pv, mp, piv = _vanilla_and_interleaved()
    x = _x(8)
    ref = mv.apply({"params": pv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    # no-mesh fallback first (sequential over the iv layout)
    seq = mp.apply({"params": piv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    mesh = make_mesh(stage=2, replica=2, fsdp=2)
    with mesh:
        sp = shard_params(piv, mesh)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, x: mp.apply(
            {"params": p}, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
        )(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_interleaved_depth8_microbatches4():
    """Deeper trunk, V=2, M=4 > S=2: wrap scheduling exercises the stage-0
    wait buffer across several rounds."""
    mv, pv, mp, piv = _vanilla_and_interleaved(depth=8, stages=2,
                                               interleave=2, mb=4)
    x = _x(8)
    ref = mv.apply({"params": pv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    mesh = make_mesh(stage=2, fsdp=2, tensor=2)
    with mesh:
        sp = shard_params(piv, mesh)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda p, x: mp.apply(
            {"params": p}, x, DEFAULT_VARS, OUT_VARS, deterministic=True)
        )(sp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_interleaved_grads_match_vanilla():
    mv, pv, mp, piv = _vanilla_and_interleaved()
    from orbit2_tpu.parallel.pipeline import from_interleaved

    x = _x(4)
    y = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 3, 64, 128)), jnp.float32)

    def loss_v(p):
        out = mv.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                       deterministic=True)
        return jnp.mean((out - y) ** 2)

    def loss_p(p):
        out = mp.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                       deterministic=True)
        return jnp.mean((out - y) ** 2)

    g_ref = jax.grad(loss_v)(pv)
    mesh = make_mesh(stage=2, fsdp=2, tensor=2)
    with mesh:
        sp = shard_params(piv, mesh)
        g_pp = jax.jit(jax.grad(loss_p))(sp)
    g_pp = jax.device_get(g_pp)
    g_pp["blocks_stacked"] = from_interleaved(g_pp.pop("blocks_stacked_iv"))
    g_pp = unstack_block_params(g_pp)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    for (pa, la), (pb, lb) in zip(sorted(flat_ref, key=lambda t: str(t[0])),
                                  sorted(flat_pp, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=5e-4, atol=1e-5)


def test_interleaved_pretrain_import():
    """vanilla blocks_{i} ckpt -> interleaved target and back."""
    from orbit2_tpu.training.checkpoint import load_pretrained_params

    mv, pv, mp, piv = _vanilla_and_interleaved()
    x = _x(2)
    ref = mv.apply({"params": pv}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)

    tgt = mp.init({"params": jax.random.PRNGKey(7)}, x, DEFAULT_VARS,
                  OUT_VARS, deterministic=True)["params"]
    merged, report = load_pretrained_params(tgt, pv, patch_size=2)
    assert not report["dropped"]
    out = mp.apply({"params": merged}, x, DEFAULT_VARS, OUT_VARS,
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # interleaved ckpt -> vanilla target
    tgt_v = mv.init({"params": jax.random.PRNGKey(8)}, x, DEFAULT_VARS,
                    OUT_VARS, deterministic=True)["params"]
    merged_v, report_v = load_pretrained_params(tgt_v, piv, patch_size=2)
    assert not report_v["dropped"]
    out_v = mv.apply({"params": merged_v}, x, DEFAULT_VARS, OUT_VARS,
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_interleave_config_validation():
    base = dict(
        trainer=dict(task="downscaling", batch_size=8),
        model=dict(preset="res_slimvit", depth=4, num_heads=4),
        data=dict(default_vars=list(DEFAULT_VARS),
                  dict_in_variables={"d": list(DEFAULT_VARS)},
                  dict_out_variables={"d": list(OUT_VARS)},
                  low_res_dir={"d": "/tmp/x"}, high_res_dir={"d": "/tmp/y"},
                  spatial_resolution={"d": 625.0}),
    )
    cfg = load_config({**base, "parallelism": dict(
        pipeline=2, pipeline_interleave=2, pipeline_microbatches=4)})
    assert cfg.parallelism.pipeline_interleave == 2
    with pytest.raises(ConfigError, match="pipeline > 1"):
        load_config({**base,
                     "parallelism": dict(pipeline_interleave=2)})
    with pytest.raises(ConfigError, match="divisible by"):
        load_config({**base, "parallelism": dict(
            pipeline=2, pipeline_interleave=4,
            pipeline_microbatches=4)})  # depth 4 % (2*4)
    with pytest.raises(ConfigError, match="microbatches"):
        load_config({**base, "model": dict(preset="res_slimvit", depth=16,
                                           num_heads=4),
                     "parallelism": dict(pipeline=4, pipeline_interleave=2,
                                         pipeline_microbatches=2)})
