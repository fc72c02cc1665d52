"""Mixture-of-Experts trunk + expert parallelism (models/components/moe.py).

The reference has no MoE; this is the `ep` slot of the parallelism taxonomy
(dp/fsdp/tp/sp/pp/ep), built the TPU way: one-hot einsum dispatch with
static capacity, expert weights sharded P("expert"), Switch aux loss sown
into the "moe_loss" collection and folded into the train loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.config import Config, ConfigError, ModelConfig, \
    ParallelismConfig, TrainerConfig
from orbit2_tpu.models.components.blocks import Mlp
from orbit2_tpu.models.components.moe import MoEMlp


def _x(key=0, b=2, l=16, d=32):
    return jax.random.normal(jax.random.PRNGKey(key), (b, l, d))


def test_moe_single_expert_matches_dense_mlp():
    """E=1 with ample capacity routes every token to the one expert with
    gate 1.0 — bit-identical to the dense Mlp with the same weights."""
    x = _x()
    moe = MoEMlp(dim=32, hidden_features=64, num_experts=1,
                 capacity_factor=1.0)
    p = moe.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    y_moe, _ = moe.apply({"params": p}, x, mutable=["moe_loss"])
    dense = Mlp(hidden_features=64, out_features=32, drop=0.0)
    y_dense = dense.apply(
        {"params": {"fc1": {"kernel": p["wi"][0], "bias": p["bi"][0]},
                    "fc2": {"kernel": p["wo"][0], "bias": p["bo"][0]}}},
        x, True)
    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                               rtol=1e-6, atol=1e-6)


def test_moe_capacity_drops_overflow_tokens():
    """With capacity 1 token/expert, overflow tokens get ZERO MoE output
    (they keep only their residual stream in a Block) — never garbage."""
    x = _x(l=16)
    moe = MoEMlp(dim=32, hidden_features=64, num_experts=2,
                 capacity_factor=2 / 16)  # C = 1
    v = moe.init({"params": jax.random.PRNGKey(1)}, x)
    y, _ = moe.apply({"params": v["params"]}, x, mutable=["moe_loss"])
    # at most E*C = 2 tokens per batch row produce nonzero output
    nonzero = np.abs(np.asarray(y)).sum(-1) > 1e-8  # [B, L]
    assert (nonzero.sum(axis=1) <= 2).all()


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_aux_loss_near_one_for_uniform_router(top_k):
    """Switch aux loss is E * sum_e f_e p_e == 1.0 at perfect balance; a
    fresh (near-uniform) router must sit close to that."""
    x = _x(b=4, l=64)
    moe = MoEMlp(dim=32, hidden_features=64, num_experts=4,
                 capacity_factor=2.0, top_k=top_k)
    v = moe.init({"params": jax.random.PRNGKey(1)}, x)
    _, sown = moe.apply({"params": v["params"]}, x, mutable=["moe_loss"])
    (aux,) = jax.tree.leaves(sown["moe_loss"])
    assert 0.9 < float(aux) < 1.3


def test_moe_router_receives_gradient():
    x = _x()
    moe = MoEMlp(dim=32, hidden_features=64, num_experts=4,
                 capacity_factor=2.0)
    v = moe.init({"params": jax.random.PRNGKey(1)}, x)

    def loss(p):
        out, sown = moe.apply({"params": p}, x, mutable=["moe_loss"])
        (aux,) = jax.tree.leaves(sown["moe_loss"])
        return (out ** 2).mean() + 0.01 * aux

    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(g["router_kernel"]).max()) > 0
    assert float(jnp.abs(g["wi"]).max()) > 0


def _moe_cfg(expert_par=1, fsdp=1, tensor=1):
    return Config(
        trainer=TrainerConfig(batch_size=4, remat=False),
        parallelism=ParallelismConfig(expert_par=expert_par, fsdp=fsdp,
                                      tensor_par=tensor),
        model=ModelConfig(embed_dim=64, depth=2, decoder_depth=1,
                          num_heads=2, moe_experts=4, moe_every=2,
                          moe_capacity_factor=2.0),
    ).validate()


def _init_and_step(cfg, mesh):
    """Build the flagship model + train step for cfg on mesh; run one step
    on fixed data and return (loss, params_after)."""
    from orbit2_tpu.metrics.metrics import MSE
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.parallel.mesh import batch_sharding
    from orbit2_tpu.parallel.sharding import shard_params
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    m = cfg.model
    in_vars = ("land_sea_mask", "orography", "lattitude", "landcover",
               "2m_temperature_max")
    out_vars = ("2m_temperature_max",)
    model = ResSlimViT(
        default_vars=in_vars, img_size=(8, 16), in_channels=len(in_vars),
        out_channels=1, superres_mag=2, patch_size=2, embed_dim=m.embed_dim,
        depth=m.depth, decoder_depth=1, num_heads=m.num_heads,
        drop_path=0.0, drop_rate=0.0, learn_pos_emb=True,
        spatial_resolution=625.0, attention_impl="xla",
        moe_experts=m.moe_experts, moe_every=m.moe_every,
        moe_capacity_factor=m.moe_capacity_factor, moe_top_k=m.moe_top_k,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, len(in_vars), 8, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 16, 32))
    params = model.init({"params": jax.random.PRNGKey(2)},
                        x[:2], in_vars, out_vars,
                        deterministic=True)["params"]
    tx = make_optimizer("adamw", {"lr": 1e-3, "weight_decay": 0.0,
                                  "betas": (0.9, 0.99)})
    opt_state = tx.init(params)
    step = make_train_step(model, MSE(aggregate_only=True), None, tx,
                           in_vars, out_vars, mesh=mesh,
                           moe_aux_weight=0.01)
    if mesh is not None:
        params = shard_params(params, mesh)
        opt_state = tx.init(params)
        x = jax.device_put(x, batch_sharding(mesh))
        y = jax.device_put(y, batch_sharding(mesh))
        with mesh:
            new_params, _, loss = step(params, opt_state, x, y,
                                       jax.random.PRNGKey(3))
    else:
        new_params, _, loss = step(params, opt_state, x, y,
                                   jax.random.PRNGKey(3))
    return float(loss), new_params


def test_moe_train_step_expert_parallel_matches_single_device():
    """Full train step through a MoE trunk on an expert=2 x fsdp=2 x
    tensor=2 mesh == the single-device step (same seed, same data)."""
    from orbit2_tpu.parallel.mesh import make_mesh

    cfg = _moe_cfg(expert_par=2, fsdp=2, tensor=2)
    loss_1, p_1 = _init_and_step(cfg, None)
    mesh = make_mesh(expert=2, fsdp=2, tensor=2)
    loss_n, p_n = _init_and_step(cfg, mesh)
    assert np.isfinite(loss_1) and np.isfinite(loss_n)
    np.testing.assert_allclose(loss_1, loss_n, rtol=2e-4)
    flat1 = jax.tree.leaves(p_1)
    flatn = [np.asarray(l) for l in jax.tree.leaves(p_n)]
    for a, b in zip(flat1, flatn):
        np.testing.assert_allclose(np.asarray(a), b, rtol=3e-3, atol=3e-5)


def test_moe_param_shardings_put_experts_on_expert_axis():
    from jax.sharding import PartitionSpec as P

    from orbit2_tpu.parallel.mesh import make_mesh
    from orbit2_tpu.parallel.sharding import spec_for

    mesh = make_mesh(expert=2, fsdp=2, tensor=2)
    assert spec_for("blocks_1/moe_mlp/wi", (4, 64, 256), mesh) == \
        P("expert", "fsdp", "tensor")
    assert spec_for("blocks_1/moe_mlp/wo", (4, 256, 64), mesh) == \
        P("expert", "tensor", "fsdp")
    # the fp32 router stays replicated
    assert spec_for("blocks_1/moe_mlp/router_kernel", (64, 4), mesh) == P()


def test_moe_config_validation():
    with pytest.raises(ConfigError, match="expert_par"):
        Config(model=ModelConfig(moe_experts=0),
               parallelism=ParallelismConfig(expert_par=2)).validate()
    with pytest.raises(ConfigError, match="divisible"):
        Config(model=ModelConfig(moe_experts=3),
               parallelism=ParallelismConfig(expert_par=2)).validate()
    with pytest.raises(ConfigError, match="pipelined"):
        Config(model=ModelConfig(moe_experts=4, depth=4),
               parallelism=ParallelismConfig(pipeline=2)).validate()
    with pytest.raises(ConfigError, match="res_slimvit"):
        Config(model=ModelConfig(moe_experts=4, preset="vit")).validate()
    with pytest.raises(ConfigError, match="moe_top_k"):
        Config(model=ModelConfig(moe_experts=1, moe_top_k=2)).validate()
    with pytest.raises(ConfigError, match="zero MoE layers"):
        Config(model=ModelConfig(moe_experts=4, depth=2,
                                 moe_every=3)).validate()
    with pytest.raises(ConfigError, match="seq_par"):
        Config(model=ModelConfig(moe_experts=4, num_heads=16),
               parallelism=ParallelismConfig(seq_par=2)).validate()
    # a valid MoE + EP config passes
    _moe_cfg(expert_par=2)


def test_moe_block_rejects_quant():
    """w8a8 serving of a MoE trunk must fail loudly, not silently serve
    unquantized expert FFNs (advisor r4 medium finding)."""
    from orbit2_tpu.models.components.blocks import Block

    x = _x(d=32)
    blk = Block(dim=32, num_heads=2, moe_experts=2, quant="w8a8")
    with pytest.raises(ValueError, match="quant"):
        blk.init({"params": jax.random.PRNGKey(0)}, x)


def test_moe_mlp_applies_proj_dropout():
    """drop > 0 must actually drop in training mode (advisor r4 medium
    finding: MoE blocks silently lost MLP dropout)."""
    x = _x()
    moe = MoEMlp(dim=32, hidden_features=64, num_experts=2,
                 capacity_factor=2.0, drop=0.5)
    v = moe.init({"params": jax.random.PRNGKey(1)}, x)
    y_det, _ = moe.apply({"params": v["params"]}, x, True,
                         mutable=["moe_loss"])
    y_tr, _ = moe.apply({"params": v["params"]}, x, False,
                        mutable=["moe_loss"],
                        rngs={"dropout": jax.random.PRNGKey(2)})
    # training output differs from deterministic; some entries exactly 0
    assert not np.allclose(np.asarray(y_det), np.asarray(y_tr))
    frac_zero = float((np.asarray(y_tr) == 0).mean())
    assert frac_zero > 0.2


def test_moe_top_k2_single_expert_no_double_placement():
    """top_k=2 with an all-zero second round must not re-place tokens on
    expert 0 (advisor r4 low finding). Construct E=2 where one expert's
    prob underflows to exactly 0 for every token: round 2 must place
    nothing for those tokens rather than re-picking expert 0."""
    # capacity_factor=1.0 with top_k=2 -> C == L: expert 0 can hold every
    # token ONCE. The pre-fix bug re-picked expert 0 in round 2, burning a
    # second (over-capacity, dropped) slot per token while the gate
    # renormalization split 0.5/0.5 — halving the output.
    moe = MoEMlp(dim=32, hidden_features=64, num_experts=2,
                 capacity_factor=1.0, top_k=2)
    x = jnp.ones((2, 16, 32))  # identical tokens, all-positive
    v = moe.init({"params": jax.random.PRNGKey(1)}, x)
    p = dict(v["params"])
    # router saturates softmax: logit margin 10*32=320 -> prob_1 == 0 in fp32
    rk = np.zeros((32, 2), np.float32)
    rk[:, 0] = 10.0
    p["router_kernel"] = jnp.asarray(rk)
    probs = jax.nn.softmax(x[0, 0] @ jnp.asarray(rk))
    assert float(probs[1]) == 0.0  # underflow case actually constructed
    y, _ = moe.apply({"params": p}, x, True, mutable=["moe_loss"])
    # surviving round-0 gate must renormalize to 1.0 -> output == the
    # single-expert dense pass, not half of it
    dense = Mlp(hidden_features=64, out_features=32, drop=0.0)
    y_dense = dense.apply(
        {"params": {"fc1": {"kernel": p["wi"][0], "bias": p["bi"][0]},
                    "fc2": {"kernel": p["wo"][0], "bias": p["bo"][0]}}},
        x, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_dense),
                               rtol=1e-5, atol=1e-5)


def test_trainer_moe_fit_smoke(synth_dataset, tmp_path):
    """Trainer.fit through a MoE config on an expert=2 x fsdp=2 x tensor=2
    mesh: loss finite, "moe_loss" kept out of threaded aux state."""
    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    ds = synth_dataset
    raw = {
        "trainer": {"max_epochs": 1, "batch_size": 4, "buffer_size": 8,
                    "num_workers": 0, "data_type": "float32",
                    "train_loss": "mse", "remat": False},
        "parallelism": {"fsdp": 2, "tensor_par": 2, "expert_par": 2},
        "tiling": {"do_tiling": False},
        "model": {"preset": "res_slimvit", "lr": 1e-3, "warmup_epochs": 1,
                  "superres_mag": 4, "patch_size": 2, "embed_dim": 32,
                  "depth": 2, "decoder_depth": 1, "num_heads": 2,
                  "drop_path": 0.0, "drop_rate": 0.0,
                  "attention_impl": "xla", "moe_experts": 2,
                  "moe_every": 2, "moe_capacity_factor": 2.0},
        "data": {
            "low_res_dir": {"S": ds["low"]},
            "high_res_dir": {"S": ds["high"]},
            "spatial_resolution": {"S": 625},
            "default_vars": list(ds["in_vars"]),
            "dict_in_variables": {"S": list(ds["in_vars"])},
            "dict_out_variables": {"S": list(ds["out_vars"])},
            "var_weights": {},
        },
    }
    t = Trainer(load_config(raw), checkpoint_dir=str(tmp_path / "ck"))
    hist = t.fit(max_epochs=1, max_steps_per_epoch=3)
    assert hist and np.isfinite(hist[-1]["loss"])
    assert "moe_loss" not in t.aux
