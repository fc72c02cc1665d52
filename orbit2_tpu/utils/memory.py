"""Device-memory telemetry and ahead-of-time memory planning.

The reference's memory story is runtime prints of
``torch.cuda.memory_reserved`` sprinkled through the training driver
(reference examples/intermediate_downscaling.py:514, 546, 746-747, 772, 793)
— you find out whether a config fits by running it. Here:

- :func:`device_memory_stats` is the runtime equivalent (TPU/GPU allocator
  stats, riding the Trainer's JSONL metrics stream instead of stdout), and
- :func:`plan_train_memory` is the TPU-idiomatic upgrade the reference can't
  do: because the whole train step is one XLA program, it can be lowered and
  compiled ABSTRACTLY (no buffers materialized) for any config × mesh, and
  the compiler's own memory analysis read back BEFORE burning pod time.
  The 10B config memory-plans on a laptop this way (tests/test_scale_aot.py
  uses the same mechanism as a sharding proof).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_STAT_KEYS = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
              "largest_alloc_size")


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Allocator stats for one device, or None where the backend keeps none
    (CPU). TPU/GPU runtimes expose ``Device.memory_stats()``; the subset
    returned here mirrors what the reference prints via
    ``torch.cuda.memory_reserved`` (intermediate_downscaling.py:746-747)."""
    d = device if device is not None else jax.local_devices()[0]
    get = getattr(d, "memory_stats", None)
    if get is None:
        return None
    try:
        stats = get()
    except Exception:  # backend stub without real allocator stats
        return None
    if not stats:
        return None
    return {k: int(stats[k]) for k in _STAT_KEYS if k in stats}


def log_memory(metrics, event: str = "memory", **extra) -> Optional[Dict]:
    """Emit one allocator snapshot to a MetricsLogger (no-op on CPU)."""
    stats = device_memory_stats()
    if stats is None:
        return None
    return metrics.log(event, **stats, **extra)


def plan_train_memory(cfg, *, img, in_channels: int, out_channels: int,
                      batch: int, mesh=None,
                      include_collectives: bool = False) -> Dict[str, Any]:
    """AOT-compile the FULL train step for ``cfg`` at tile shape ``img`` on
    ``mesh`` (default: the config's own parallelism mesh) without allocating
    any real buffers, and return the per-device memory breakdown.
    ``in_channels``/``out_channels`` apply only to bare model-dim configs;
    a config with data.dict_*_variables plans its first phase's real lists.

    Returns a dict with ``params`` (count), ``param_bytes_per_device`` /
    ``opt_bytes_per_device`` (exact, from the sharding layout — these honor
    trainer.adam_{mu,nu}_dtype), ``batch_bytes_per_device``, and — where the
    backend's compiler reports it — ``argument_bytes``, ``output_bytes``,
    ``temp_bytes`` (activations + scratch) and ``code_bytes`` from XLA's
    ``compiled.memory_analysis()``. ``fits_hbm`` compares the total against
    ``hbm_limit_bytes`` when a real device advertises one.
    """
    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.parallel.mesh import batch_sharding, mesh_from_config
    from orbit2_tpu.parallel.sharding import param_shardings
    from orbit2_tpu.registry import METRICS_REGISTRY
    import orbit2_tpu.metrics.metrics  # noqa: F401  (registry population)
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import make_train_step

    c = cfg.validate()
    if c.model.preset != "res_slimvit":
        raise NotImplementedError(
            "plan_train_memory covers the res_slimvit flagship; conv presets "
            "are small enough to size at runtime via device_memory_stats()")
    mesh = mesh if mesh is not None else mesh_from_config(c.parallelism)

    m = c.model
    if c.data.dict_in_variables:
        # plan with the config's first data phase's real variable lists
        key = sorted(c.data.dict_in_variables)[0]
        in_vars = tuple(c.data.dict_in_variables[key])
        out_vars = tuple(c.data.dict_out_variables[key])
        default_vars = tuple(c.data.default_vars)
        in_channels, out_channels = len(in_vars), len(out_vars)
    else:
        # the flagship residual head needs the static-var channels present
        # (res_slimvit.py::find_var_index); fall back to the reference's
        # canonical 7-variable downscaling set for bare model-dim configs
        default_vars = ("land_sea_mask", "orography", "lattitude",
                        "landcover", "total_precipitation_24hr",
                        "2m_temperature_min", "2m_temperature_max")
        if in_channels > len(default_vars):
            raise ValueError(
                f"in_channels={in_channels} exceeds the canonical "
                f"{len(default_vars)}-variable set; configure data.* lists")
        in_vars = default_vars[:in_channels]
        out_vars = default_vars[-out_channels:]
    model = ResSlimViT(
        default_vars=default_vars, img_size=tuple(img),
        in_channels=in_channels, out_channels=out_channels,
        superres_mag=m.superres_mag, cnn_ratio=m.cnn_ratio,
        patch_size=m.patch_size, embed_dim=m.embed_dim, depth=m.depth,
        decoder_depth=m.decoder_depth, num_heads=m.num_heads,
        mlp_ratio=m.mlp_ratio, drop_path=m.drop_path, drop_rate=m.drop_rate,
        learn_pos_emb=True, spatial_resolution=625.0,
        attention_impl="xla" if m.attention_impl == "auto" else m.attention_impl,
        gelu_approx=m.gelu_approx, remat=c.trainer.remat,
        remat_policy=c.trainer.remat_policy,
        # pipeline stages follow the MESH's stage axis (not just the config)
        # so plan_mesh_scaling can sweep pipelined shapes against the same
        # config (parallel/pipeline.py)
        pipeline_stages=int(dict(mesh.shape).get("stage", 1)),
        pipeline_microbatches=c.parallelism.pipeline_microbatches,
        pipeline_interleave=(c.parallelism.pipeline_interleave
                             if dict(mesh.shape).get("stage", 1) > 1 else 1),
        moe_experts=m.moe_experts, moe_every=m.moe_every,
        moe_capacity_factor=m.moe_capacity_factor, moe_top_k=m.moe_top_k,
        dtype=jnp.bfloat16 if c.trainer.data_type == "bfloat16" else jnp.float32,
    )
    h, w = img
    mag = m.superres_mag
    x = jax.ShapeDtypeStruct((batch, in_channels, h, w), jnp.float32,
                             sharding=batch_sharding(mesh))
    y = jax.ShapeDtypeStruct((batch, out_channels, h * mag, w * mag),
                             jnp.float32, sharding=batch_sharding(mesh))

    def init_fn(r):
        return model.init({"params": r},
                          jnp.zeros((2, in_channels, h, w), jnp.float32),
                          in_vars, out_vars, deterministic=True)["params"]

    abstract_params = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    shardings = param_shardings(abstract_params, mesh)
    tx = make_optimizer("adamw", {
        "lr": m.lr, "weight_decay": m.weight_decay,
        "betas": (m.beta_1, m.beta_2),
        "mu_dtype": c.trainer.adam_mu_dtype,
        "nu_dtype": c.trainer.adam_nu_dtype,
    })
    abstract_opt = jax.eval_shape(tx.init, abstract_params)
    opt_shardings = param_shardings(abstract_opt, mesh)

    def _shard_bytes(tree, shs):
        return sum(
            int(np.prod(s.shard_shape(l.shape))) * l.dtype.itemsize
            for l, s in zip(jax.tree.leaves(tree), jax.tree.leaves(shs)))

    loss = METRICS_REGISTRY[c.trainer.train_loss](aggregate_only=True)
    step = make_train_step(model, loss, None, tx, in_vars, out_vars,
                           mesh=mesh, grad_accum=c.trainer.grad_accum,
                           moe_aux_weight=m.moe_aux_weight)

    def _abstract(tree, shs):
        return jax.tree.map(
            lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
            tree, shs)

    rng = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    with mesh:
        compiled = step.lower(_abstract(abstract_params, shardings),
                              _abstract(abstract_opt, opt_shardings),
                              x, y, rng).compile()

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(abstract_params))
    plan: Dict[str, Any] = {
        "params": n_params,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "param_bytes_per_device": _shard_bytes(abstract_params, shardings),
        "opt_bytes_per_device": _shard_bytes(abstract_opt, opt_shardings),
        "batch_bytes_per_device": (
            int(np.prod(x.sharding.shard_shape(x.shape))) * 4
            + int(np.prod(y.sharding.shard_shape(y.shape))) * 4),
    }
    mem = compiled.memory_analysis()
    if mem is not None:
        for field, key in (("argument_size_in_bytes", "argument_bytes"),
                           ("output_size_in_bytes", "output_bytes"),
                           ("temp_size_in_bytes", "temp_bytes"),
                           ("generated_code_size_in_bytes", "code_bytes")):
            v = getattr(mem, field, None)
            if v:
                plan[key] = int(v)
    # donated params/opt make arguments alias outputs; the live set is
    # arguments + temps (+ code). Fall back to the layout-derived numbers
    # when the backend reports no analysis (CPU).
    plan["total_bytes_per_device"] = (
        plan.get("argument_bytes",
                 plan["param_bytes_per_device"]
                 + plan["opt_bytes_per_device"]
                 + plan["batch_bytes_per_device"])
        + plan.get("temp_bytes", 0) + plan.get("code_bytes", 0))
    stats = device_memory_stats()
    if stats and stats.get("bytes_limit"):
        plan["hbm_limit_bytes"] = stats["bytes_limit"]
        plan["fits_hbm"] = plan["total_bytes_per_device"] <= stats["bytes_limit"]
    if include_collectives:
        from orbit2_tpu.utils.scaling import collective_inventory

        plan["collectives"] = collective_inventory(compiled.as_text())
    return plan
