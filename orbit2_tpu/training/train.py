"""Training control plane.

The reference keeps its distributed train loop inside example scripts
(examples/intermediate_downscaling.py:379-832, duplicated in visualize.py and
era5_daymet_downscaling.py — see SURVEY.md §1 "key architectural
observation"). Here it is a library:

  * `clip_replace_constant` — precip clamp >= 0 + constants replaced by truth
    (reference intermediate_downscaling.py:267-278)
  * `make_train_step` / `make_eval_step` — jitted, mesh-sharded steps
  * `Trainer` — multi-phase dataset curriculum (`while epochs: for data_key`,
    reference :499-501), per-epoch LR schedule, checkpointing.

One jit specialization per dataset phase replaces the reference's in-place
`data_config` mutation (res_slimvit.py:148-164).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from orbit2_tpu.data.processing.era5_constants import CONSTANTS

log = logging.getLogger("orbit2_tpu")


def clip_replace_constant(y, yhat, out_variables: Sequence[str]):
    """Clamp precipitation predictions at 0 and replace constant channels
    with ground truth (reference intermediate_downscaling.py:267-278).
    Channel indices are static."""
    out_variables = list(out_variables)
    if "total_precipitation_24hr" in out_variables:
        i = out_variables.index("total_precipitation_24hr")
        yhat = yhat.at[:, i].set(jnp.maximum(yhat[:, i], 0.0))
    for i, var in enumerate(out_variables):
        if var in CONSTANTS:
            yhat = yhat.at[:, i].set(y[:, i])
    return yhat


def _crop_to_match(yhat, y):
    if y.shape[2] != yhat.shape[2] or y.shape[3] != yhat.shape[3]:
        y = y[:, :, : yhat.shape[2], : yhat.shape[3]]
    return y


def make_train_step(
    model,
    train_loss_metric,
    var_weights: Optional[Dict[str, float]],
    tx: optax.GradientTransformation,
    in_variables: Sequence[str],
    out_variables: Sequence[str],
    mesh=None,
    abstract_params=None,
    debug_grad_norms: bool = False,
    grad_accum: int = 1,
    aux_collections: Sequence[str] = (),
    moe_aux_weight: float = 0.01,
):
    """Returns jitted step(params, opt_state, x, y, rng) -> (params, opt_state, loss).

    Equivalent of training_step + backward + optimizer.step (reference
    intermediate_downscaling.py:281-306, 715-742) as one compiled graph:
    forward, loss, grad, reduce, update all fuse and overlap under GSPMD.

    grad_accum > 1 splits the batch into that many microbatches, scans the
    fwd+bwd over them accumulating averaged grads/loss, then applies ONE
    optimizer update — same effective batch with 1/grad_accum activation
    memory (the reference reaches bs32 at 1B/10B only via 128-256 ranks).

    aux_collections: extra mutable variable collections the model carries
    besides params — e.g. ("batch_stats",) for the BatchNorm-bearing
    Unet/ResNet (reference cnn_blocks.py:90 nn.BatchNorm2d). When non-empty
    the returned step has signature
    step(params, aux, opt_state, x, y, rng) -> (params, aux, opt_state, loss)
    where aux is the dict of those collections, updated each step.
    """
    in_variables = tuple(in_variables)
    out_variables = tuple(out_variables)
    aux_collections = tuple(aux_collections)
    # MoE trunks sow their Switch load-balance losses into the "moe_loss"
    # collection (models/components/moe.py); the step pops them out of the
    # mutable state (they are per-step values, NOT threaded aux state) and
    # adds moe_aux_weight x their mean to the task loss.
    moe_on = getattr(model, "moe_experts", 0)
    moe_aux_weight = float(moe_aux_weight) if moe_on else 0.0

    def loss_fn(p, a, xb, yb, r):
        # drop_path is a distinct stream so inference paths that want ONLY
        # Dropout active (MC-dropout, reference mc_dropout.py:4-7) can omit
        # it; training supplies both
        rngs = dict(zip(("dropout", "drop_path"), jax.random.split(r)))
        mut = list(aux_collections) + (["moe_loss"] if moe_on else [])
        if mut:
            yhat, new_a = model.apply(
                {"params": p, **a}, xb, in_variables, out_variables,
                deterministic=False, rngs=rngs,
                mutable=mut,
            )
            moe_sown = new_a.get("moe_loss") if moe_on else None
            new_a = ({k: v for k, v in new_a.items() if k != "moe_loss"}
                     if aux_collections else a)
        else:
            yhat = model.apply(
                {"params": p}, xb, in_variables, out_variables,
                deterministic=False, rngs=rngs,
            )
            new_a = a
            moe_sown = None
        yhat = yhat.astype(jnp.float32)
        yhat = clip_replace_constant(yb, yhat, out_variables)
        y_ = _crop_to_match(yhat, yb)
        losses = train_loss_metric(
            yhat, y_, var_names=list(out_variables), var_weights=var_weights
        )
        loss = losses if losses.ndim == 0 else losses[-1]
        if moe_sown is not None:
            leaves = jax.tree.leaves(moe_sown)
            if leaves:  # mean over MoE layers, == 1.0 at perfect balance
                aux = sum(jnp.asarray(l, jnp.float32) for l in leaves)
                loss = loss + moe_aux_weight * aux / len(leaves)
        return loss, new_a

    def _constrain_batch(xb, yb):
        """Keep microbatches data-sharded under an active mesh — without the
        constraint GSPMD may replicate each scan slice onto every device."""
        try:
            from orbit2_tpu.parallel.mesh import BATCH_AXES

            am = jax.sharding.get_abstract_mesh()
            if am is not None and any(
                    int(s) > 1 for s in dict(am.shape).values()):
                spec = jax.sharding.PartitionSpec(BATCH_AXES)
                return (jax.lax.with_sharding_constraint(xb, spec),
                        jax.lax.with_sharding_constraint(yb, spec))
        except Exception:
            pass
        return xb, yb

    def core(params, aux, opt_state, x, y, rng):
        if grad_accum > 1:
            if x.shape[0] % grad_accum:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by grad_accum {grad_accum}")
            mb = x.shape[0] // grad_accum
            xs = x.reshape(grad_accum, mb, *x.shape[1:])
            ys = y.reshape(grad_accum, mb, *y.shape[1:])

            def body(carry, inp):
                g_acc, l_acc, a, i = carry
                xb, yb = inp
                xb, yb = _constrain_batch(xb, yb)
                (l, new_a), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, a, xb, yb, jax.random.fold_in(rng, i))
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l,
                        new_a, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (g_sum, l_sum, new_aux, _), _ = jax.lax.scan(
                body,
                (zeros, jnp.zeros((), jnp.float32), aux,
                 jnp.zeros((), jnp.int32)),
                (xs, ys))
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            loss = l_sum / grad_accum
        else:
            (loss, new_aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, aux, x, y, rng)
        if debug_grad_norms:
            from orbit2_tpu.training.debug import grad_inspect

            grad_inspect(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_aux, new_opt_state, loss

    # Sharding is carried by the committed inputs (params via shard_params,
    # batches via batch_sharding) and propagated by GSPMD — no explicit
    # in_shardings needed; donate params/aux/opt_state buffers.
    if aux_collections:
        return jax.jit(core, donate_argnums=(0, 1, 2))

    def step(params, opt_state, x, y, rng):
        new_params, _, new_opt_state, loss = core(params, {}, opt_state,
                                                  x, y, rng)
        return new_params, new_opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(model, in_variables, out_variables, mesh=None,
                   aux_collections: Sequence[str] = ()):
    """Forward + clip (reference evaluate_func, intermediate_downscaling.py:
    329-364, with target transforms applied host-side by `evaluate`).
    With aux_collections the step reads the extra collections (BatchNorm
    running stats) and has signature step(params, aux, x, y)."""
    in_variables = tuple(in_variables)
    out_variables = tuple(out_variables)
    aux_collections = tuple(aux_collections)

    if aux_collections:
        def step_aux(params, aux, x, y):
            yhat = model.apply({"params": params, **aux}, x, in_variables,
                               out_variables, deterministic=True)
            yhat = yhat.astype(jnp.float32)
            yhat = clip_replace_constant(y, yhat, out_variables)
            return yhat

        return jax.jit(step_aux)

    def step(params, x, y):
        yhat = model.apply({"params": params}, x, in_variables, out_variables,
                           deterministic=True)
        yhat = yhat.astype(jnp.float32)
        yhat = clip_replace_constant(y, yhat, out_variables)
        return yhat

    return jax.jit(step)


def evaluate_batch(yhat, y, stage: str, loss_metrics, target_transforms,
                   out_variables) -> Dict[str, jax.Array]:
    """Per-loss transform + metric dict (reference evaluate_func :344-364)."""
    loss_dict = {}
    for i, lf in enumerate(loss_metrics):
        yhat_, y_ = yhat, y
        if target_transforms is not None and target_transforms[i] is not None:
            yhat_ = target_transforms[i](yhat)
            y_ = target_transforms[i](y)
        y_ = _crop_to_match(yhat_, y_)
        losses = lf(yhat_, y_)
        name = getattr(lf, "name", f"loss_{i}")
        if losses.ndim == 0:
            loss_dict[f"{stage}/{name}:aggregate"] = losses
        else:
            for var_name, loss in zip(out_variables, losses):
                loss_dict[f"{stage}/{name}:{var_name}"] = loss
            loss_dict[f"{stage}/{name}:aggregate"] = losses[-1]
    return loss_dict
