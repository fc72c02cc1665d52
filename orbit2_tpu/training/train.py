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
):
    """Returns jitted step(params, opt_state, x, y, rng) -> (params, opt_state, loss).

    Equivalent of training_step + backward + optimizer.step (reference
    intermediate_downscaling.py:281-306, 715-742) as one compiled graph:
    forward, loss, grad, reduce, update all fuse and overlap under GSPMD.
    """
    in_variables = tuple(in_variables)
    out_variables = tuple(out_variables)

    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            yhat = model.apply(
                {"params": p}, x, in_variables, out_variables,
                deterministic=False, rngs={"dropout": rng},
            )
            yhat = yhat.astype(jnp.float32)
            yhat = clip_replace_constant(y, yhat, out_variables)
            y_ = _crop_to_match(yhat, y)
            losses = train_loss_metric(
                yhat, y_, var_names=list(out_variables), var_weights=var_weights
            )
            return losses if losses.ndim == 0 else losses[-1]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if debug_grad_norms:
            from orbit2_tpu.training.debug import grad_inspect

            grad_inspect(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    # Sharding is carried by the committed inputs (params via shard_params,
    # batches via batch_sharding) and propagated by GSPMD — no explicit
    # in_shardings needed; donate params/opt_state buffers.
    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(model, in_variables, out_variables, mesh=None):
    """Forward + clip (reference evaluate_func, intermediate_downscaling.py:
    329-364, with target transforms applied host-side by `evaluate`)."""
    in_variables = tuple(in_variables)
    out_variables = tuple(out_variables)

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
