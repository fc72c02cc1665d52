#!/usr/bin/env python
"""ClimateBench climate-projection driver (reference
experiments/climate_projection/climatebench.py:16-134): train
resnet / unet / vit on the ClimateBench forcings (CO2, SO2, CH4, BC as
sliding history windows) for one output variable with AdamW +
linear-warmup-cosine-annealing, early-stop on val/mse:aggregate with the
reference's patience, keep the best parameters, and report the ClimateBench
NRMSE trio (lat_nrmses / lat_nrmseg / lat_nrmse) over the 2080-2100 test
window.

The reference drives this through its legacy Lightning stack
(pl.Trainer + LitModule); here the same recipe is composed from the public
factories (`load_climatebench_module`) and the library train/eval steps —
one jitted graph per batch shape, BatchNorm running stats threaded through
as aux state.
"""

import argparse
import logging

import numpy as np

log = logging.getLogger("orbit2_tpu")

# Per-model overrides, verbatim from the reference experiment
# (experiments/climate_projection/climatebench.py:45-72).
MODEL_KWARGS = {
    "resnet": dict(in_channels=4, out_channels=1, history=10, n_blocks=28),
    "unet": dict(in_channels=4, out_channels=1, history=10,
                 ch_mults=(1, 2, 2), is_attn=(False, False, False)),
    "vit": dict(img_size=(32, 64), in_channels=4, out_channels=1, history=10,
                patch_size=2, embed_dim=128, depth=8, decoder_depth=2,
                learn_pos_emb=True, num_heads=4),
}


def build_model(name: str, overrides=None):
    from orbit2_tpu.models.resnet import ResNet
    from orbit2_tpu.models.unet import Unet
    from orbit2_tpu.models.vit import VisionTransformer

    kwargs = dict(MODEL_KWARGS[name])
    kwargs.update(overrides or {})
    cls = {"resnet": ResNet, "unet": Unet, "vit": VisionTransformer}[name]
    return cls(**kwargs)


def run(dm, model_name: str, max_epochs: int = 50, patience: int = 10,
        model_overrides=None, lr: float = 5e-4):
    """Train + early-stop + test-evaluate; returns (best_val, test_metrics)."""
    import jax
    import jax.numpy as jnp

    import orbit2_tpu as cl
    from orbit2_tpu.training.optim import (
        make_lr_scheduler,
        make_optimizer,
        set_learning_rate,
    )
    from orbit2_tpu.training.train import (
        evaluate_batch,
        make_eval_step,
        make_train_step,
    )

    model = build_model(model_name, model_overrides)
    (model, train_loss, val_losses, test_losses, _tt, val_transforms,
     test_transforms) = cl.load_climatebench_module(data_module=dm, model=model)
    in_vars, out_vars = dm.get_data_variables()

    # optimizer + schedule hyperparams from the reference experiment (:73-79)
    tx = make_optimizer("adamw", {"lr": lr, "weight_decay": 1e-5,
                                  "betas": (0.9, 0.99)})
    schedule = make_lr_scheduler(
        "linear-warmup-cosine-annealing",
        {"lr": lr, "warmup_epochs": 5, "max_epochs": max_epochs,
         "warmup_start_lr": 1e-8, "eta_min": 1e-8})

    x0, y0, *_ = next(iter(dm.train_dataloader()))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x0[:1]), in_vars, out_vars,
                           deterministic=True)
    params = variables["params"]
    aux = {k: v for k, v in variables.items() if k != "params"}
    aux_collections = tuple(aux)
    opt_state = tx.init(params)

    step = make_train_step(model, train_loss, None, tx, in_vars, out_vars,
                           aux_collections=aux_collections)
    eval_step = make_eval_step(model, in_vars, out_vars,
                               aux_collections=aux_collections)

    def _step(params, aux, opt_state, x, y, rng):
        if aux_collections:
            return step(params, aux, opt_state, x, y, rng)
        p, o, l = step(params, opt_state, x, y, rng)
        return p, aux, o, l

    def _eval(params, aux, x, y):
        if aux_collections:
            return eval_step(params, aux, x, y)
        return eval_step(params, x, y)

    def evaluate(split_loader, stage, losses, transforms):
        sums, n = {}, 0
        for x, y, *_ in split_loader:
            x, y = jnp.asarray(x), jnp.asarray(y)
            yhat = _eval(params, aux, x, y)
            d = evaluate_batch(yhat, y, stage, losses, transforms, out_vars)
            b = x.shape[0]
            for k, v in d.items():
                sums[k] = sums.get(k, 0.0) + float(v) * b
            n += b
        return {k: v / max(1, n) for k, v in sums.items()}

    rng = jax.random.PRNGKey(0)
    # the train step DONATES params/aux buffers — snapshot best to host or
    # the saved pytree would be invalidated by the next step
    best_val, best = float("inf"), jax.device_get((params, aux))
    bad_epochs = 0
    monitor = f"val/{getattr(val_losses[0], 'name', 'mse')}:aggregate"
    batch_size = dm.batch_size
    for epoch in range(max_epochs):
        opt_state = set_learning_rate(opt_state, schedule(epoch))
        epoch_loss, steps = 0.0, 0
        for i, (x, y, *_) in enumerate(dm.train_dataloader()):
            if x.shape[0] != batch_size:
                continue  # keep one jit specialization (torch drop_last)
            params, aux, opt_state, loss = _step(
                params, aux, opt_state, jnp.asarray(x), jnp.asarray(y),
                jax.random.fold_in(rng, epoch * 100_000 + i))
            epoch_loss += float(loss)
            steps += 1
        val = evaluate(dm.val_dataloader(), "val", val_losses, val_transforms)
        val_metric = val[monitor]
        log.info("epoch %d train=%.5f %s=%.5f lr=%.2e", epoch,
                 epoch_loss / max(1, steps), monitor, val_metric,
                 schedule(epoch))
        if val_metric < best_val:
            best_val, best, bad_epochs = (
                val_metric, jax.device_get((params, aux)), 0)
        else:
            bad_epochs += 1
            # Lightning EarlyStopping stops when wait_count >= patience
            if bad_epochs >= patience:
                log.info("early stop at epoch %d (best %s=%.5f)",
                         epoch, monitor, best_val)
                break

    params, aux = best  # trainer.test(ckpt_path="best")
    test = evaluate(dm.test_dataloader(), "test", test_losses, test_transforms)
    for k, v in sorted(test.items()):
        log.info("%s = %.6f", k, v)
    return best_val, test


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("climatebench_dir")
    p.add_argument("model", choices=["resnet", "unet", "vit"])
    p.add_argument("variable",
                   choices=["tas", "diurnal_temperature_range", "pr", "pr90"],
                   help="The variable to predict.")
    p.add_argument("--max_epochs", type=int, default=50)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args()

    from orbit2_tpu.data.climatebench import ClimateBenchDataModule

    dm = ClimateBenchDataModule(
        args.climatebench_dir,
        variables=("CO2", "SO2", "CH4", "BC"),
        out_variables=args.variable,
        train_ratio=0.9,
        history=10,
        batch_size=args.batch_size,
    )
    run(dm, args.model, max_epochs=args.max_epochs, patience=args.patience)


if __name__ == "__main__":
    main()
