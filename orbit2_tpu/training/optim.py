"""Optimizers and LR schedules (optax).

`linear_warmup_cosine_annealing` reproduces the reference's
LinearWarmupCosineAnnealingLR closed form (reference models/lr_scheduler.py:
93-115), stepped once per epoch like the reference (scheduler.step() at
intermediate_downscaling.py:756). No grad scaler: the reference's bf16
ShardedGradScaler with its min-scale clamp (intermediate_downscaling.py:
493-497, 741-742) is a ROCm-ism; TPU bf16 training keeps fp32 master params
and fp32 Adam moments instead.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import optax


def linear_warmup_cosine_annealing(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
):
    """Returns epoch -> lr (reference lr_scheduler.py:93-115 closed form)."""

    def schedule(epoch: int) -> float:
        if epoch < warmup_epochs:
            return warmup_start_lr + epoch * (base_lr - warmup_start_lr) / max(
                1, warmup_epochs - 1
            )
        t = (epoch - warmup_epochs) / max(1, max_epochs - warmup_epochs)
        return eta_min + 0.5 * (base_lr - eta_min) * (1 + math.cos(math.pi * t))

    return schedule


def make_optimizer(name: str, hyperparams: Dict[str, Any]) -> optax.GradientTransformation:
    """reference load_optimizer (loaders.py:390-406). The learning rate is
    injected as a mutable hyperparam so the trainer can apply the per-epoch
    schedule without rebuilding opt state."""
    lr = float(hyperparams.get("lr", 1e-3))
    if name == "adamw":
        betas = hyperparams.get("betas", (0.9, 0.999))
        # mu_dtype=bfloat16 (config trainer.adam_mu_dtype) halves the first
        # moment's HBM footprint/bandwidth; nu stays fp32
        return optax.inject_hyperparams(
            optax.adamw, static_args=("mu_dtype",))(
            learning_rate=lr,
            b1=float(betas[0]),
            b2=float(betas[1]),
            weight_decay=float(hyperparams.get("weight_decay", 0.0)),
            mu_dtype=hyperparams.get("mu_dtype"),
        )
    if name == "adam":
        betas = hyperparams.get("betas", (0.9, 0.999))
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1])
        )
    if name == "sgd":
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=float(hyperparams.get("momentum", 0.0))
        )
    raise NotImplementedError(f"optimizer {name} not supported")


def make_lr_scheduler(name: str, hyperparams: Dict[str, Any]):
    """reference load_lr_scheduler (loaders.py:409-433) -> epoch -> lr fn."""
    if name == "constant":
        lr = float(hyperparams["lr"])
        return lambda epoch: lr
    if name == "linear":
        base = float(hyperparams["lr"])
        end = float(hyperparams.get("end_lr", 0.0))
        total = int(hyperparams.get("total_iters", 1))
        return lambda e: base + (end - base) * min(1.0, e / max(1, total))
    if name == "exponential":
        base = float(hyperparams["lr"])
        gamma = float(hyperparams.get("gamma", 0.99))
        return lambda e: base * gamma**e
    if name == "linear-warmup-cosine-annealing":
        return linear_warmup_cosine_annealing(
            base_lr=float(hyperparams["lr"]),
            warmup_epochs=int(hyperparams["warmup_epochs"]),
            max_epochs=int(hyperparams["max_epochs"]),
            warmup_start_lr=float(hyperparams.get("warmup_start_lr", 0.0)),
            eta_min=float(hyperparams.get("eta_min", 0.0)),
        )
    if name == "reduce-lr-on-plateau":
        return ReduceLROnPlateau(
            base_lr=float(hyperparams["lr"]),
            factor=float(hyperparams.get("factor", 0.1)),
            patience=int(hyperparams.get("patience", 10)),
            min_lr=float(hyperparams.get("min_lr", 0.0)),
        )
    raise NotImplementedError(f"lr scheduler {name} not supported")


class ReduceLROnPlateau:
    """Stateful metric-driven schedule (reference loaders.py:428-431 exposes
    torch's ReduceLROnPlateau). Call `step(metric)` per epoch; reading it as
    `schedule(epoch)` returns the current lr so the Trainer's epoch-based
    protocol still works."""

    def __init__(self, base_lr: float, factor: float = 0.1, patience: int = 10,
                 min_lr: float = 0.0, mode: str = "min"):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.mode = mode
        self.best = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        better = (self.best is None or
                  (metric < self.best if self.mode == "min" else metric > self.best))
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.min_lr, self.lr * self.factor)
                self.bad_epochs = 0
        return self.lr

    def __call__(self, epoch: int) -> float:
        return self.lr


def set_learning_rate(opt_state, lr: float):
    """Write the injected learning-rate hyperparam in place, preserving the
    existing leaf's device placement/sharding."""
    import jax
    import jax.numpy as jnp

    old = opt_state.hyperparams["learning_rate"]
    arr = jnp.asarray(lr, dtype=jnp.float32)
    if hasattr(old, "sharding"):
        arr = jax.device_put(arr, old.sharding)
    opt_state.hyperparams["learning_rate"] = arr
    return opt_state
