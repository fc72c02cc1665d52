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

import jax.numpy as jnp
import optax


def _scale_by_adam_2dtypes(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0,
                           mu_dtype=None, nu_dtype=None):
    """optax.scale_by_adam with independent storage dtypes for BOTH moments.

    optax only exposes `mu_dtype`; compressing the second moment too frees
    another ~1.9GB at 1B scale (the lever behind the bf16-mu +2.8pt MFU win,
    docs/performance.md). All arithmetic runs in the gradient dtype (fp32
    here — master params are fp32); only the *storage* between steps is cast,
    exactly like optax's mu_dtype. Bias-corrected update matches optax:
    mu_hat / (sqrt(nu_hat + eps_root) + eps)."""
    import jax
    import jax.numpy as jnp

    mu_dt = jnp.dtype(mu_dtype) if mu_dtype is not None else None
    nu_dt = jnp.dtype(nu_dtype) if nu_dtype is not None else None

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dt or p.dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dt or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        # fresh moments in the gradient dtype (fp32); matching optax, the
        # UPDATE is computed from these pre-cast values and only the stored
        # state is cast down — one rounding per step, not two
        mu = jax.tree.map(
            lambda g, m: (1.0 - b1) * g + b1 * m, updates, state.mu)
        nu = jax.tree.map(
            lambda g, v: (1.0 - b2) * jnp.square(g) + b2 * v,
            updates, state.nu)
        bc1 = 1.0 - b1 ** count
        bc2 = 1.0 - b2 ** count

        def upd(m, v):
            mf = m / bc1.astype(m.dtype)
            vf = v / bc2.astype(v.dtype)
            return mf / (jnp.sqrt(vf + eps_root) + eps)
        # NB eps/eps_root may arrive as injected f32 scalars — same math

        out = jax.tree.map(upd, mu, nu)
        if mu_dt is not None:
            mu = jax.tree.map(lambda m: m.astype(mu_dt), mu)
        if nu_dt is not None:
            nu = jax.tree.map(lambda v: v.astype(nu_dt), nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw_2dtypes(learning_rate, b1, b2, eps, eps_root, weight_decay,
                   mu_dtype, nu_dtype):
    """optax.adamw-equivalent chain that also compresses nu storage.

    The signature deliberately mirrors optax.adamw's numeric args so the
    inject_hyperparams state tree (hyperparams dict keys + inner chain
    states) is IDENTICAL — an fp32-nu checkpoint written by the stock
    optax.adamw path restores under adam_nu_dtype bfloat16 and vice versa
    (Orbax casts leaves to the template dtype)."""
    return optax.chain(
        _scale_by_adam_2dtypes(b1=b1, b2=b2, eps=eps, eps_root=eps_root,
                               mu_dtype=mu_dtype, nu_dtype=nu_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


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
    # hyperparam_dtype MUST be pinned: inject_hyperparams otherwise casts
    # hyperparams to the params' dtype, and under bf16 params b2=0.999
    # rounds to bf16(1.0) -> bias correction 1-b2^t == 0 -> nu/0 == NaN on
    # every parameter after one step (found by the 10B bf16-param virtual
    # step; affects stock optax.adamw the same way). fp32 hyperparams are
    # correct for every param dtype.
    f32 = {"hyperparam_dtype": jnp.float32}
    if name == "adamw":
        betas = hyperparams.get("betas", (0.9, 0.999))
        # mu_dtype / nu_dtype = bfloat16 (config trainer.adam_{mu,nu}_dtype)
        # halve the respective moment's HBM footprint/bandwidth. nu_dtype
        # unset/float32 keeps bit-exact optax.adamw (the torch-parity path).
        nu_dtype = hyperparams.get("nu_dtype")
        if nu_dtype in ("float32",):
            nu_dtype = None
        if nu_dtype:
            return optax.inject_hyperparams(
                _adamw_2dtypes, static_args=("mu_dtype", "nu_dtype"),
                **f32)(
                learning_rate=lr,
                b1=float(betas[0]),
                b2=float(betas[1]),
                eps=1e-8,
                eps_root=0.0,
                weight_decay=float(hyperparams.get("weight_decay", 0.0)),
                mu_dtype=hyperparams.get("mu_dtype"),
                nu_dtype=nu_dtype,
            )
        return optax.inject_hyperparams(
            optax.adamw, static_args=("mu_dtype",), **f32)(
            learning_rate=lr,
            b1=float(betas[0]),
            b2=float(betas[1]),
            weight_decay=float(hyperparams.get("weight_decay", 0.0)),
            mu_dtype=hyperparams.get("mu_dtype"),
        )
    if name == "adam":
        betas = hyperparams.get("betas", (0.9, 0.999))
        return optax.inject_hyperparams(optax.adam, **f32)(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1])
        )
    if name == "sgd":
        return optax.inject_hyperparams(optax.sgd, **f32)(
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
