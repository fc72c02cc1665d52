"""Functional metric/loss kernels in JAX.

Numerical semantics match the reference implementations in
src/climate_learn/metrics/functional.py (file:line cited per function);
everything here is jit-safe with static `var_names`/`aggregate_only`.
All inputs are [B, C, H, W] unless noted. Each non-aggregate call returns
`concat([per_channel (C,), aggregate (1,)])` like the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def handles_probabilistic(metric):
    """Unwrap probabilistic predictions to their mean (reference
    metrics/utils.py:34-41 unwraps torch.distributions.Normal; here a
    Normal is a (mean, std) tuple)."""
    from functools import wraps

    @wraps(metric)
    def wrapper(pred, *args, **kwargs):
        if isinstance(pred, tuple) and len(pred) == 2:
            pred = pred[0]
        return metric(pred, *args, **kwargs)

    return wrapper


def channel_weights(
    var_names: Optional[Sequence[str]],
    var_weights: Optional[Dict[str, float]],
    num_channels: int,
    dtype=np.float32,
) -> Optional[np.ndarray]:
    """Static per-channel weight vector (reference functional.py:188-196)."""
    if var_names is None:
        return None
    assert len(var_names) == num_channels, (
        "Number of variable names must match channel dimension"
    )
    w = np.ones(num_channels, dtype=dtype)
    if var_weights:
        for i, var in enumerate(var_names):
            w[i] = var_weights.get(var, 1.0)
    return w


def _apply_weights(error, var_names, var_weights, lat_weights):
    if lat_weights is not None:
        error = error * lat_weights
    if var_names is not None:
        w = channel_weights(var_names, var_weights, error.shape[1])
        error = error * jnp.asarray(w, dtype=error.dtype).reshape(1, -1, 1, 1)
    return error

def _per_channel_and_agg(error, aggregate_only):
    per_channel = error.mean(axis=(0, 2, 3))
    loss = error.mean()
    if aggregate_only:
        return loss
    return jnp.concatenate([per_channel, loss[None]])


def mse(
    pred,
    target,
    var_names: Optional[List[str]] = None,
    var_weights: Optional[Dict[str, float]] = None,
    aggregate_only: bool = False,
    lat_weights=None,
):
    """Weighted MSE (reference functional.py:173-202)."""
    error = jnp.square(pred - target)
    error = _apply_weights(error, var_names, var_weights, lat_weights)
    return _per_channel_and_agg(error, aggregate_only)


def bayesian_tv(
    pred,
    target,
    var_names: Optional[List[str]] = None,
    var_weights: Optional[Dict[str, float]] = None,
    aggregate_only: bool = False,
    lat_weights=None,
    prior_weight: float = 0.02,
    diag_weight: float = 0.7,
):
    """MSE + directional total-variation prior, ORBIT-2's default train loss
    (reference functional.py:117-167). Vertical/horizontal diffs weighted 1,
    the two diagonals 0.7, all scaled by 0.02 and zero-padded back to [H, W]:
      dif1 pad bottom row, dif2 pad right col, dif3 pad bottom+right,
      dif4 pad bottom+left (reference :135-138, torch F.pad convention).
    """
    mse_error = jnp.square(pred - target)

    dif1 = jnp.abs(pred[:, :, 1:, :] - pred[:, :, :-1, :])   # vertical
    dif2 = jnp.abs(pred[:, :, :, 1:] - pred[:, :, :, :-1])   # horizontal
    dif3 = jnp.abs(pred[:, :, 1:, 1:] - pred[:, :, :-1, :-1])  # diagonal
    dif4 = jnp.abs(pred[:, :, 1:, :-1] - pred[:, :, :-1, 1:])  # anti-diagonal

    pad = lambda x, spec: jnp.pad(x, ((0, 0), (0, 0)) + spec)
    dif1 = pad(dif1, ((0, 1), (0, 0)))
    dif2 = pad(dif2, ((0, 0), (0, 1)))
    dif3 = pad(dif3, ((0, 1), (0, 1)))
    dif4 = pad(dif4, ((0, 1), (1, 0)))

    prior_error = prior_weight * (dif1 + dif2 + diag_weight * dif3 + diag_weight * dif4)
    error = mse_error + prior_error
    error = _apply_weights(error, var_names, var_weights, lat_weights)
    return _per_channel_and_agg(error, aggregate_only)


def image_gradient_fn(pred, target):
    """Mean |∇target − ∇pred| with forward differences, last row/col zero —
    matches torchmetrics.image_gradients semantics used by the reference
    (functional.py:96-114)."""
    def grads(img):
        dy = img[:, :, 1:, :] - img[:, :, :-1, :]
        dx = img[:, :, :, 1:] - img[:, :, :, :-1]
        dy = jnp.pad(dy, ((0, 0), (0, 0), (0, 1), (0, 0)))
        dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 0), (0, 1)))
        return dy, dx

    dy, dx = grads(target)
    hat_dy, hat_dx = grads(pred)
    return jnp.mean(jnp.abs(dx - hat_dx) + jnp.abs(dy - hat_dy))


def image_gradient(
    pred,
    target,
    var_names: Optional[List[str]] = None,
    var_weights: Optional[Dict[str, float]] = None,
    aggregate_only: bool = False,
    lat_weights=None,
):
    """MSE + 0.1 * gradient-difference loss (reference functional.py:59-94).
    Note the reference weights error_2 per channel but then takes the scalar
    mean of the *unweighted-shape* tensor; we reproduce: weights multiply both
    terms before the scalar means. Returns a scalar (the reference returns a
    scalar here regardless of aggregate_only)."""
    error_1 = jnp.square(pred - target)
    grad_err = image_gradient_fn(pred, target)
    if var_names is not None:
        w = channel_weights(var_names, var_weights, pred.shape[1])
        wj = jnp.asarray(w, dtype=pred.dtype).reshape(1, -1, 1, 1)
        error_1 = error_1 * wj
        # reference multiplies the already-reduced grad error's tensor form;
        # its error_2 is scalar so the weight multiplies through the mean
        grad_err = grad_err * jnp.mean(wj)
    return jnp.mean(error_1) + 0.1 * grad_err


def lat_weighted_quantile(pred, target, aggregate_only: bool = False, lat_weights=None):
    """±1/2/3 sigma quantile (pinball) loss (reference functional.py:35-56)."""
    quantiles = jnp.asarray(
        [1 - 0.9987, 1 - 0.9772, 1 - 0.8413, 0.5000, 0.8413, 0.9772, 0.9987],
        dtype=pred.dtype,
    )
    error = pred - target
    if lat_weights is not None:
        error = error * lat_weights
    error = error[..., None]
    losses = jnp.maximum((quantiles - 1) * error, quantiles * error)
    return jnp.abs(losses).mean()


def mae(pred, target, aggregate_only: bool = False, lat_weights=None):
    """Reference functional.py:218-232."""
    error = jnp.abs(pred - target)
    if lat_weights is not None:
        error = error * lat_weights
    return _per_channel_and_agg(error, aggregate_only)


def rmse(pred, target, aggregate_only: bool = False, lat_weights=None, mask=None):
    """Per-sample spatial RMSE averaged over batch (reference functional.py:235-255)."""
    error = jnp.square(pred - target)
    if lat_weights is not None:
        error = error * lat_weights
    if mask is not None:
        error = error * mask
        eps = 1e-9
        masked_frac = jnp.mean(mask, axis=(1, 2, 3), keepdims=True) + eps
        error = error / masked_frac
    per_channel = jnp.sqrt(error.mean(axis=(2, 3))).mean(axis=0)
    loss = per_channel.mean()
    if aggregate_only:
        return loss
    return jnp.concatenate([per_channel, loss[None]])


def acc(pred, target, climatology, aggregate_only: bool = False, lat_weights=None, mask=None):
    """Anomaly correlation coefficient vs climatology (reference
    functional.py:258-290). The reference computes masked numer/denoms and then
    immediately overwrites them with the unmasked versions (:282-284); we keep
    the effective (unmasked) behavior."""
    pred = pred - climatology
    target = target - climatology
    lw = lat_weights if lat_weights is not None else jnp.ones((1, 1, 1, 1), pred.dtype)

    pred_prime = pred - pred.mean(axis=(0, 2, 3), keepdims=True)
    target_prime = target - target.mean(axis=(0, 2, 3), keepdims=True)
    numer = (lw * pred_prime * target_prime).sum(axis=(0, 2, 3))
    denom1 = (lw * jnp.square(pred_prime)).sum(axis=(0, 2, 3))
    denom2 = (lw * jnp.square(target_prime)).sum(axis=(0, 2, 3))
    per_channel = numer / jnp.sqrt(denom1 * denom2)
    result = per_channel.mean()
    if aggregate_only:
        return result
    return jnp.concatenate([per_channel, result[None]])


def pearson(pred, target, aggregate_only: bool = False):
    """Cosine similarity of centered per-channel flats (reference
    functional.py:293-308)."""
    c = pred.shape[1]
    pf = jnp.moveaxis(pred, 1, 0).reshape(c, -1)
    tf = jnp.moveaxis(target, 1, 0).reshape(c, -1)
    pf = pf - pf.mean(axis=1, keepdims=True)
    tf = tf - tf.mean(axis=1, keepdims=True)
    eps = 1e-8
    per_channel = (pf * tf).sum(1) / jnp.maximum(
        jnp.linalg.norm(pf, axis=1) * jnp.linalg.norm(tf, axis=1), eps
    )
    coeff = per_channel.mean()
    if aggregate_only:
        return coeff
    return jnp.concatenate([per_channel, coeff[None]])


def mean_bias(pred, target, aggregate_only: bool = False):
    """target.mean - pred.mean per channel (reference functional.py:311-324)."""
    per_channel = target.mean(axis=(0, 2, 3)) - pred.mean(axis=(0, 2, 3))
    result = per_channel.mean()
    if aggregate_only:
        return result
    return jnp.concatenate([per_channel, result[None]])


def msess(pred, target, climatology, aggregate_only: bool = False, lat_weights=None):
    """MSE skill score vs climatology (reference functional.py:205-215)."""
    pred_mse = mse(pred, target, aggregate_only=aggregate_only, lat_weights=lat_weights)
    clim = jnp.broadcast_to(climatology, target.shape)
    clim_mse = mse(clim, target, aggregate_only=aggregate_only, lat_weights=lat_weights)
    return 1 - pred_mse / clim_mse


def gaussian_crps(mean, std, target, aggregate_only: bool = False, lat_weights=None):
    """CRPS of a Normal predictive distribution (reference functional.py:340-360).

    NB: the reference's closed form uses 1/pi where the textbook Normal CRPS
    has 1/sqrt(pi) (`- 1 / torch.pi`, functional.py:353) — replicated here
    bit-for-bit since numerical parity is the contract; a calibrated
    forecast's CRPS is offset by ~0.246*std from the theoretical minimum."""
    z = (target - mean) / std
    pdf = jnp.exp(jax.scipy.stats.norm.logpdf(z))
    cdf = jax.scipy.stats.norm.cdf(z)
    crps = std * (z * (2 * cdf - 1) + 2 * pdf - 1 / jnp.pi)
    if lat_weights is not None:
        crps = crps * lat_weights
    return _per_channel_and_agg(crps, aggregate_only)


def gaussian_spread(std, aggregate_only: bool = False, lat_weights=None):
    """Reference functional.py:363-375.

    NB: replicates the reference's unit mix — per-channel entries are
    root-mean VARIANCE (sigma units) while the aggregate is mean variance
    (sigma^2 units), so the spread/skill ratio's aggregate slot carries the
    same quirk. Kept bit-for-bit for parity."""
    variance = jnp.square(std)
    if lat_weights is not None:
        variance = variance * lat_weights
    per_channel = jnp.sqrt(variance.mean(axis=(2, 3))).mean(axis=0)
    loss = variance.mean()
    if aggregate_only:
        return loss
    return jnp.concatenate([per_channel, loss[None]])


def gaussian_spread_skill_ratio(mean, std, target, aggregate_only: bool = False, lat_weights=None):
    """Reference functional.py:378-386."""
    spread = gaussian_spread(std, aggregate_only, lat_weights)
    error = rmse(mean, target, aggregate_only, lat_weights)
    return spread / error


def nrmses(pred, target, clim, aggregate_only: bool = False, lat_weights=None):
    """Spatial NRMSE, climatology-normalized (reference functional.py:389-404)."""
    y_norm = jnp.squeeze(clim)
    error = jnp.square(pred.mean(axis=0) - target.mean(axis=0))  # (C, H, W)
    if lat_weights is not None:
        error = error * jnp.squeeze(lat_weights, axis=0)
    per_channel = jnp.sqrt(error.mean(axis=(-2, -1))) / y_norm
    loss = per_channel.mean()
    if aggregate_only:
        return loss
    return jnp.concatenate([per_channel, loss[None]])


def nrmseg(pred, target, clim, aggregate_only: bool = False, lat_weights=None):
    """Global NRMSE (reference functional.py:407-425)."""
    y_norm = jnp.squeeze(clim)
    if lat_weights is not None:
        pred = pred * lat_weights
        target = target * lat_weights
    pred = pred.mean(axis=(-2, -1))
    target = target.mean(axis=(-2, -1))
    error = jnp.square(pred - target)
    per_channel = jnp.sqrt(error.mean(axis=0)) / y_norm
    loss = per_channel.mean()
    if aggregate_only:
        return loss
    return jnp.concatenate([per_channel, loss[None]])
