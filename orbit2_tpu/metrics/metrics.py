"""Metric classes registered in METRICS_REGISTRY.

Mirrors the reference class surface (src/climate_learn/metrics/metrics.py:23-517)
on JAX arrays. Differences from the reference, on purpose:
  * `lat_nrmses` / `lat_nrmseg` / `lat_nrmse` are actually registered here —
    the reference's `load_climatebench_module` asks for them (loaders.py:241)
    but never registers them (registry gap, SURVEY.md §2.3).
  * `perceptual` (LPIPS+L1) is constructed lazily and needs converted VGG16 /
    LPIPS weights on disk (no network egress on TPU pods); see
    `orbit2_tpu/metrics/lpips.py`.
Metric instances are lightweight callables safe to close over in a jitted
step as long as `aggregate_only` / variable names stay static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from orbit2_tpu.registry import METRICS_REGISTRY, register_metric as register
from orbit2_tpu.metrics import functional as F


@dataclass
class MetricsMetaInfo:
    """Reference metrics/utils.py:13-19."""

    in_vars: List[str]
    out_vars: List[str]
    lat: Any
    lon: Any
    climatology: Any


class Metric:
    """Parent class for all metrics (reference metrics.py:23-52)."""

    def __init__(self, aggregate_only: bool = False, metainfo: Optional[MetricsMetaInfo] = None):
        self.aggregate_only = aggregate_only
        self.metainfo = metainfo

    def __call__(self, pred, target, **kwargs):
        raise NotImplementedError


class LatitudeWeightedMetric(Metric):
    """cos(lat)/mean(cos(lat)) weights, shape (1,1,H,1) (reference metrics.py:55-75)."""

    def __init__(self, aggregate_only: bool = False, metainfo: Optional[MetricsMetaInfo] = None):
        super().__init__(aggregate_only, metainfo)
        lat_weights = np.cos(np.deg2rad(np.asarray(self.metainfo.lat)))
        lat_weights = lat_weights / lat_weights.mean()
        self.lat_weights = jnp.asarray(lat_weights, dtype=jnp.float32).reshape(1, 1, -1, 1)


class ClimatologyBasedMetric(Metric):
    """Reference metrics.py:78-97."""

    def __init__(self, aggregate_only: bool = False, metainfo: Optional[MetricsMetaInfo] = None):
        super().__init__(aggregate_only, metainfo)
        self._attach_climatology()

    def _attach_climatology(self):
        """Shared by the lat-weighted climatology metrics, whose MRO routes
        __init__ through LatitudeWeightedMetric instead."""
        self.climatology = jnp.asarray(self.metainfo.climatology)[None]  # (1, C, H, W)


class TransformedMetric:
    """Compose transform + metric (reference metrics.py:100-115)."""

    def __init__(self, transform, metric):
        self.transform = transform
        self.metric = metric
        self.name = metric.name

    def __call__(self, pred, target):
        return self.metric(self.transform(pred), self.transform(target))


@register("mse")
class MSE(Metric):
    def __call__(self, pred, target, var_names=None, var_weights=None):
        return F.mse(pred, target, var_names, var_weights, self.aggregate_only)


@register("bayesian_tv")
class BayesianTV(Metric):
    """ORBIT-2 default train loss (reference metrics.py:204, functional.py:117-167)."""

    def __call__(self, pred, target, var_names=None, var_weights=None):
        return F.bayesian_tv(pred, target, var_names, var_weights, self.aggregate_only)


@register("imagegradient")
class ImageGradient(Metric):
    def __call__(self, pred, target, var_names=None, var_weights=None):
        return F.image_gradient(pred, target, var_names, var_weights, self.aggregate_only)


@register("quantile")
class Quantile(Metric):
    def __call__(self, pred, target, var_names=None, var_weights=None):
        return F.lat_weighted_quantile(pred, target, self.aggregate_only)


@register("mae")
class MAE(Metric):
    def __call__(self, pred, target, **_):
        return F.mae(pred, target, self.aggregate_only)


@register("lat_mse")
class LatWeightedMSE(LatitudeWeightedMetric):
    def __call__(self, pred, target, var_names=None, var_weights=None):
        return F.mse(pred, target, var_names, var_weights, self.aggregate_only,
                     lat_weights=self.lat_weights)


@register("lat_mae")
class LatWeightedMAE(LatitudeWeightedMetric):
    def __call__(self, pred, target, **_):
        return F.mae(pred, target, self.aggregate_only, lat_weights=self.lat_weights)


@register("rmse")
class RMSE(Metric):
    def __call__(self, pred, target, mask=None, **_):
        return F.rmse(pred, target, self.aggregate_only, mask=mask)


@register("lat_rmse")
class LatWeightedRMSE(LatitudeWeightedMetric):
    def __call__(self, pred, target, mask=None, **_):
        return F.rmse(pred, target, self.aggregate_only, lat_weights=self.lat_weights, mask=mask)


@register("acc")
class ACC(ClimatologyBasedMetric):
    def __call__(self, pred, target, mask=None, **_):
        return F.acc(pred, target, self.climatology, self.aggregate_only,
                     lat_weights=jnp.ones((1, 1, 1, 1), dtype=jnp.float32), mask=mask)


@register("lat_acc")
class LatWeightedACC(LatitudeWeightedMetric, ClimatologyBasedMetric):
    def __init__(self, aggregate_only: bool = False, metainfo=None):
        LatitudeWeightedMetric.__init__(self, aggregate_only, metainfo)
        self._attach_climatology()

    def __call__(self, pred, target, mask=None, **_):
        return F.acc(pred, target, self.climatology, self.aggregate_only,
                     lat_weights=self.lat_weights, mask=mask)


@register("pearson")
class Pearson(Metric):
    def __call__(self, pred, target, **_):
        return F.pearson(pred, target, self.aggregate_only)


@register("mean_bias")
class MeanBias(Metric):
    def __call__(self, pred, target, **_):
        return F.mean_bias(pred, target, self.aggregate_only)


@register("lat_nrmses")
class LatNRMSEs(LatitudeWeightedMetric, ClimatologyBasedMetric):
    def __init__(self, aggregate_only: bool = False, metainfo=None):
        LatitudeWeightedMetric.__init__(self, aggregate_only, metainfo)
        self._attach_climatology()

    def __call__(self, pred, target, **_):
        return F.nrmses(pred, target, self.climatology, self.aggregate_only, self.lat_weights)


@register("lat_nrmseg")
class LatNRMSEg(LatitudeWeightedMetric, ClimatologyBasedMetric):
    def __init__(self, aggregate_only: bool = False, metainfo=None):
        LatitudeWeightedMetric.__init__(self, aggregate_only, metainfo)
        self._attach_climatology()

    def __call__(self, pred, target, **_):
        return F.nrmseg(pred, target, self.climatology, self.aggregate_only, self.lat_weights)


@register("lat_nrmse")
class LatNRMSE(Metric):
    """nrmses + 5 * nrmseg, the ClimateBench composite."""

    def __init__(self, aggregate_only: bool = False, metainfo=None):
        super().__init__(aggregate_only, metainfo)
        self._s = LatNRMSEs(aggregate_only, metainfo)
        self._g = LatNRMSEg(aggregate_only, metainfo)

    def __call__(self, pred, target, **_):
        return self._s(pred, target) + 5 * self._g(pred, target)


@register("masked_mse")
class MaskedMSE(Metric):
    """Validity-masked MSE (for PRISM/DAYMET nodata regions). The reference's
    fine-tune CLI offers 'masked_mse' (era5_daymet_downscaling.py:214) but
    never registers it — another registry gap fixed here. The mask comes from
    the data module's `get_out_mask()` via `set_mask`, or per call."""

    def set_mask(self, mask):
        self.mask = jnp.asarray(mask, dtype=jnp.float32)
        return self

    def __call__(self, pred, target, var_names=None, var_weights=None, mask=None):
        m = mask if mask is not None else getattr(self, "mask", None)
        error = jnp.square(pred - target)
        if m is not None:
            # The train/eval steps top-left-crop the target grid to the model
            # output when out_lat/out_lon is not an exact superres multiple
            # (train.py:_crop_to_match); the full-grid [H, W] mask must be
            # cropped the same way or the broadcast below shape-errors.
            if m.shape[-2] > error.shape[-2] or m.shape[-1] > error.shape[-1]:
                m = m[..., : error.shape[-2], : error.shape[-1]]
            m = jnp.broadcast_to(m, error.shape).astype(error.dtype)
            denom = m.mean() + 1e-9
            error = error * m / denom
        if var_names is not None:
            w = F.channel_weights(var_names, var_weights, error.shape[1])
            error = error * jnp.asarray(w, dtype=error.dtype).reshape(1, -1, 1, 1)
        per_channel = error.mean(axis=(0, 2, 3))
        loss = error.mean()
        if self.aggregate_only:
            return loss
        return jnp.concatenate([per_channel, loss[None]])


@register("perceptual")
class Perceptual(Metric):
    """L1 + 0.5*LPIPS(VGG16) (reference metrics.py:119-187, functional.py:17-33).

    The reference FSDP-wraps a frozen torch LPIPS net; here the VGG16 feature
    trunk + LPIPS linear heads run as plain JAX (weights converted offline,
    see metrics/lpips.py). Constructed with (device, model, ...) in the
    reference; we only need the weights path.
    """

    def __init__(self, aggregate_only: bool = False, metainfo=None, weights_path=None):
        super().__init__(aggregate_only, metainfo)
        from orbit2_tpu.metrics.lpips import LPIPS

        self._lpips = LPIPS(weights_path)

    def __call__(self, pred, target, **_):
        l1 = jnp.abs(pred - target).mean()
        return l1 + 0.5 * jnp.mean(self._lpips(pred, target))
