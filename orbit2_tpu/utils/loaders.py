"""Public API factory functions.

Mirrors reference src/climate_learn/utils/loaders.py:31-480: same function
names, same task/architecture/loss string surface, same 7-tuple return from
`load_model_module`. JAX-flavored differences:
  * "model" is a flax Module definition; parameters are initialized by the
    Trainer (orbit2_tpu/training), not inside the factory.
  * `load_optimizer`/`load_lr_scheduler` return an optax transformation and
    an epoch->lr schedule function.
  * `device` is accepted for signature parity and ignored (placement is the
    mesh's job).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Union

import numpy as np
import jax.numpy as jnp

from orbit2_tpu.registry import METRICS_REGISTRY, MODEL_REGISTRY, TRANSFORMS_REGISTRY
from orbit2_tpu.metrics.metrics import MetricsMetaInfo
import orbit2_tpu.metrics.metrics  # noqa: F401  (populate registry)
import orbit2_tpu.transforms  # noqa: F401
from orbit2_tpu.models.res_slimvit import ResSlimViT
from orbit2_tpu.models.vit import VisionTransformer
from orbit2_tpu.models.resnet import ResNet
from orbit2_tpu.models.unet import Unet  # noqa: F401 (registry)
from orbit2_tpu.models.baselines import (
    Climatology,
    Interpolation,
    LinearRegression,
    Persistence,
)
from orbit2_tpu.training.optim import make_lr_scheduler, make_optimizer


def load_model_module(
    device=None,
    data_module=None,
    task: str = "downscaling",
    architecture: Optional[str] = None,
    model=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    optim=None,
    optim_kwargs: Optional[Dict[str, Any]] = None,
    sched=None,
    sched_kwargs: Optional[Dict[str, Any]] = None,
    train_loss: Optional[Union[str, Callable]] = None,
    val_loss: Optional[Iterable[Union[str, Callable]]] = None,
    test_loss: Optional[Iterable[Union[str, Callable]]] = None,
    train_target_transform: Optional[Union[str, Callable]] = None,
    val_target_transform: Optional[Iterable] = None,
    test_target_transform: Optional[Iterable] = None,
):
    """Returns (model, train_loss, val_losses, test_losses, train_transform,
    val_transforms, test_transforms) — reference loaders.py:31-222."""
    lat, lon = data_module.get_lat_lon()
    if lat is None and lon is None:
        raise RuntimeError("Data module has not been set up yet.")

    if architecture is None and model is None:
        raise RuntimeError("Please specify 'architecture' or 'model'")
    if architecture and model is None:
        model = load_architecture(task, data_module, architecture, **(model_kwargs or {}))
    elif isinstance(model, str):
        raise RuntimeError(f"{model} is not an implemented model.")

    in_vars, out_vars = data_module.get_data_variables()

    def _metainfo(split):
        clim = get_climatology(data_module, split)
        return MetricsMetaInfo(in_vars, out_vars, lat, lon, clim)

    if isinstance(train_loss, str):
        train_loss = load_loss(device, model, train_loss, True, _metainfo("train"))
    elif not callable(train_loss):
        raise TypeError("'train_loss' must be str or Callable")

    train_transform = _load_one_transform(train_target_transform, data_module)

    val_losses = _load_losses(device, model, val_loss, _metainfo, "val")
    test_losses = _load_losses(device, model, test_loss, _metainfo, "test")
    val_transforms = _load_transforms(val_target_transform, data_module)
    test_transforms = _load_transforms(test_target_transform, data_module)

    return (model, train_loss, val_losses, test_losses,
            train_transform, val_transforms, test_transforms)


def _load_losses(device, model, losses, metainfo_fn, split):
    if not isinstance(losses, Iterable):
        raise TypeError(f"'{split}_loss' must be an iterable")
    out = []
    for item in losses:
        if isinstance(item, str):
            out.append(load_loss(device, model, item, False, metainfo_fn(split)))
        elif callable(item):
            out.append(item)
        else:
            raise TypeError(f"each '{split}_loss' must be str or Callable")
    return out


def _load_one_transform(t, data_module):
    if isinstance(t, str):
        return load_transform(t, data_module)
    if t is None or callable(t):
        return t
    raise TypeError("transform must be str, callable, or None")


def _load_transforms(transforms, data_module):
    if transforms is None:
        return None
    if not isinstance(transforms, Iterable):
        raise TypeError("target transforms must be an iterable or None")
    return [_load_one_transform(t, data_module) for t in transforms]


load_forecasting_module = partial(
    load_model_module,
    task="forecasting",
    train_loss="lat_mse",
    val_loss=["lat_rmse", "lat_acc", "lat_mse"],
    test_loss=["lat_rmse", "lat_acc"],
    train_target_transform=None,
    val_target_transform=["denormalize", "denormalize", None],
    test_target_transform=["denormalize", "denormalize"],
)

load_climatebench_module = partial(
    load_model_module,
    task="forecasting",
    train_loss="mse",
    val_loss=["mse"],
    test_loss=["lat_nrmses", "lat_nrmseg", "lat_nrmse"],
    train_target_transform=None,
    val_target_transform=[lambda x: x],
    test_target_transform=[lambda x: x, lambda x: x, lambda x: x],
)

load_downscaling_module = partial(
    load_model_module,
    task="downscaling",
    train_loss="mse",
    val_loss=["rmse", "pearson", "mean_bias", "mse"],
    test_loss=["rmse", "pearson", "mean_bias"],
    train_target_transform=None,
    val_target_transform=["denormalize", "denormalize", "denormalize", None],
    test_target_transform=["denormalize", "denormalize", "denormalize"],
)


class PreInterpolated:
    """nn.Sequential(Interpolation, backbone) equivalent
    (reference loaders.py:383-385): upsample the input to the target grid,
    then run a same-resolution backbone."""

    def __init__(self, interpolation: Interpolation, backbone):
        self.interpolation = interpolation
        self.backbone = backbone

    def init(self, rngs, x, *args, **kwargs):
        # the backbone only ever sees interpolated (target-grid) inputs —
        # init must match apply or shape-dependent params (pos embeds) are
        # created at the wrong resolution
        return self.backbone.init(rngs, self.interpolation(x), *args, **kwargs)

    def apply(self, variables, x, *args, **kwargs):
        x = self.interpolation(x)
        return self.backbone.apply(variables, x, *args, **kwargs)

    def for_phase(self, spatial_resolution=None, img_size=None,
                  in_channels=None, out_channels=None):
        """data_config equivalent for wrapped backbones. Conv backbones are
        geometry-agnostic (return self); a backbone with its own for_phase
        is rebound over the same params."""
        bb = self.backbone
        if hasattr(bb, "for_phase"):
            bb = bb.for_phase(spatial_resolution=spatial_resolution,
                              img_size=img_size, in_channels=in_channels,
                              out_channels=out_channels)
            return PreInterpolated(self.interpolation, bb)
        return self


def load_architecture(
    task,
    data_module,
    architecture,
    default_vars=None,
    superres_mag=4,
    cnn_ratio=4,
    patch_size=2,
    embed_dim=256,
    depth=6,
    decoder_depth=1,
    num_heads=4,
    mlp_ratio=4,
    drop_path=0.1,
    drop_rate=0.1,
    attention_impl="auto",
    gelu_approx="exact",
    data_type="float32",
    remat=False,
    remat_policy="full",
    pipeline_stages=1,
    pipeline_microbatches=0,
    moe_experts=0,
    moe_every=2,
    moe_capacity_factor=1.25,
    moe_top_k=1,
    **_ignored,
):
    """reference loaders.py:259-387. tensor_par_size/group args are gone: the
    mesh handles TP (orbit2_tpu/parallel)."""
    in_vars, out_vars = data_module.get_data_variables()
    in_shape, out_shape = data_module.get_data_dims()
    dtype = jnp.bfloat16 if data_type == "bfloat16" else jnp.float32

    def raise_not_impl():
        raise NotImplementedError(
            f"{architecture} is not an implemented architecture for the {task} task."
        )

    if task == "forecasting":
        history, in_channels, in_height, in_width = in_shape[1:]
        out_channels, out_height, out_width = out_shape[1:]
        if architecture.lower() == "climatology":
            clim = get_climatology(data_module, "train")
            return Climatology(clim=jnp.asarray(clim))
        if architecture == "persistence":
            if not set(out_vars).issubset(in_vars):
                raise RuntimeError(
                    "Persistence requires the output variables to be a subset"
                    " of the input variables."
                )
            return Persistence(channels=tuple(in_vars.index(o) for o in out_vars))
        if architecture.lower() == "linear-regression":
            in_features = history * in_channels * in_height * in_width
            out_features = out_channels * out_height * out_width
            return LinearRegression(
                in_features=in_features,
                out_features=out_features,
                out_shape=(out_channels, out_height, out_width),
            )
        if architecture.lower() == "rasp-theurey-2020":
            return ResNet(
                in_channels=in_channels, out_channels=out_channels, history=history,
                hidden_channels=128, activation="leaky", norm=True, dropout=0.1,
                n_blocks=19, dtype=dtype,
            )
        raise_not_impl()

    if task == "downscaling":
        in_channels, in_height, in_width = in_shape[1:]
        out_channels, out_height, out_width = out_shape[1:]
        if architecture.lower() in ("bilinear-interpolation", "nearest-interpolation"):
            if set(out_vars) != set(in_vars):
                raise RuntimeError(
                    "Interpolation requires the output variables to match the"
                    " input variables."
                )
            mode = architecture.split("-")[0]
            return Interpolation(scale_factor=out_height / in_height, mode=mode)
        if architecture == "vit":
            backbone = VisionTransformer(
                img_size=(out_height, out_width), in_channels=in_channels,
                out_channels=out_channels, history=1, patch_size=patch_size,
                learn_pos_emb=True, embed_dim=embed_dim, depth=depth,
                decoder_depth=decoder_depth, num_heads=num_heads,
                mlp_ratio=mlp_ratio, drop_path=drop_path, drop_rate=drop_rate,
                attention_impl=attention_impl, gelu_approx=gelu_approx,
                dtype=dtype,
            )
            return PreInterpolated(
                Interpolation(scale_factor=out_height / in_height, mode="bilinear"),
                backbone,
            )
        if architecture in ("unet", "resnet"):
            # The reference's fine-tune driver offers these presets
            # (era5_daymet_downscaling.py:204) but its load_architecture
            # rejects them (loaders.py:376-385) — here they work:
            # interpolation-first like the vit path, BatchNorm running stats
            # threaded through training via aux_collections.
            cls = Unet if architecture == "unet" else ResNet
            backbone = cls(in_channels=in_channels, out_channels=out_channels,
                           history=1, dropout=drop_rate, dtype=dtype)
            return PreInterpolated(
                Interpolation(scale_factor=out_height / in_height, mode="bilinear"),
                backbone,
            )
        if architecture == "res_slimvit":
            return ResSlimViT(
                default_vars=tuple(default_vars),
                img_size=(in_height, in_width),
                in_channels=in_channels,
                out_channels=out_channels,
                superres_mag=superres_mag,
                history=1,
                patch_size=patch_size,
                cnn_ratio=cnn_ratio,
                learn_pos_emb=True,  # the reference hardcodes this (loaders.py:366)
                embed_dim=embed_dim,
                depth=depth,
                decoder_depth=decoder_depth,
                num_heads=num_heads,
                mlp_ratio=mlp_ratio,
                drop_path=drop_path,
                drop_rate=drop_rate,
                attention_impl=attention_impl,
                gelu_approx=gelu_approx,
                remat=remat,
                remat_policy=remat_policy,
                pipeline_stages=pipeline_stages,
                pipeline_microbatches=pipeline_microbatches,
                moe_experts=moe_experts,
                moe_every=moe_every,
                moe_capacity_factor=moe_capacity_factor,
                moe_top_k=moe_top_k,
                dtype=dtype,
            )
        raise_not_impl()
    raise_not_impl()


def load_optimizer(net=None, optim: str = "adamw", optim_kwargs: Optional[Dict[str, Any]] = None):
    """reference loaders.py:390-406 -> optax transformation."""
    return make_optimizer(optim.lower(), optim_kwargs or {})


def load_lr_scheduler(sched: str, optimizer=None, sched_kwargs: Optional[Dict[str, Any]] = None):
    """reference loaders.py:409-433 -> epoch -> lr function."""
    kwargs = dict(sched_kwargs or {})
    kwargs.setdefault("lr", kwargs.get("base_lr", kwargs.get("lr", 1.0)))
    return make_lr_scheduler(sched, kwargs)


def load_loss(device, model, loss_name, aggregate_only, metainfo):
    """reference loaders.py:436-450."""
    loss_cls = METRICS_REGISTRY.get(loss_name, None)
    if loss_cls is None:
        raise NotImplementedError(f"{loss_name} is not an implemented loss.")
    return loss_cls(aggregate_only=aggregate_only, metainfo=metainfo)


def load_transform(transform_name, data_module):
    """reference loaders.py:453-462."""
    transform_cls = TRANSFORMS_REGISTRY.get(transform_name, None)
    if transform_cls is None:
        raise NotImplementedError(f"{transform_name} is not an implemented transform.")
    return transform_cls(data_module)


def get_climatology(data_module, split):
    clim = data_module.get_climatology(split=split)
    if clim is None:
        raise RuntimeError("Climatology has not yet been set.")
    if isinstance(clim, dict):
        clim = np.stack(tuple(clim.values()))
    return clim
