"""ORBIT-2 TPU: a TPU-native climate super-resolution training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ORBIT-2
(reference: XiaoWang-Github/ORBIT-2, surveyed in SURVEY.md). The public API
mirrors the reference's package surface (reference:
src/climate_learn/__init__.py:1-11) while the implementation is TPU-first:
one device mesh instead of six process groups, GSPMD sharding instead of
hand-written collectives, Pallas flash attention instead of Composable-Kernel
ops, and a host-side prefetch pipeline instead of the MPI DDStore.
"""

from orbit2_tpu.utils.loaders import (
    load_model_module,
    load_downscaling_module,
    load_forecasting_module,
    load_climatebench_module,
    load_architecture,
    load_optimizer,
    load_lr_scheduler,
    load_loss,
    load_transform,
)
from orbit2_tpu import data
from orbit2_tpu import metrics
from orbit2_tpu import models
from orbit2_tpu import transforms

__version__ = "0.1.0"

__all__ = [
    "load_model_module",
    "load_downscaling_module",
    "load_forecasting_module",
    "load_climatebench_module",
    "load_architecture",
    "load_optimizer",
    "load_lr_scheduler",
    "load_loss",
    "load_transform",
    "data",
    "metrics",
    "models",
    "transforms",
]
