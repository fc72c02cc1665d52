from orbit2_tpu.registry import MODEL_REGISTRY
from orbit2_tpu.models.res_slimvit import ResSlimViT, find_var_index, RESIDUAL_STATIC_VARS
from orbit2_tpu.models.baselines import (
    Climatology,
    Persistence,
    LinearRegression,
    Interpolation,
)
from orbit2_tpu.models.vit import VisionTransformer
from orbit2_tpu.models.unet import Unet
from orbit2_tpu.models.resnet import ResNet
from orbit2_tpu.models import components
