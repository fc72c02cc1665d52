from orbit2_tpu.registry import TRANSFORMS_REGISTRY
from orbit2_tpu.transforms.transforms import Denormalize, Mask
