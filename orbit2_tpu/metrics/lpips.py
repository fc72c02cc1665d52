"""LPIPS (VGG16) perceptual distance in pure JAX.

Replaces the reference's `lpips.LPIPS(net='vgg')` torch module (reference
metrics.py:124, functional.py:17-33), which it even FSDP-wraps. On TPU the
frozen VGG16 trunk is tiny relative to the model, so it runs replicated
inside the jitted loss.

Architecture (matching the `lpips` pypi package, v0.1 weights):
  scaling layer (fixed RGB shift/scale) -> VGG16 convs -> features at
  relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 -> channel-unit-normalize ->
  1x1 "lin" convs (non-negative weights) -> spatial mean -> sum over layers.

Weights must be converted offline (no network egress): run
`python -m orbit2_tpu.metrics.lpips <out.npz>` on a machine with torch +
lpips installed, or point ORBIT2_LPIPS_WEIGHTS at an existing .npz.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layer channel plan; features tapped after the last conv+relu of
# each block (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_PLAN = [
    (3, 64), (64, 64),                      # block 1 (tap after idx 1)
    (64, 128), (128, 128),                  # block 2 (tap after idx 3)
    (128, 256), (256, 256), (256, 256),     # block 3 (tap after idx 6)
    (256, 512), (512, 512), (512, 512),     # block 4 (tap after idx 9)
    (512, 512), (512, 512), (512, 512),     # block 5 (tap after idx 12)
]
_TAPS = [1, 3, 6, 9, 12]
_POOL_BEFORE = [2, 4, 7, 10]  # conv indices preceded by 2x2 maxpool

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class LPIPS:
    def __init__(self, weights_path: Optional[str] = None):
        weights_path = weights_path or os.environ.get("ORBIT2_LPIPS_WEIGHTS")
        if weights_path is None or not os.path.exists(weights_path):
            raise FileNotFoundError(
                "LPIPS needs converted VGG16+lin weights. Set ORBIT2_LPIPS_WEIGHTS "
                "to an .npz produced by `python -m orbit2_tpu.metrics.lpips out.npz` "
                "(requires torch+lpips, run offline)."
            )
        data = np.load(weights_path)
        # conv kernels stored torch-layout (O, I, kH, kW); convert to HWIO
        self.convs = []
        for i in range(len(_VGG_PLAN)):
            w = jnp.asarray(data[f"conv{i}_w"]).transpose(2, 3, 1, 0)
            b = jnp.asarray(data[f"conv{i}_b"])
            self.convs.append((w, b))
        self.lins = [jnp.asarray(data[f"lin{i}_w"]).reshape(-1) for i in range(len(_TAPS))]

    def _features(self, x):
        """x: [B, 3, H, W] in roughly [-1, 1]."""
        x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for TPU convs
        feats = []
        for i, (w, b) in enumerate(self.convs):
            if i in _POOL_BEFORE:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            x = jax.nn.relu(x)
            if i in _TAPS:
                feats.append(x)
        return feats

    def __call__(self, pred, target):
        """pred/target: [B, C, H, W]; C must be 3 (the reference feeds its
        3 output variables directly into the RGB slots)."""
        assert pred.shape[1] == 3, "LPIPS expects 3 channels"
        f0 = self._features(pred)
        f1 = self._features(target)
        total = 0.0
        for a, b, lin in zip(f0, f1, self.lins):
            # lpips.normalize_tensor: eps OUTSIDE the sqrt
            na = a / (jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True)) + 1e-10)
            nb = b / (jnp.sqrt(jnp.sum(jnp.square(b), axis=-1, keepdims=True)) + 1e-10)
            diff = jnp.square(na - nb)  # [B, H, W, C]
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1), axis=(1, 2))
        return total  # [B]


def convert_weights(out_path: str):  # pragma: no cover - offline utility
    """Convert torchvision VGG16 + lpips lin weights to the npz this module
    loads. Run offline where torch, torchvision and lpips are installed."""
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="vgg")
    arrays = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    conv_idx = 0
    for m in convs:
        if m.__class__.__name__ == "Conv2d":
            arrays[f"conv{conv_idx}_w"] = m.weight.detach().numpy()
            arrays[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
            conv_idx += 1
    for i, lin in enumerate(net.lins):
        arrays[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **arrays)


if __name__ == "__main__":  # pragma: no cover
    import sys

    convert_weights(sys.argv[1])
