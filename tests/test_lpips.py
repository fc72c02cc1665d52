"""LPIPS numeric parity vs a torch oracle (VERDICT r1 missing #1).

The trained VGG16/lin weights cannot be obtained in this zero-egress image
(no torchvision/lpips packages, nothing cached on disk), so the forward math
and the weight-layout conversion are verified against a torch implementation
of the lpips-package architecture (metrics.py:124, functional.py:17-33 in
the reference) using RANDOM weights saved through the exact npz layout the
offline converter (`python -m orbit2_tpu.metrics.lpips out.npz`) produces.
Any transpose/padding/pool-placement/normalization mismatch shows up here;
only the literal trained values remain an offline step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from orbit2_tpu.metrics.lpips import (  # noqa: E402
    _POOL_BEFORE,
    _SCALE,
    _SHIFT,
    _TAPS,
    _VGG_PLAN,
    LPIPS,
)


def _random_weight_npz(tmp_path, rng):
    arrays = {}
    for i, (ci, co) in enumerate(_VGG_PLAN):
        arrays[f"conv{i}_w"] = rng.normal(0, 0.1, size=(co, ci, 3, 3)).astype(np.float32)
        arrays[f"conv{i}_b"] = rng.normal(0, 0.1, size=(co,)).astype(np.float32)
    taps_c = [64, 128, 256, 512, 512]
    for i, c in enumerate(taps_c):
        # lpips lin layers: 1x1 conv, non-negative weights
        arrays[f"lin{i}_w"] = np.abs(rng.normal(0, 0.05, size=(1, c, 1, 1))
                                     ).astype(np.float32)
    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **arrays)
    return str(path), arrays


def _torch_lpips(x, y, arrays):
    """The lpips-package forward, in torch (scaling layer -> VGG16 slices ->
    normalize_tensor (eps outside sqrt) -> lin 1x1 -> spatial average)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(t):
        t = (t - shift) / scale
        out = []
        for i in range(len(_VGG_PLAN)):
            if i in _POOL_BEFORE:
                t = F.max_pool2d(t, 2)
            w = torch.from_numpy(arrays[f"conv{i}_w"])
            b = torch.from_numpy(arrays[f"conv{i}_b"])
            t = F.relu(F.conv2d(t, w, b, padding=1))
            if i in _TAPS:
                out.append(t)
        return out

    f0, f1 = feats(x), feats(y)
    total = torch.zeros(x.shape[0])
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb).pow(2)
        lin = torch.from_numpy(arrays[f"lin{i}_w"])
        total = total + F.conv2d(diff, lin).mean(dim=(1, 2, 3))
    return total


def test_lpips_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(0)
    path, arrays = _random_weight_npz(tmp_path, rng)

    x = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = _torch_lpips(torch.from_numpy(x), torch.from_numpy(y),
                            arrays).numpy()

    import jax.numpy as jnp

    net = LPIPS(weights_path=path)
    got = np.asarray(net(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert (got > 0).all()


def test_lpips_zero_for_identical_inputs(tmp_path):
    rng = np.random.default_rng(1)
    path, _ = _random_weight_npz(tmp_path, rng)
    import jax.numpy as jnp

    net = LPIPS(weights_path=path)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 32, 32)).astype(np.float32))
    d = float(net(x, x)[0])
    assert abs(d) < 1e-6
