"""Convert trained fp params to the w8a8 serving layout.

Workflow (docs/performance.md "w8a8 serving"):

    model   = ResSlimViT(..., quant="none")     # as trained
    qmodel  = dataclasses.replace(model, quant="w8a8")
    qparams = quantize_params(qmodel, params, x, in_vars, out_vars)
    fwd     = jax.jit(lambda x: qmodel.apply({"params": qparams, **aux},
                                             x, in_vars, out_vars,
                                             deterministic=True))

`quantize_params` discovers WHICH leaves quantize from the quantized
model's own parameter structure (via jax.eval_shape on init — no FLOPs, no
memory): any module node that declares {kernel_q, kernel_scale} consumes
the trained node's fp `kernel` through ops/quant.py::quantize_weight; every
other leaf is carried over unchanged. The result halves trunk-weight HBM
and runs the int8 MXU path (measured 1.285x on the 1B serving trunk,
scripts/bench_int8_probe.py).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

import jax
import numpy as np

from orbit2_tpu.ops.quant import quantize_weight


def _convert(src: Any, target: Any, path: str):
    if isinstance(target, Mapping) and "kernel_q" in target:
        assert isinstance(src, Mapping) and "kernel" in src, (
            f"{path}: quantized module has no trained fp kernel to convert")
        wq, scale = quantize_weight(src["kernel"])
        out = {"kernel_q": wq, "kernel_scale": scale}
        if "bias" in target:
            assert "bias" in src, f"{path}: missing bias"
            out["bias"] = src["bias"]
        return out
    if isinstance(target, Mapping):
        assert isinstance(src, Mapping), f"{path}: structure mismatch"
        out = {}
        for k, tv in target.items():
            assert k in src, f"{path}/{k}: missing in trained params"
            out[k] = _convert(src[k], tv, f"{path}/{k}")
        return out
    # leaf: carry the trained value through (shapes must agree)
    assert tuple(np.shape(src)) == tuple(target.shape), (
        f"{path}: shape {np.shape(src)} != expected {tuple(target.shape)}")
    return src


def quantize_params(quant_model, params, x, in_variables, out_variables):
    """Map a trained fp param tree onto `quant_model`'s w8a8 layout.

    `x` is an example input batch (only its shape/dtype are used —
    jax.eval_shape traces init abstractly)."""
    target = jax.eval_shape(
        lambda: quant_model.init(
            {"params": jax.random.PRNGKey(0)}, x,
            tuple(in_variables), tuple(out_variables), deterministic=True),
    )["params"]
    return _convert(params, target, "params")
