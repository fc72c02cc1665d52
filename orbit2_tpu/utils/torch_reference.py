"""Load the PyTorch reference Res_Slim_ViT for parity evaluation.

Runs the reference model (reference models/hub/res_slimvit.py) on CPU torch
with a single-process gloo group and FusedAttn.NONE — no GPU stack needed.
The reference's heavyweight deps are shimmed (timm: only trunc_normal_/
DropPath/to_2tuple are touched and they are inert in eval mode; xformers is
never called on the NONE path), and the climate_learn package skeleton is
constructed manually so importing the model module skips the package
__init__ (which needs lpips/torchvision/sympy/torchmetrics).

Used by tests/test_reference_model_parity.py and examples/parity_eval.py.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

DEFAULT_REF_SRC = "/root/reference/src"


def reference_available(ref_src: str = DEFAULT_REF_SRC) -> bool:
    import importlib.util

    for mod in ("torch", "einops"):  # res_slimvit hard-imports einops too
        if importlib.util.find_spec(mod) is None:
            return False
    return os.path.isdir(ref_src)


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_shims(ref_src: str = DEFAULT_REF_SRC) -> None:
    import torch

    # each shim family is guarded independently: a REAL timm import must not
    # suppress the xformers shims or the climate_learn package skeleton
    _install_timm(torch)
    _install_xformers()
    for name, path in [
        ("climate_learn", f"{ref_src}/climate_learn"),
        ("climate_learn.models", f"{ref_src}/climate_learn/models"),
        ("climate_learn.models.hub", f"{ref_src}/climate_learn/models/hub"),
        ("climate_learn.utils", f"{ref_src}/climate_learn/utils"),
    ]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg


def _install_timm(torch) -> None:
    import importlib.util

    if "timm" in sys.modules or importlib.util.find_spec("timm") is not None:
        return  # real timm (or our shim) already resolvable

    class DropPath(torch.nn.Module):
        """timm.layers.DropPath (identity in eval mode)."""

        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = x.new_empty(shape).bernoulli_(keep)
            if keep > 0.0 and self.scale_by_keep:
                rnd.div_(keep)
            return x * rnd

    import collections.abc

    def to_2tuple(x):  # timm._ntuple(2) semantics
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    class GlobalResponseNorm(torch.nn.Module):  # imported, never used
        pass

    timm = _mod("timm")
    timm.models = _mod("timm.models")
    _mod("timm.models.vision_transformer",
         trunc_normal_=torch.nn.init.trunc_normal_)
    timm.layers = _mod("timm.layers", DropPath=DropPath)
    _mod("timm.layers.helpers", to_2tuple=to_2tuple)
    _mod("timm.layers.trace_utils", _assert=torch._assert)
    _mod("timm.layers.grn", GlobalResponseNorm=GlobalResponseNorm)


def _install_xformers() -> None:
    import importlib.util

    if ("xformers" in sys.modules
            or importlib.util.find_spec("xformers") is not None):
        return

    def _never(*a, **k):  # pragma: no cover — NONE path never calls xformers
        raise RuntimeError("xformers shim called")

    xf = _mod("xformers")
    xf.ops = types.SimpleNamespace(memory_efficient_attention=_never,
                                   MemoryEfficientAttentionCkOp=None)
    xf.components = _mod("xformers.components")
    xf.components.attention = _mod("xformers.components.attention")
    _mod("xformers.components.attention.core",
         scaled_dot_product_attention=_never)


def ensure_gloo() -> None:
    import socket

    import torch

    if not torch.distributed.is_initialized():
        # world_size=1: pick a free ephemeral port so concurrent parity
        # harness processes on one host never collide
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        torch.distributed.init_process_group(
            "gloo", init_method=f"tcp://127.0.0.1:{port}", rank=0,
            world_size=1)


def load_reference_model(*, default_vars, img_size, in_channels, out_channels,
                         spatial_resolution, superres_mag=4, cnn_ratio=4,
                         patch_size=2, embed_dim=1024, depth=8,
                         decoder_depth=2, num_heads=16, mlp_ratio=4.0,
                         drop_path=0.1, drop_rate=0.1, learn_pos_emb=True,
                         ref_src: str = DEFAULT_REF_SRC):
    """Instantiate the reference Res_Slim_ViT in eval mode (FusedAttn.NONE)."""
    import importlib

    import torch

    install_shims(ref_src)
    ensure_gloo()
    rsv = importlib.import_module("climate_learn.models.hub.res_slimvit")
    fused = importlib.import_module("climate_learn.utils.fused_attn")

    model = rsv.Res_Slim_ViT(
        default_vars=list(default_vars), img_size=list(img_size),
        in_channels=in_channels, out_channels=out_channels, history=1,
        superres_mag=superres_mag, cnn_ratio=cnn_ratio, patch_size=patch_size,
        drop_path=drop_path, drop_rate=drop_rate, learn_pos_emb=learn_pos_emb,
        embed_dim=embed_dim, depth=depth, decoder_depth=decoder_depth,
        num_heads=num_heads, mlp_ratio=mlp_ratio,
        FusedAttn_option=fused.FusedAttn.NONE,
    )
    model.data_config(spatial_resolution, list(img_size), in_channels,
                      out_channels)
    model.eval()
    return model


def load_reference_state_dict(checkpoint_path: str, num_heads: int):
    """Load a reference checkpoint (.ckpt for tp=1, or the rank-0 file of a
    `*.ckpt_rank_R` family — siblings are auto-discovered and consolidated),
    returning a numpy full-model state_dict."""
    import glob
    import re

    import torch

    from orbit2_tpu.training.checkpoint import consolidate_torch_tp_shards

    def load_one(p):
        ck = torch.load(p, map_location="cpu", weights_only=False)
        sd = ck.get("model_state_dict", ck)
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}

    m = re.match(r"(.*\.ckpt)_rank_\d+$", checkpoint_path)
    if m:
        base = m.group(1)
        ranks = sorted(glob.glob(f"{base}_rank_*"),
                       key=lambda p: int(p.rsplit("_", 1)[1]))
        shards = [load_one(p) for p in ranks]
        return consolidate_torch_tp_shards(shards, num_heads=num_heads)
    return load_one(checkpoint_path)
