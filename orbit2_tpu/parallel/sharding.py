"""Parameter PartitionSpec rules — HSDP x TP as GSPMD sharding.

Replaces the reference's whole distributed-weights machinery: the Megatron
column/row Linear splits inside Attention/Mlp (reference attention.py:36-40,
mlp.py:50-54), the differentiable collective library (dist_functions.py), and
PyTorch FSDP FULL/HYBRID_SHARD wrapping (intermediate_downscaling.py:610-621).
Each parameter gets a PartitionSpec over the (replica, fsdp, seq, tensor)
mesh; XLA inserts the same all-gathers/reduce-scatters/all-reduces FSDP+TP
would issue, scheduled and overlapped by the compiler.

Rules (first match wins; patterns are substring matches on the '/'-joined
param path):

  qkv / fc1 / var_agg q,kv kernels  -> column parallel: P(fsdp, tensor)
  attn proj / fc2 / var_agg proj    -> row parallel:    P(tensor, fsdp)
  their column-side biases          -> P(tensor)
  decoder head / patch-embed stacks -> fsdp on the largest dim
  everything else                   -> replicated

Axes are dropped automatically when a dim is not divisible by the mesh axis
size, so the same rules serve every model scale.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbit2_tpu.parallel.mesh import (AXIS_EXPERT, AXIS_FSDP, AXIS_STAGE,
                                      AXIS_TENSOR)

# (path regex, spec builder given ndim)
_RULES: List[Tuple[str, Any]] = [
    # MoE expert stacks (models/components/moe.py): experts over the
    # `expert` axis, the per-expert fc1/fc2 keep the dense Mlp's
    # column/row tensor split behind the leading E dim. The fp32 router
    # kernel [D, E] is tiny and stays replicated (falls through to P()).
    (r"moe_mlp/wi$", P(AXIS_EXPERT, AXIS_FSDP, AXIS_TENSOR)),
    (r"moe_mlp/bi$", P(AXIS_EXPERT, AXIS_TENSOR)),
    (r"moe_mlp/wo$", P(AXIS_EXPERT, AXIS_TENSOR, AXIS_FSDP)),
    (r"moe_mlp/bo$", P(AXIS_EXPERT, None)),
    # tensor-parallel column splits (output dim on tensor)
    (r"(attn/qkv|mlp/fc1)/kernel$", P(AXIS_FSDP, AXIS_TENSOR)),
    (r"(attn/qkv|mlp/fc1)/bias$", P(AXIS_TENSOR)),
    (r"var_agg/(q_kernel|kv_kernel)$", P(AXIS_FSDP, AXIS_TENSOR)),
    (r"var_agg/(q_bias|kv_bias)$", P(AXIS_TENSOR)),
    # tensor-parallel row splits (input dim on tensor)
    (r"(attn/proj|mlp/fc2|var_agg/proj)/kernel$", P(AXIS_TENSOR, AXIS_FSDP)),
    # decoder head and misc dense layers: fsdp-shard the input dim
    (r"head_\d+/kernel$", P(AXIS_FSDP, None)),
    (r"head_out/kernel$", P(AXIS_FSDP, None)),
    # per-variable token embedding stack [V, p*p, D]: shard embed dim
    (r"token_embed_kernel$", P(None, None, AXIS_FSDP)),
    # learnable pos embed [1, L, D]: shard over tokens
    (r"pos_embed$", P(None, AXIS_FSDP, None)),
    (r"patch_embed/kernel$", P(AXIS_FSDP, None)),
]


def _fit(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop spec axes whose dim isn't divisible by the mesh axis size."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for dim, axis in zip(shape, entries):
        if axis is None:
            out.append(None)
            continue
        size = int(np.prod([mesh.shape[a] for a in (axis if isinstance(axis, tuple) else (axis,))]))
        out.append(axis if size > 0 and dim % size == 0 else None)
    return P(*out)


def spec_for(path: str, shape: Tuple[int, ...], mesh: Mesh) -> P:
    # Pipelined trunk: stacked block params [depth, ...] shard the leading
    # depth dim over `stage` (each stage holds depth/stages blocks —
    # parallel/pipeline.py) AND keep the per-block TP/FSDP spec on the
    # trailing dims: the pipeline body's shard_map is manual ONLY over
    # stage, so the tensor/fsdp axes stay under GSPMD auto-sharding and the
    # usual Megatron column/row splits apply unchanged behind the stack.
    if "blocks_stacked_iv/" in path:
        # interleaved pipeline layout [V, S, dc, ...]: the STAGE dim is the
        # second — each stage owns its V round-robin chunks in place
        # (parallel/pipeline.py STACKED_IV_KEY)
        inner_path = path.split("blocks_stacked_iv/", 1)[1]
        inner = spec_for(inner_path, shape[3:], mesh)
        return _fit(P(None, AXIS_STAGE, None, *tuple(inner)), shape, mesh)
    if "blocks_stacked/" in path:
        inner_path = path.split("blocks_stacked/", 1)[1]
        inner = spec_for(inner_path, shape[1:], mesh)
        return _fit(P(AXIS_STAGE, *tuple(inner)), shape, mesh)
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            return _fit(spec, shape, mesh)
    return P()


def _flatten_paths(tree) -> Dict[str, Any]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): leaf
        for path, leaf in flat
    }


def param_specs(params, mesh: Mesh):
    """PyTree of PartitionSpec matching `params` (works on concrete arrays or
    jax.eval_shape output)."""

    def one(path, leaf):
        pstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return spec_for(pstr, leaf.shape, mesh)

    return jax.tree_util.tree_map_with_path(one, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        param_specs(params, mesh),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh):
    """Place an existing (host/replicated) param tree onto the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))
