"""Pipeline parallelism — GPipe fill/drain schedule over a `stage` mesh axis.

The reference has NO pipeline parallelism: SURVEY §2.7 lists PP as absent
(grep-verified; only the stubbed seq_par axis exists,
reference examples/intermediate_downscaling.py:165). This module is a
TPU-native upgrade in the same spirit as the real seq axis: the homogeneous
transformer trunk (depth x Block, reference res_slimvit.py:291-292) is split
into `stages` contiguous groups of blocks, each group living on one slice of
the `stage` mesh axis, and microbatches flow through the classic GPipe
schedule with `jax.lax.ppermute` moving activations stage -> stage+1.

TPU-first mechanics:

  * Partial-manual `jax.shard_map(..., axis_names={"stage"})`: the body is
    manual ONLY over the stage axis. The data axes (replica, fsdp) stay under
    GSPMD auto-sharding, so PP composes with DP/FSDP without any manual
    collectives — batches stay sharded over (replica, fsdp) inside the
    pipeline body exactly as outside it.
  * Block parameters live STACKED ([depth, ...] leading dim) and are sharded
    `P("stage")`: each stage holds only its depth/stages blocks — the PP
    memory story. `stack_block_params`/`unstack_block_params` convert to and
    from the per-block `blocks_{i}` checkpoint layout for interop with
    non-pipelined checkpoints (training/checkpoint.py import path).
  * The schedule is one `lax.scan` over M + S - 1 ticks; reverse-mode AD
    differentiates straight through ppermute/scan, so the full training step
    (grad + optimizer) works unchanged.
  * Intended placement: `stage` is the OUTERMOST mesh axis (mesh.py), so
    stage->stage+1 activations ride DCN between slices while FSDP/TP
    collectives stay on ICI within a slice — the standard multi-slice TPU
    layout.

Scope: pipeline composes with replica/fsdp/tensor (all auto axes — the
stacked params carry the Megatron column/row specs behind the leading
stage dim, parallel/sharding.py::spec_for). seq_par inside a pipelined
trunk is rejected at config validation (config.py): the trunk-level token
constraints live outside the pipeline body.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from orbit2_tpu.parallel.mesh import AXIS_STAGE

STACKED_KEY = "blocks_stacked"
_BLOCK_RE = re.compile(r"^blocks_(\d+)$")


def stack_block_params(params: Dict, key: str = STACKED_KEY) -> Dict:
    """blocks_0..blocks_{n-1} subtrees -> one stacked subtree under `key`.

    Input tree is not mutated. Raises if the block set is empty or has holes.
    """
    idx = sorted(
        int(m.group(1)) for k in params if (m := _BLOCK_RE.match(k)))
    if not idx:
        raise ValueError("no blocks_<i> subtrees to stack")
    if idx != list(range(len(idx))):
        raise ValueError(f"non-contiguous block indices: {idx}")
    per = [params[f"blocks_{i}"] for i in idx]
    out = {k: v for k, v in params.items() if not _BLOCK_RE.match(k)}
    out[key] = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    return out


def unstack_block_params(params: Dict, key: str = STACKED_KEY) -> Dict:
    """Inverse of stack_block_params: stacked subtree -> blocks_{i} subtrees."""
    if key not in params:
        raise ValueError(f"no '{key}' subtree to unstack")
    stacked = params[key]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    out = {k: v for k, v in params.items() if k != key}
    for i in range(depth):
        out[f"blocks_{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    return out


def stage_mesh_size() -> int:
    """Size of the `stage` axis of the ambient (abstract) mesh, or 0 when no
    mesh with a stage axis is in context (e.g. model.init, plain CPU tests)."""
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is None or AXIS_STAGE not in (am.axis_names or ()):
            return 0
        return int(dict(am.shape)[AXIS_STAGE])
    except Exception:
        return 0


def apply_stacked_sequential(
    block_fn: Callable,
    stacked,
    x,
    dpr,
    rngs: Optional[Dict] = None,
):
    """Reference semantics for the pipelined trunk: apply the stacked blocks
    one after another (used at init time and when no stage mesh is active).
    block_fn(params_j, x, rate_j, rngs_j) -> x."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    for j in range(depth):
        p_j = jax.tree.map(lambda a, j=j: a[j], stacked)
        r_j = None if rngs is None else {
            k: jax.random.fold_in(v, j) for k, v in rngs.items()}
        x = block_fn(p_j, x, dpr[j], r_j)
    return x


def pipeline_blocks(
    block_fn: Callable,
    stacked,
    x,
    dpr,
    *,
    stages: int,
    microbatches: int = 0,
    rngs: Optional[Dict] = None,
):
    """Run `x` through the stacked blocks with a GPipe schedule over the
    ambient mesh's `stage` axis.

    block_fn(params_j, x, drop_path_rate_j, rngs_j or None) -> x, where
    params_j is one block's param subtree and rngs_j a dict of PRNG keys
    (already decorrelated per (tick, global block)).

    x: [B, L, D] — global over the auto (data) axes. B must be divisible by
    `microbatches` (default: = stages).
    """
    from jax.sharding import PartitionSpec as P

    depth = jax.tree.leaves(stacked)[0].shape[0]
    S = int(stages)
    M = int(microbatches) if microbatches else S
    if S < 1 or depth % S:
        raise ValueError(f"depth {depth} not divisible by stages {S}")
    if x.shape[0] % M:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by microbatches {M} "
            "(set parallelism.pipeline_microbatches to a divisor)")
    if stage_mesh_size() != S:
        raise ValueError(
            f"pipeline_stages={S} but ambient mesh stage axis is "
            f"{stage_mesh_size()} — build the mesh with stage={S}")
    d_s = depth // S
    rngs = rngs or {}

    def body(stacked_local, dpr_local, x_full, rng_dict):
        stage = jax.lax.axis_index(AXIS_STAGE)
        mb = x_full.shape[0] // M
        xs = x_full.reshape(M, mb, *x_full.shape[1:])

        def stage_fn(x, t):
            for j in range(d_s):
                p_j = jax.tree.map(lambda a, j=j: a[j], stacked_local)
                g = stage * d_s + j  # global block index
                r = {k: jax.random.fold_in(jax.random.fold_in(v, t), g)
                     for k, v in rng_dict.items()} or None
                x = block_fn(p_j, x, dpr_local[j], r)
            return x

        T = M + S - 1
        varying = lambda v: jax.lax.pcast(v, (AXIS_STAGE,), to="varying")
        out0 = varying(jnp.zeros_like(xs))
        y0 = varying(jnp.zeros_like(xs[0]))

        def tick(carry, t):
            y_prev, out = carry
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(stage == 0, feed, y_prev)
            y = stage_fn(x_in, t)
            # last stage writes finished microbatch t-(S-1) into the output
            widx = t - (S - 1)
            wc = jnp.clip(widx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out, wc, 0, keepdims=False)
            valid = jnp.logical_and(stage == S - 1, widx >= 0)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur), wc, 0)
            y_next = jax.lax.ppermute(
                y, AXIS_STAGE, [(i, i + 1) for i in range(S - 1)])
            return (y_next, out), None

        (_, out), _ = jax.lax.scan(tick, (y0, out0), jnp.arange(T))
        # only the last stage holds real outputs; make them stage-invariant
        out = jax.lax.psum(out * (stage == S - 1), AXIS_STAGE)
        return out.reshape(x_full.shape)

    return jax.shard_map(
        body,
        in_specs=(P(AXIS_STAGE), P(AXIS_STAGE), P(), P()),
        out_specs=P(),
        axis_names={AXIS_STAGE},
    )(stacked, dpr, x, rngs)
