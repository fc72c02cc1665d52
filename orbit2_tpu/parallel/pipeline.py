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

Why there is no literal "1F1B" schedule here (and what replaces it):

  * 1F1B's MEMORY benefit (store S in-flight activation sets instead of M)
    presumes stages can launch a microbatch's backward as soon as its loss
    gradient exists. Under jax.grad the pipeline is one dataflow program:
    every microbatch's cotangent arrives only after the decoder head + loss
    (which run OUTSIDE the stage shard_map) finish for all microbatches, so
    the forward has already materialized its per-tick residuals before any
    backward can start. The expressible memory-optimal point is per-tick
    rematerialization — `trainer.remat` wraps block_fn in jax.checkpoint,
    dropping per-tick residuals to one microbatch INPUT each (exactly the
    tensors a JAX 1F1B would have to carry in scan state anyway, since
    scan carries must be arrays, not vjp closures).
  * 1F1B's BUBBLE benefit does apply under SPMD — fill/drain ticks waste
    (S-1)/(M+S-1) of the step — and is delivered here by the
    Megatron-style INTERLEAVED (circular) schedule instead: with
    `interleave=V` each stage holds V round-robin chunks of depth/(S*V)
    blocks and microbatches loop through the ring V times; per-tick work
    shrinks by V, so the relative bubble drops to (S-1)/(V*M + S-1).
    V=1 is the plain GPipe schedule.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from orbit2_tpu.parallel.mesh import AXIS_STAGE

STACKED_KEY = "blocks_stacked"
# interleave > 1 stores the stack as [V, S, dc, ...] under its own key so
# sharding rules (P(None, "stage", None, ...)) and checkpoint conversions
# can tell the layouts apart by name, not by rank guessing. C-order reshape:
# element [v, s, j] is canonical block (v*S + s)*dc + j — stage s owns its
# interleaved round-robin chunks with NO permutation anywhere.
STACKED_IV_KEY = "blocks_stacked_iv"
_BLOCK_RE = re.compile(r"^blocks_(\d+)$")


def to_interleaved(stacked, stages: int, interleave: int):
    """[depth, ...] stacked tree -> [V, S, dc, ...] interleaved layout."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    S, V = int(stages), int(interleave)
    if depth % (S * V):
        raise ValueError(
            f"depth {depth} not divisible by stages*interleave {S}*{V}")
    dc = depth // (S * V)
    return jax.tree.map(lambda a: a.reshape(V, S, dc, *a.shape[1:]), stacked)


def from_interleaved(iv):
    """[V, S, dc, ...] interleaved tree -> [depth, ...] canonical stack."""
    return jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1] * a.shape[2],
                            *a.shape[3:]), iv)


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
    interleave: int = 1,
):
    """Reference semantics for the pipelined trunk: apply the stacked blocks
    one after another (used at init time and when no stage mesh is active).
    block_fn(params_j, x, rate_j, rngs_j) -> x. Pass interleave > 1 when
    `stacked` is in the [V, S, dc, ...] layout (flattens back to canonical
    block order — a pure reshape)."""
    if interleave > 1:
        stacked = from_interleaved(stacked)
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
    interleave: int = 1,
    rngs: Optional[Dict] = None,
):
    """Run `x` through the stacked blocks with a GPipe (interleave=1) or
    Megatron-style interleaved/circular (interleave=V>1) schedule over the
    ambient mesh's `stage` axis.

    block_fn(params_j, x, drop_path_rate_j, rngs_j or None) -> x, where
    params_j is one block's param subtree and rngs_j a dict of PRNG keys
    (already decorrelated per (tick, global block)).

    x: [B, L, D] — global over the auto (data) axes. B must be divisible by
    `microbatches` (default: = stages).

    With interleave=V, stage s holds V chunks of depth/(S*V) blocks: chunk v
    covers global blocks [(v*S+s)*dc, (v*S+s+1)*dc). A microbatch traverses
    the stage ring V times (the wrap S-1 -> 0 rides the same ppermute ring);
    per-tick work is 1/V of a GPipe stage, so the fill/drain bubble drops
    from (S-1)/(M+S-1) to (S-1)/(V*M+S-1) of the step. Requires M >= S so a
    wrapped activation is always back at stage 0 before its next admission.
    """
    from jax.sharding import PartitionSpec as P

    S = int(stages)
    V = int(interleave) if interleave else 1
    M = int(microbatches) if microbatches else S
    lead = jax.tree.leaves(stacked)[0].shape
    if V > 1:
        # interleaved layout must be pre-shaped [V, S, dc, ...] (the model
        # stores it that way, sharded P(None, "stage", ...)): reshaping a
        # stage-sharded [depth, ...] stack here would trigger a per-step
        # all-to-all resharding of every trunk weight
        if len(lead) < 3 or lead[0] != V or lead[1] != S:
            raise ValueError(
                f"interleave={V}: stacked params must be [V, S, dc, ...] "
                f"(see to_interleaved); got leading shape {lead[:3]}")
        depth = V * S * lead[2]
    else:
        depth = lead[0]
    if S < 1 or V < 1 or depth % (S * V):
        raise ValueError(
            f"depth {depth} not divisible by stages*interleave {S}*{V}")
    if x.shape[0] % M:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by microbatches {M} "
            "(set parallelism.pipeline_microbatches to a divisor)")
    if V > 1 and M < S:
        raise ValueError(
            f"interleave {V} > 1 needs microbatches ({M}) >= stages ({S}) "
            "so wrapped activations arrive before re-admission")
    if stage_mesh_size() != S:
        raise ValueError(
            f"pipeline_stages={S} but ambient mesh stage axis is "
            f"{stage_mesh_size()} — build the mesh with stage={S}")
    dc = depth // (S * V)  # blocks per (stage, chunk)
    rngs = rngs or {}

    # uniform [V, S, dc, ...] view; for V == 1 the reshape splits the
    # stage-sharded leading dim outermost — layout-preserving, no comms
    stacked_r = (stacked if V > 1 else jax.tree.map(
        lambda a: a.reshape(1, S, dc, *a.shape[1:]), stacked))
    dpr_r = jnp.asarray(dpr).reshape(V, S, dc)

    def body(stacked_l, dpr_l, x_full, rng_dict):
        # local shapes: stacked_l [V, 1, dc, ...], dpr_l [V, 1, dc]
        stage = jax.lax.axis_index(AXIS_STAGE)
        mb = x_full.shape[0] // M
        xs = x_full.reshape(M, mb, *x_full.shape[1:])

        def chunk_fn(v, x, t):
            """Apply this stage's chunk v (static) at tick t."""
            for j in range(dc):
                p_j = jax.tree.map(lambda a, j=j: a[v, 0, j], stacked_l)
                g = (v * S + stage) * dc + j  # global block index
                r = {k: jax.random.fold_in(jax.random.fold_in(kk, t), g)
                     for k, kk in rng_dict.items()} or None
                x = block_fn(p_j, x, dpr_l[v, 0, j], r)
            return x

        T = V * M + S - 1
        varying = lambda a: jax.lax.pcast(a, (AXIS_STAGE,), to="varying")
        out0 = varying(jnp.zeros_like(xs))
        y0 = varying(jnp.zeros_like(xs[0]))
        # stage-0 wait buffer for wrapped activations (rounds 1..V-1)
        buf0 = varying(jnp.zeros_like(xs)) if V > 1 else None

        def tick(carry, t):
            y_prev, out, buf = carry
            # q: admission tick (at stage 0) of the work this stage runs
            # now; v = q // M is its round, m = q % M its microbatch
            q = t - stage
            v = jnp.clip(q // M, 0, V - 1)
            m = jnp.clip(q, 0, V * M - 1) % M

            if V > 1:
                # stage 0 first banks the incoming wrap (work admitted at
                # q_in = t - S, computed by stage S-1 last tick) — M >= S
                # guarantees it lands before its round-(v+1) admission
                q_in = t - S
                bank = jnp.logical_and(
                    stage == 0,
                    jnp.logical_and(q_in >= 0, q_in < (V - 1) * M))
                bm = jnp.clip(q_in, 0, V * M - 1) % M
                cur = jax.lax.dynamic_index_in_dim(buf, bm, 0,
                                                   keepdims=False)
                buf = jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(bank, y_prev, cur), bm, 0)

            fresh = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(q, 0, M - 1), 0, keepdims=False)
            if V > 1:
                waited = jax.lax.dynamic_index_in_dim(buf, m, 0,
                                                      keepdims=False)
                feed = jnp.where(q < M, fresh, waited)
            else:
                feed = fresh
            x_in = jnp.where(stage == 0, feed, y_prev)

            if V > 1:
                y = jax.lax.switch(
                    v, [lambda xx, tt, vv=vv: chunk_fn(vv, xx, tt)
                        for vv in range(V)], x_in, t)
            else:
                y = chunk_fn(0, x_in, t)

            # last stage finishing round V-1 writes the microbatch output
            widx = t - (S - 1) - (V - 1) * M
            wc = jnp.clip(widx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out, wc, 0, keepdims=False)
            done = jnp.logical_and(stage == S - 1, widx >= 0)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(done, y, cur), wc, 0)
            # ring hop; with interleave the S-1 -> 0 wrap carries rounds
            perm = [(i, i + 1) for i in range(S - 1)]
            if V > 1:
                perm.append((S - 1, 0))
            y_next = jax.lax.ppermute(y, AXIS_STAGE, perm)
            return (y_next, out, buf), None

        (_, out, _), _ = jax.lax.scan(tick, (y0, out0, buf0),
                                      jnp.arange(T))
        # only the last stage holds real outputs; make them stage-invariant
        out = jax.lax.psum(out * (stage == S - 1), AXIS_STAGE)
        return out.reshape(x_full.shape)

    return jax.shard_map(
        body,
        in_specs=(P(None, AXIS_STAGE), P(None, AXIS_STAGE), P(), P()),
        out_specs=P(),
        axis_names={AXIS_STAGE},
    )(stacked_r, dpr_r, x, rngs)
