"""Sequence-parallel attention: Pallas flash kernel under shard_map.

The GSPMD seq path (token-sharding constraints in the model) works with the
XLA einsum attention but cannot partition a pallas_call — GSPMD would gather
the full sequence onto every device before the kernel. This wrapper keeps
the flash kernel AND the seq axis, with three interchangeable impls
(config `parallelism.seq_impl`):

  * "gather"  — q stays token-sharded, k/v all-gathered over the `seq` ICI
    ring; shard_map autodiff turns the gather into the matching
    reduce-scatter for dk/dv. Supports attention dropout.
  * "ring"    — ops/ring_attention.py: k/v chunks ppermute around the ring,
    K/V memory O(N/seq) per device.
  * "ulysses" — DeepSpeed-Ulysses: all-to-all swaps the token shard for a
    head shard, every device runs the kernel over the FULL sequence for
    H/seq of its heads, then swaps back. 4 all-to-alls of local-shard size;
    dropout-capable; needs local heads % seq == 0.

Memory per device: O(N_local * N_full) scores never materialize (flash), and
k/v are the only gathered tensors — 2 * N * H * D * 2 bytes, e.g. 4.3 GB for
the full-globe 260k-token case at D=1024 split over 8 seq shards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from orbit2_tpu.parallel.mesh import AXIS_SEQ, BATCH_AXES
from orbit2_tpu.ops.flash_attention import flash_attention


def seq_mesh_active() -> bool:
    """True when the traced context has a mesh with a non-trivial seq axis."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return (mesh is not None and AXIS_SEQ in (mesh.axis_names or ())
                and mesh.shape[AXIS_SEQ] > 1)
    except Exception:
        return False


def data_mesh_active() -> bool:
    """True when ANY mesh axis is >1 (GSPMD context): a bare pallas_call
    would be unpartitionable and force full gathers."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return mesh is not None and any(
            int(s) > 1 for s in dict(mesh.shape).values())
    except Exception:
        return False


def batch_flash_attention(q, k, v, sm_scale: Optional[float] = None,
                          dropout_rate: float = 0.0, dropout_rng=None):
    """Flash attention under a dp/fsdp/tp mesh WITHOUT a seq axis: shard_map
    over the batch axes (and heads over tensor when divisible) so each device
    runs the pallas kernel on its local shard — no collectives at all.
    Returns None when shapes don't divide the mesh (caller falls back to the
    GSPMD-partitionable XLA attention)."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from orbit2_tpu.parallel.mesh import AXIS_FSDP, AXIS_REPLICA, AXIS_TENSOR
    from orbit2_tpu.ops.flash_attention import flash_attention

    assert dropout_rate == 0.0 or dropout_rng is not None, \
        "dropout needs a PRNG key"
    mesh = jax.sharding.get_abstract_mesh()
    shape = dict(mesh.shape)
    dp = shape.get(AXIS_REPLICA, 1) * shape.get(AXIS_FSDP, 1)
    tp = shape.get(AXIS_TENSOR, 1)
    if q.shape[0] % dp or (tp > 1 and q.shape[2] % tp):
        return None
    head_axis = AXIS_TENSOR if tp > 1 else None
    spec = P(BATCH_AXES, None, head_axis, None)

    if dropout_rate > 0.0:
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(spec, spec, spec, P()),
                           out_specs=spec, check_vma=False)
        def inner_drop(qb, kb, vb, rng):
            # decorrelate masks across every sharded axis
            for ax in (AXIS_REPLICA, AXIS_FSDP, AXIS_TENSOR):
                if shape.get(ax, 1) > 1:
                    rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
            return flash_attention(qb, kb, vb, sm_scale=sm_scale,
                                   dropout_rate=dropout_rate, dropout_rng=rng)

        return inner_drop(q, k, v, dropout_rng)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    def inner(qb, kb, vb):
        return flash_attention(qb, kb, vb, sm_scale=sm_scale)

    return inner(q, k, v)


_DEFAULT_IMPL = "gather"
SEQ_IMPLS = ("gather", "ring", "ulysses")


def set_seq_impl(impl: str) -> None:
    """Select the seq-parallel attention kernel ("gather" | "ring" |
    "ulysses"); set by the Trainer from config.parallelism.seq_impl."""
    global _DEFAULT_IMPL
    assert impl in SEQ_IMPLS, impl
    _DEFAULT_IMPL = impl


def seq_flash_attention(q, k, v, sm_scale: Optional[float] = None,
                        dropout_rate: float = 0.0, dropout_rng=None,
                        impl: Optional[str] = None):
    """q/k/v: [B, N, H, D] logically token-sharded over the seq axis.
    Must be called inside a mesh context whose seq axis size divides N.

    impl "gather" all-gathers k/v over the seq ring (supports attention
    dropout); "ring" ppermutes k/v chunks (ops/ring_attention.py) keeping
    K/V memory O(N/seq) — dropout falls back to gather; "ulysses"
    (DeepSpeed-Ulysses) all-to-alls tokens<->heads so each device attends
    the FULL sequence for H/seq of its local heads — comms are 4 all-to-alls
    of the local shard (vs gather's (seq-1)x K/V broadcast), dropout
    supported natively. Needs local heads divisible by the seq axis."""
    try:
        from jax import shard_map  # jax >= 0.6
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from orbit2_tpu.parallel.mesh import AXIS_TENSOR

    assert dropout_rate == 0.0 or dropout_rng is not None, \
        "dropout needs a PRNG key"
    impl = impl or _DEFAULT_IMPL
    mesh = jax.sharding.get_abstract_mesh()
    # heads ride the tensor axis (Megatron head split) when divisible
    tp = mesh.shape.get(AXIS_TENSOR, 1)
    head_axis = AXIS_TENSOR if (tp > 1 and q.shape[2] % tp == 0) else None
    spec = P(BATCH_AXES, AXIS_SEQ, head_axis, None)

    if impl == "ulysses":
        from orbit2_tpu.parallel.mesh import AXIS_FSDP, AXIS_REPLICA

        shape = dict(mesh.shape)
        s = shape[AXIS_SEQ]
        h_loc = q.shape[2] // tp if head_axis is not None else q.shape[2]
        if h_loc % s:
            raise ValueError(
                f"ulysses seq impl needs local heads ({h_loc}) divisible "
                f"by the seq axis ({s}); use gather/ring instead")

        def _a2a(t, split_axis, concat_axis):
            return jax.lax.all_to_all(t, AXIS_SEQ, split_axis=split_axis,
                                      concat_axis=concat_axis, tiled=True)

        def _uly(qb, kb, vb, rng):
            # [B, N/s, H_loc, D] -> [B, N, H_loc/s, D]: every device sees
            # the full sequence for its head subset
            qh, kh, vh = (_a2a(t, 2, 1) for t in (qb, kb, vb))
            if rng is not None:
                # fold the tensor axis ONLY when heads actually ride it —
                # with head_axis None the activations are replicated across
                # tensor and per-axis rngs would silently diverge them
                fold_axes = [AXIS_REPLICA, AXIS_FSDP, AXIS_SEQ]
                if head_axis is not None:
                    fold_axes.append(AXIS_TENSOR)
                for ax in fold_axes:
                    if shape.get(ax, 1) > 1:
                        rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
                o = flash_attention(qh, kh, vh, sm_scale=sm_scale,
                                    dropout_rate=dropout_rate,
                                    dropout_rng=rng)
            else:
                o = flash_attention(qh, kh, vh, sm_scale=sm_scale)
            return _a2a(o, 1, 2)  # back to token-sharded [B, N/s, H_loc, D]

        if dropout_rate > 0.0:
            @functools.partial(shard_map, mesh=mesh,
                               in_specs=(spec, spec, spec, P()),
                               out_specs=spec, check_vma=False)
            def inner_uly_drop(qb, kb, vb, rng):
                return _uly(qb, kb, vb, rng)

            return inner_uly_drop(q, k, v, dropout_rng)

        @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=spec, check_vma=False)
        def inner_uly(qb, kb, vb):
            return _uly(qb, kb, vb, None)

        return inner_uly(q, k, v)

    if impl == "ring" and dropout_rate == 0.0:
        from orbit2_tpu.ops.ring_attention import ring_flash_attention

        @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=spec, check_vma=False)
        def inner_ring(qb, kb, vb):
            return ring_flash_attention(qb, kb, vb, AXIS_SEQ,
                                        sm_scale=sm_scale)

        return inner_ring(q, k, v)

    # check_vma=False: the pallas_call's ShapeDtypeStruct outputs carry no
    # varying-mesh-axes annotation (jax 0.9 vma checking)
    if dropout_rate > 0.0:
        from orbit2_tpu.parallel.mesh import AXIS_FSDP, AXIS_REPLICA

        shape = dict(mesh.shape)

        # rng rides in_specs (replicated); each shard folds every SHARDED
        # axis index in so masks decorrelate across seq shards (local
        # q-block indices restart at 0), dp replicas (different samples),
        # and tp head groups (local bh indices restart at 0). The tensor
        # axis is folded only when heads actually ride it — replicated
        # activations must see identical masks.
        fold_axes = [AXIS_REPLICA, AXIS_FSDP, AXIS_SEQ]
        if head_axis is not None:
            fold_axes.append(AXIS_TENSOR)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(spec, spec, spec, P()),
                           out_specs=spec, check_vma=False)
        def inner_drop(qb, kb, vb, rng):
            for ax in fold_axes:
                if shape.get(ax, 1) > 1:
                    rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
            k_full = jax.lax.all_gather(kb, AXIS_SEQ, axis=1, tiled=True)
            v_full = jax.lax.all_gather(vb, AXIS_SEQ, axis=1, tiled=True)
            return flash_attention(qb, k_full, v_full, sm_scale=sm_scale,
                                   dropout_rate=dropout_rate,
                                   dropout_rng=rng)

        return inner_drop(q, k, v, dropout_rng)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    def inner(qb, kb, vb):
        k_full = jax.lax.all_gather(kb, AXIS_SEQ, axis=1, tiled=True)
        v_full = jax.lax.all_gather(vb, AXIS_SEQ, axis=1, tiled=True)
        return flash_attention(qb, k_full, v_full, sm_scale=sm_scale)

    return inner(q, k, v)
