"""Device mesh construction.

One mesh replaces the reference's six NCCL process groups (seq, data, tensor,
data_seq_ort, fsdp, simple_ddp built by init_par_groups, reference
examples/intermediate_downscaling.py:161-262). Axis mapping:

  replica  — "simple_ddp": pure data parallelism, params replicated
  fsdp     — parameter-sharded data parallelism (ZeRO-3 / HYBRID_SHARD inner)
  tensor   — Megatron-style tensor parallelism
  seq      — sequence (token) parallelism; the reference stubs this axis
             (assert at intermediate_downscaling.py:165), here it is real.
  stage    — pipeline parallelism (parallel/pipeline.py); the reference has
             none (SURVEY §2.7 PP: absent). Outermost axis so stage->stage+1
             activation hops ride DCN between slices while fsdp/tensor
             collectives stay on ICI.

The rank layout matches the reference's arithmetic: tensor is the
fastest-varying axis, then fsdp, then replica (HYBRID_SHARD shards within a
node-group and replicates across, :610-613) — so ICI-heavy collectives
(tensor, fsdp) ride the innermost mesh dims.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_REPLICA = "replica"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"
AXIS_SEQ = "seq"
AXIS_STAGE = "stage"
AXIS_EXPERT = "expert"

# activations: batch is sharded over both data axes
BATCH_AXES = (AXIS_REPLICA, AXIS_FSDP)


def make_mesh(
    replica: int = 1,
    fsdp: int = 1,
    tensor: int = 1,
    seq: int = 1,
    stage: int = 1,
    expert: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    want = replica * fsdp * tensor * seq * stage * expert
    if want > len(devices):
        raise ValueError(
            f"mesh {stage}x{replica}x{fsdp}x{expert}x{seq}x{tensor}={want} > "
            f"{len(devices)} devices"
        )
    arr = np.asarray(devices[:want]).reshape(
        stage, replica, fsdp, expert, seq, tensor)
    return Mesh(arr, (AXIS_STAGE, AXIS_REPLICA, AXIS_FSDP, AXIS_EXPERT,
                      AXIS_SEQ, AXIS_TENSOR))


def mesh_from_config(parallelism, devices=None) -> Mesh:
    return make_mesh(
        replica=parallelism.simple_ddp,
        fsdp=parallelism.fsdp,
        tensor=parallelism.tensor_par,
        seq=parallelism.seq_par,
        stage=getattr(parallelism, "pipeline", 1),
        expert=getattr(parallelism, "expert_par", 1),
        devices=devices,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, C, H, W] batches: B over (replica, fsdp)."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
