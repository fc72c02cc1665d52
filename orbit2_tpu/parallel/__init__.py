from orbit2_tpu.parallel.mesh import (
    AXIS_EXPERT,
    AXIS_FSDP,
    AXIS_REPLICA,
    AXIS_SEQ,
    AXIS_STAGE,
    AXIS_TENSOR,
    BATCH_AXES,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    replicated,
)
from orbit2_tpu.parallel.pipeline import (
    pipeline_blocks,
    stack_block_params,
    unstack_block_params,
)
from orbit2_tpu.parallel.sharding import (
    param_shardings,
    param_specs,
    shard_params,
    spec_for,
)
