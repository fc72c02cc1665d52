from orbit2_tpu.models.components.blocks import (
    Attention,
    Block,
    DropPath,
    LayerScale,
    Mlp,
    VariableMappingAttention,
)
