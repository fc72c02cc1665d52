from orbit2_tpu.ops.attention import dot_product_attention, resolve_impl
from orbit2_tpu.ops.pixel_shuffle import pixel_shuffle_nchw, pixel_shuffle_nhwc
from orbit2_tpu.ops.pos_embed import (
    get_2d_sincos_pos_embed,
    interpolate_pos_embed_on_the_fly,
    interpolate_pos_embed_checkpoint,
)
