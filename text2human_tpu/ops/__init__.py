from text2human_tpu.ops.nn import (
    nearest_resize,
    bilinear_resize,
    nearest_downsample_mask,
    swish,
)
from text2human_tpu.ops.blocks import (
    AttnBlock,
    Downsample,
    GroupNorm,
    ResnetBlock,
    Upsample,
)
from text2human_tpu.ops.patch import patches_to_space, space_to_patches
from text2human_tpu.ops.quantize import (
    VectorQuantizer,
    VectorQuantizerSpatialTexture,
    VectorQuantizerTexture,
    nearest_codebook_indices,
)
