from text2human_tpu.models.vqgan import (
    Decoder,
    DecoderRes,
    Discriminator,
    Encoder,
)
from text2human_tpu.models.transformer import TransformerMultiHead
from text2human_tpu.models.unet import ShapeUNet, UNet
from text2human_tpu.models.fcn import FCNHead, MultiHeadFCNHead
from text2human_tpu.models.shape_attr import ShapeAttrEmbedding
