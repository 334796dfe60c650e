"""Composite modules wiring encoders, quantizers and decoders.

These mirror the reference's trainer-model component groupings so checkpoints
map 1:1 (SURVEY.md §5 checkpoint layouts):

  SegmVQVAE        ≙ VQSegmentationModel nets      (models/vqgan_model.py:169)
  TextureVQGAN     ≙ VQImageSegmTextureModel nets  (models/vqgan_model.py:389)
  HierarchyVQ      ≙ HierarchyVQSpatialTextureAwareModel nets
                                                   (models/hierarchy_vqgan_model.py:19)
  IndexPredictionNet ≙ guidance UNet + MultiHeadFCNHead
                                                   (models/hierarchy_inference_model.py:92-103)
  ParsingGenerator ≙ ShapeAttrEmbedding + ShapeUNet + FCNHead
                                                   (models/parsing_gen_model.py:28-43)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.config import (
    FCNHeadConfig,
    QuantizerConfig,
    ShapeAttrConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.models.fcn import FCNHead, MultiHeadFCNHead
from text2human_tpu.models.shape_attr import ShapeAttrEmbedding
from text2human_tpu.models.unet import ShapeUNet, UNet
from text2human_tpu.models.vqgan import Decoder, DecoderRes, Encoder
from text2human_tpu.ops.nn import one_hot_segm
from text2human_tpu.ops.quantize import (
    QuantOut,
    VectorQuantizer,
    VectorQuantizerSpatialTexture,
    VectorQuantizerTexture,
)


class SegmVQVAE(nn.Module):
    """Parsing-map tokenizer: VQVAE over 24-class one-hot masks."""

    cfg: VQGANConfig
    quant: QuantizerConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(self.quant.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1))
        self.quantize = VectorQuantizer(
            n_embed=self.quant.n_embed,
            embed_dim=self.quant.embed_dim,
            beta=self.quant.beta,
            legacy=self.quant.legacy,
        )

    def encode(self, x: jax.Array) -> QuantOut:
        h = self.encoder(x)
        h = self.quant_conv(h)
        return self.quantize(h)

    def decode(self, quant: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(quant))

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        return self.decode(self.quantize.get_codebook_entry(indices))

    def tokenize(self, segm: jax.Array) -> jax.Array:
        """[N,H,W] int parsing map -> [N, h, w] codebook indices
        (reference models/sample_model.py:330-340)."""
        x = one_hot_segm(segm, self.cfg.in_channels)
        return self.encode(x).indices

    def __call__(self, segm_one_hot: jax.Array) -> Tuple[jax.Array, jax.Array]:
        out = self.encode(segm_one_hot)
        rec = self.decode(out.z_q)
        return rec, out.loss


class TextureVQGAN(nn.Module):
    """Top-level texture-aware VQGAN (18 per-texture codebooks)."""

    cfg: VQGANConfig
    quant: QuantizerConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(self.quant.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1))
        self.quantize = VectorQuantizerTexture(
            n_embed=self.quant.n_embed,
            embed_dim=self.quant.embed_dim,
            num_codebooks=self.quant.num_codebooks,
            beta=self.quant.beta,
            legacy=self.quant.legacy,
        )

    def encode(self, x: jax.Array, texture_mask: Optional[jax.Array]) -> QuantOut:
        h = self.encoder(x)
        h = self.quant_conv(h)
        if texture_mask is None:
            # plain image VQGAN (reference VQImageModel): a single shared
            # codebook, i.e. texture id 0 everywhere
            texture_mask = jnp.zeros(x.shape[:3], jnp.float32)
        return self.quantize(h, texture_mask)

    def decode(self, quant: jax.Array, *, return_pre_out: bool = False):
        return self.decoder(
            self.post_quant_conv(quant), return_pre_out=return_pre_out
        )

    def decode_indices(self, indices: jax.Array, texture_mask: jax.Array) -> jax.Array:
        quant = self.quantize.get_codebook_entry(indices, texture_mask)
        return self.decode(quant)

    def quantized_feature(self, indices: jax.Array, texture_mask: jax.Array) -> jax.Array:
        """Codebook entries -> post_quant_conv feature (the sampler pipeline's
        top_quant, reference sample_model.py:225-230)."""
        quant = self.quantize.get_codebook_entry(indices, texture_mask)
        return self.post_quant_conv(quant)

    def __call__(
        self,
        x: jax.Array,
        texture_mask: jax.Array,
        *,
        return_pre_out: bool = False,
    ):
        out = self.encode(x, texture_mask)
        if return_pre_out:
            rec, pre = self.decode(out.z_q, return_pre_out=True)
            return rec, out.loss, pre
        rec = self.decode(out.z_q)
        return rec, out.loss


class HierarchyVQ(nn.Module):
    """Bottom-level hierarchy VQGAN on top of a frozen top-level VQGAN.

    The frozen top encode path is wrapped in stop_gradient; which parameters
    actually train is decided by the optimizer mask in the trainer
    (≙ reference configure_optimizers, hierarchy_vqgan_model.py:127-156).
    """

    top_cfg: VQGANConfig
    top_quant: QuantizerConfig
    bot_cfg: VQGANConfig
    bot_quant: QuantizerConfig

    def setup(self):
        self.top_encoder = Encoder(self.top_cfg)
        self.decoder = Decoder(self.top_cfg)
        self.top_quant_conv = nn.Conv(self.top_quant.embed_dim, (1, 1))
        self.top_post_quant_conv = nn.Conv(self.top_cfg.z_channels, (1, 1))
        self.top_quantize = VectorQuantizerTexture(
            n_embed=self.top_quant.n_embed,
            embed_dim=self.top_quant.embed_dim,
            num_codebooks=self.top_quant.num_codebooks,
            beta=self.top_quant.beta,
            legacy=self.top_quant.legacy,
        )

        self.bot_encoder = Encoder(self.bot_cfg)
        self.bot_decoder_res = DecoderRes(self.bot_cfg)
        self.bot_quant_conv = nn.Conv(self.bot_quant.embed_dim, (1, 1))
        self.bot_post_quant_conv = nn.Conv(self.bot_cfg.z_channels, (1, 1))
        self.bot_quantize = VectorQuantizerSpatialTexture(
            n_embed=self.bot_quant.n_embed,
            embed_dim=self.bot_quant.embed_dim,
            spatial_size=self.bot_quant.spatial_size,
            num_codebooks=self.bot_quant.num_codebooks,
            beta=self.bot_quant.beta,
            legacy=self.bot_quant.legacy,
        )

    def top_encode(self, x: jax.Array, texture_mask: jax.Array) -> jax.Array:
        """Frozen top path -> post-quant feature (hierarchy_vqgan_model.py:215-220)."""
        h = self.top_encoder(x)
        h = self.top_quant_conv(h)
        quant = self.top_quantize(h, texture_mask).z_q
        quant = self.top_post_quant_conv(quant)
        return jax.lax.stop_gradient(quant)

    def bot_encode(
        self, x: jax.Array, texture_mask: jax.Array
    ) -> Tuple[jax.Array, jax.Array, QuantOut]:
        h = self.bot_encoder(x)
        h = self.bot_quant_conv(h)
        out = self.bot_quantize(h, texture_mask)
        quant = self.bot_post_quant_conv(out.z_q)
        return self.bot_decoder_res(quant), out.loss, out

    def bot_indices(self, x: jax.Array, texture_mask: jax.Array) -> QuantOut:
        """GT bottom indices for index-prediction training
        (hierarchy_inference_model.py:187-192)."""
        h = self.bot_encoder(x)
        h = self.bot_quant_conv(h)
        return self.bot_quantize(h, texture_mask)

    def top_indices(self, x: jax.Array, texture_mask: jax.Array) -> QuantOut:
        """Frozen top path -> quantizer output (indices + codebook ids), the
        integer form of ``top_encode`` for token-cache builds: the post-quant
        feature is reconstructible from (indices, cb_ids) via
        ``top_feature_from_indices``."""
        h = self.top_encoder(x)
        h = self.top_quant_conv(h)
        return self.top_quantize(h, texture_mask)

    def top_feature_from_indices(
        self, top_indices: jax.Array, texture_mask: jax.Array
    ) -> jax.Array:
        """Sampled top indices -> post-quant top feature
        (reference sample_model.py:225-230)."""
        quant = self.top_quantize.get_codebook_entry(top_indices, texture_mask)
        return self.top_post_quant_conv(quant)

    def decode_from_bot_indices(
        self, top_quant: jax.Array, bot_indices: jax.Array, texture_mask: jax.Array
    ) -> jax.Array:
        """top post-quant feature + bottom indices -> image
        (reference sample_model.py:235-243)."""
        quant_b = self.bot_quantize.get_codebook_entry(bot_indices, texture_mask)
        quant_b = self.bot_post_quant_conv(quant_b)
        bot_h = self.bot_decoder_res(quant_b)
        return self.decoder(top_quant, bot_h)

    def __call__(
        self,
        x: jax.Array,
        texture_mask: jax.Array,
        *,
        return_pre_out: bool = False,
    ):
        quant_top = self.top_encode(x, texture_mask)
        return self._decode_with_bot(quant_top, x, texture_mask, return_pre_out)

    def forward_with_top(
        self,
        x: jax.Array,
        texture_mask: jax.Array,
        top_local: jax.Array,
        top_cb: jax.Array,
        *,
        return_pre_out: bool = False,
    ):
        """``__call__`` with the frozen top path replaced by cached integer
        indices (data/token_cache.py hybrid hierarchy cache): a codebook
        gather + the 1x1 post-quant conv reproduce ``top_encode``'s feature
        exactly (forward z_q values ARE codebook rows), skipping the frozen
        full-resolution top encoder every training step."""
        quant_top = jax.lax.stop_gradient(
            self.top_feature_from_indices(top_local, top_cb.astype(jnp.float32))
        )
        return self._decode_with_bot(quant_top, x, texture_mask, return_pre_out)

    def _decode_with_bot(self, quant_top, x, texture_mask, return_pre_out):
        bot_h, emb_loss, _ = self.bot_encode(x, texture_mask)
        if return_pre_out:
            dec, pre = self.decoder(quant_top, bot_h, return_pre_out=True)
            return dec, emb_loss, pre
        dec = self.decoder(quant_top, bot_h)
        return dec, emb_loss


class IndexPredictionNet(nn.Module):
    """Guidance UNet + 18-head FCN predicting bottom indices from top features."""

    unet_cfg: UNetConfig
    fcn_cfg: FCNHeadConfig
    train: bool = False

    @nn.compact
    def __call__(self, feature_top: jax.Array) -> jax.Array:
        feats = UNet(self.unet_cfg, train=self.train, name="guidance_encoder")(
            feature_top
        )
        logits = MultiHeadFCNHead(self.fcn_cfg, train=self.train, name="index_decoder")(
            feats
        )
        return logits  # [N, H, W, 18, 512]


class ParsingGenerator(nn.Module):
    """Stage I: (densepose, shape attrs) -> 24-class parsing logits."""

    attr_cfg: ShapeAttrConfig
    unet_cfg: UNetConfig
    fcn_cfg: FCNHeadConfig
    train: bool = False

    @nn.compact
    def __call__(self, pose: jax.Array, attr: jax.Array) -> jax.Array:
        emb = ShapeAttrEmbedding(self.attr_cfg, name="embedder")(attr)
        feats = ShapeUNet(self.unet_cfg, train=self.train, name="encoder")(pose, emb)
        logits = FCNHead(self.fcn_cfg, train=self.train, name="decoder")(feats)
        return logits  # [N, H, W, 24]
