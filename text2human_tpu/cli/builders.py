"""Construct trainers/pipelines from YAML option dicts.

Replaces the reference's glob-scan model registry
(models/__init__.py:21-42 ``create_model``): the YAML ``model_type`` strings
are kept identical so reference configs drop in unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from text2human_tpu import config as C
from text2human_tpu.config import (
    FCNHeadConfig,
    QuantizerConfig,
    ShapeAttrConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.trainers.gan import GANTrainConfig
from text2human_tpu.trainers.hierarchy import HierarchyVQGANTrainer
from text2human_tpu.trainers.index_pred import IndexPredTrainer, IndexPredTrainConfig
from text2human_tpu.trainers.parsing_gen import ParsingGenTrainer, ParsingGenTrainConfig
from text2human_tpu.trainers.sampler import SamplerTrainConfig, SamplerTrainer
from text2human_tpu.trainers.segm_tokenizer import (
    SegmTokenizerConfig,
    SegmTokenizerTrainer,
)
from text2human_tpu.trainers.top_vqgan import TopVQGANTrainer


def _get(opt: Dict[str, Any], key: str, default):
    """Default only on missing/None — 0 and 0.0 are meaningful YAML values
    (e.g. disc_start_step: 0, dropout: 0.0); ``or``-defaults would swallow
    them."""
    v = opt.get(key)
    return default if v is None else v


def vqgan_cfg(opt: Dict[str, Any], prefix: str = "", remat: bool = False) -> VQGANConfig:
    """Map reference YAML keys (configs/vqvae_top.yml:19-31 style) to VQGANConfig."""

    def g(key, default=None):
        v = opt.get(f"{prefix}{key}")
        return default if v is None else v

    return VQGANConfig(
        remat=remat,
        compute_dtype=(
            opt.get(f"{prefix}compute_dtype")
            or _get(opt, "compute_dtype", "float32")
        ),
        ch=g("ch", 128),
        ch_mult=tuple(g("ch_mult", (1, 1, 2, 2, 4))),
        num_res_blocks=g("num_res_blocks", 2),
        attn_resolutions=tuple(g("attn_resolutions", (32,))),
        in_channels=g("in_channels", 3),
        out_ch=g("out_ch", 3),
        resolution=g("resolution", 512),
        z_channels=g("z_channels", 256),
        embed_dim=opt.get(f"{prefix}embed_dim") or _get(opt, "embed_dim", 256),
        double_z=bool(g("double_z", False)),
        dropout=g("dropout", 0.0),
    )


def transformer_cfg(opt: Dict[str, Any]) -> TransformerConfig:
    return TransformerConfig(
        codebook_size=_get(opt, "codebook_size", 18432),
        segm_codebook_size=_get(opt, "segm_codebook_size", 1024),
        texture_codebook_size=_get(opt, "texture_codebook_size", 18),
        n_emb=_get(opt, "bert_n_emb", 512),
        n_layers=_get(opt, "bert_n_layers", 24),
        n_head=_get(opt, "bert_n_head", 8),
        block_size=_get(opt, "block_size", 512),
        latent_shape=tuple(_get(opt, "latent_shape", (32, 16))),
        embd_pdrop=_get(opt, "embd_pdrop", 0.0),
        resid_pdrop=_get(opt, "resid_pdrop", 0.0),
        attn_pdrop=_get(opt, "attn_pdrop", 0.0),
        num_output_heads=_get(opt, "num_head", 18),
        # 'absorbing' (every reference config) or 'autoregressive' (the
        # causal mode: next-token loss + left-to-right decode)
        sampler=_get(opt, "sampler", "absorbing"),
    )


def gan_cfg(opt: Dict[str, Any]) -> GANTrainConfig:
    return GANTrainConfig(
        lr=_get(opt, "lr", 1e-4),
        perceptual_weight=_get(opt, "perceptual_weight", 1.0),
        disc_start_step=_get(opt, "disc_start_step", 30001),
        disc_weight_max=_get(opt, "disc_weight_max", 1.0),
        diff_aug=bool(opt.get("diff_aug", True)),
        adaptive_weight=bool(_get(opt, "adaptive_weight", True)),
    )


def _unet_cfg_opt(opt, in_key, in_default, prefix, attr_embedding=0):
    """UNetConfig with optional debug-size overrides ({prefix}unet_base_channels /
    {prefix}unet_num_stages)."""
    num_stages = opt.get(f"{prefix}unet_num_stages") or 5
    return UNetConfig(
        in_channels=opt.get(in_key) or in_default,
        base_channels=opt.get(f"{prefix}unet_base_channels") or 64,
        num_stages=num_stages,
        attr_embedding=attr_embedding,
        enc_num_convs=(2,) * num_stages,
        dec_num_convs=(2,) * (num_stages - 1),
    )


def resolve_lpips_vars(opt: Dict[str, Any]) -> Optional[Any]:
    """Pretrained LPIPS weights for the GAN trainers.

    The reference always trains against pretrained lpips VGG weights
    (models/vqgan_model.py:252); silently falling back to a random-init
    perceptual tower would corrupt a full-size parity run, so non-debug
    configs must either point ``lpips_path`` at converted weights or opt in
    explicitly with ``allow_random_lpips: true``.
    """
    path = opt.get("lpips_path")
    if path:
        from text2human_tpu.losses.perceptual import load_lpips_vars

        return load_lpips_vars(path)
    if opt.get("debug") or opt.get("allow_random_lpips"):
        return None  # trainer falls back to random-init (smoke runs only)
    raise ValueError(
        "GAN training needs pretrained LPIPS weights: set 'lpips_path' to a "
        "converted VGG16+lin checkpoint (.pth or .npz), or acknowledge a "
        "random-init perceptual loss with 'allow_random_lpips: true' "
        "(reference models/vqgan_model.py:252 always uses lpips VGG weights)"
    )


def _discriminator(opt: Dict[str, Any]):
    """PatchGAN from the YAML's ndf/disc_layers keys
    (reference configs/vqvae_top.yml:33-38)."""
    from text2human_tpu.models.vqgan import Discriminator

    return Discriminator(
        ndf=_get(opt, "ndf", 64), n_layers=_get(opt, "disc_layers", 3)
    )


def build_trainer(opt: Dict[str, Any], lpips_vars: Optional[Any] = None):
    """model_type string -> trainer instance (≙ create_model)."""
    model_type = opt["model_type"]

    if model_type == "VQSegmentationModel":
        return SegmTokenizerTrainer(
            vqgan_cfg(opt),
            QuantizerConfig(
                n_embed=_get(opt, "n_embed", 1024),
                embed_dim=_get(opt, "embed_dim", 32),
            ),
            SegmTokenizerConfig(
                lr=_get(opt, "lr", 4.5e-5),
                num_segm_classes=_get(opt, "num_segm_classes", 24),
            ),
        )

    if model_type in ("VQImageModel", "VQImageSegmTextureModel"):
        if lpips_vars is None:
            lpips_vars = resolve_lpips_vars(opt)
        num_books = 18 if model_type == "VQImageSegmTextureModel" else 1
        return TopVQGANTrainer(
            vqgan_cfg(opt, remat=bool(_get(opt, "remat", True))),
            QuantizerConfig(
                n_embed=_get(opt, "n_embed", 1024),
                embed_dim=_get(opt, "embed_dim", 256),
                num_codebooks=num_books,
            ),
            gan_cfg(opt),
            lpips_vars=lpips_vars,
            disc=_discriminator(opt),
        )

    if model_type == "HierarchyVQSpatialTextureAwareModel":
        if lpips_vars is None:
            lpips_vars = resolve_lpips_vars(opt)
        top_cfg = vqgan_cfg(opt, "top_", remat=bool(_get(opt, "remat", True)))
        return HierarchyVQGANTrainer(
            top_cfg,
            QuantizerConfig(
                # honor the YAML's top codebook size (1024 in every released
                # config; debug geometries shrink it)
                n_embed=_get(opt, "n_embed", 1024),
                embed_dim=_get(opt, "embed_dim", 256), num_codebooks=18
            ),
            vqgan_cfg(opt, "bot_", remat=bool(_get(opt, "remat", True))),
            QuantizerConfig(
                n_embed=_get(opt, "bot_n_embed", 512),
                embed_dim=_get(opt, "embed_dim", 256),
                num_codebooks=18,
                spatial_size=_get(opt, "codebook_spatial_size", 2),
            ),
            gan_cfg(opt),
            fix_decoder=bool(opt.get("fix_decoder")),
            lpips_vars=lpips_vars,
            disc=_discriminator(opt),
            sample_shape=(1, top_cfg.resolution, top_cfg.resolution // 2, 3),
        )

    if model_type == "TransformerTextureAwareModel":
        return SamplerTrainer(
            transformer_cfg(opt),
            vqgan_cfg(opt, "img_"),
            QuantizerConfig(
                n_embed=_get(opt, "img_n_embed", 1024),
                embed_dim=_get(opt, "img_embed_dim", 256),
                num_codebooks=18,
            ),
            vqgan_cfg(opt, "segm_"),
            QuantizerConfig(
                n_embed=_get(opt, "segm_n_embed", 1024),
                embed_dim=_get(opt, "segm_embed_dim", 32),
            ),
            SamplerTrainConfig(
                lr=_get(opt, "lr", 1e-4),
                weight_decay=_get(opt, "weight_decay", 0.0),
                loss_type=_get(opt, "loss_type", "reweighted_elbo"),
                mask_schedule=_get(opt, "mask_schedule", "random"),
                sample_steps=_get(opt, "sample_steps", 256),
                time_sampling=_get(opt, "time_sampling", "uniform"),
            ),
        )

    if model_type == "VQGANTextureAwareSpatialHierarchyInferenceModel":
        return IndexPredTrainer(
            _unet_cfg_opt(opt, "encoder_in_channels", 256, ""),
            FCNHeadConfig(
                in_channels=_get(opt, "fc_in_channels", 64),
                channels=_get(opt, "fc_channels", 64),
                num_classes=_get(opt, "fc_num_classes", 512),
                num_convs=_get(opt, "fc_num_convs", 1),
                concat_input=bool(opt.get("fc_concat_input")),
                dropout_ratio=_get(opt, "fc_dropout_ratio", 0.1),
                in_index=_get(opt, "fc_in_index", 4),
                align_corners=bool(opt.get("fc_align_corners")),
                input_transform=opt.get("fc_input_transform"),
                num_heads=18,
            ),
            vqgan_cfg(opt, "top_"),
            QuantizerConfig(
                # honor the YAML's top codebook size (1024 in every released
                # config; debug geometries shrink it)
                n_embed=_get(opt, "n_embed", 1024),
                embed_dim=_get(opt, "embed_dim", 256), num_codebooks=18
            ),
            vqgan_cfg(opt, "bot_"),
            QuantizerConfig(
                n_embed=_get(opt, "bot_n_embed", 512),
                embed_dim=_get(opt, "embed_dim", 256),
                num_codebooks=18,
                spatial_size=_get(opt, "codebook_spatial_size", 2),
            ),
            IndexPredTrainConfig(
                lr=_get(opt, "lr", 1e-4),
                weight_decay=_get(opt, "weight_decay", 0.0),
                optimizer=_get(opt, "optimizer", "Adam"),
                momentum=_get(opt, "momentum", 0.9),
            ),
        )

    if model_type == "ParsingGenModel":
        return ParsingGenTrainer(
            ShapeAttrConfig(
                dim=_get(opt, "embedder_dim", 8),
                out_dim=_get(opt, "embedder_out_dim", 128),
                cls_num_list=tuple(_get(opt, "attr_class_num", C.PARSING_GEN_ATTR.cls_num_list)),
            ),
            # same debug-size overrides (unet_base_channels/unet_num_stages)
            # as the index-pred job, so tiny trained checkpoints stay
            # geometry-compatible with the debug sample pipeline
            _unet_cfg_opt(
                opt, "encoder_in_channels", 1, "",
                attr_embedding=_get(opt, "embedder_out_dim", 128),
            ),
            FCNHeadConfig(
                in_channels=_get(opt, "fc_in_channels", 64),
                channels=_get(opt, "fc_channels", 64),
                num_classes=_get(opt, "fc_num_classes", 24),
                num_convs=_get(opt, "fc_num_convs", 1),
                concat_input=bool(opt.get("fc_concat_input")),
                dropout_ratio=_get(opt, "fc_dropout_ratio", 0.1),
                in_index=_get(opt, "fc_in_index", 4),
                align_corners=bool(opt.get("fc_align_corners")),
                input_transform=opt.get("fc_input_transform"),
            ),
            ParsingGenTrainConfig(
                lr=_get(opt, "lr", 1e-4),
                weight_decay=_get(opt, "weight_decay", 0.0),
            ),
        )

    raise ValueError(f"Unknown model_type {model_type}")


def build_pipeline(opt: Dict[str, Any]):
    """Sample* model_type -> SamplePipeline (≙ sample_model.py composites)."""
    from text2human_tpu.pipelines.sample import PipelineConfigs, SamplePipeline

    if opt["model_type"] not in ("SampleFromParsingModel", "SampleFromPoseModel"):
        raise ValueError(
            f"Unknown sample model_type {opt['model_type']!r}; expected "
            "SampleFromParsingModel or SampleFromPoseModel"
        )
    with_pose = opt["model_type"] == "SampleFromPoseModel"
    cfgs = PipelineConfigs(
        top=vqgan_cfg(opt, "top_"),
        top_quant=QuantizerConfig(
            n_embed=_get(opt, "n_embed", 1024),
            embed_dim=_get(opt, "embed_dim", 256), num_codebooks=18
        ),
        bot=vqgan_cfg(opt, "bot_"),
        bot_quant=QuantizerConfig(
            n_embed=_get(opt, "bot_n_embed", 512),
            embed_dim=_get(opt, "embed_dim", 256),
            num_codebooks=18,
            spatial_size=_get(opt, "bot_codebook_spatial_size", 2),
        ),
        segm=vqgan_cfg(opt, "segm_"),
        segm_quant=QuantizerConfig(
            n_embed=_get(opt, "segm_n_embed", 1024),
            embed_dim=_get(opt, "segm_embed_dim", 32),
        ),
        transformer=transformer_cfg(opt),
        index_unet=_unet_cfg_opt(opt, "index_pred_encoder_in_channels", 256, "index_pred_"),
        index_fcn=FCNHeadConfig(
            in_channels=_get(opt, "index_pred_fc_in_channels", 64),
            channels=_get(opt, "index_pred_fc_channels", 64),
            num_classes=_get(opt, "index_pred_fc_num_classes", 512),
            num_convs=_get(opt, "index_pred_fc_num_convs", 1),
            concat_input=bool(opt.get("index_pred_fc_concat_input")),
            dropout_ratio=_get(opt, "index_pred_fc_dropout_ratio", 0.1),
            in_index=_get(opt, "index_pred_fc_in_index", 4),
            align_corners=bool(opt.get("index_pred_fc_align_corners")),
            input_transform=opt.get("index_pred_fc_input_transform"),
            num_heads=18,
        ),
        shape_attr=ShapeAttrConfig(
            dim=_get(opt, "shape_embedder_dim", 8),
            out_dim=_get(opt, "shape_embedder_out_dim", 128),
            cls_num_list=tuple(
                _get(opt, "shape_attr_class_num", C.PARSING_GEN_ATTR.cls_num_list)
            ),
        ) if with_pose else None,
        parsing_unet=_unet_cfg_opt(
            opt, "shape_encoder_in_channels", 1, "shape_",
            attr_embedding=_get(opt, "shape_embedder_out_dim", 128),
        ) if with_pose else None,
        parsing_fcn=FCNHeadConfig(
            in_channels=_get(opt, "shape_fc_in_channels", 64),
            channels=_get(opt, "shape_fc_channels", 64),
            num_classes=_get(opt, "shape_fc_num_classes", 24),
            num_convs=_get(opt, "shape_fc_num_convs", 1),
            concat_input=bool(opt.get("shape_fc_concat_input")),
            dropout_ratio=_get(opt, "shape_fc_dropout_ratio", 0.1),
            in_index=_get(opt, "shape_fc_in_index", 4),
            align_corners=bool(opt.get("shape_fc_align_corners")),
            input_transform=opt.get("shape_fc_input_transform"),
        ) if with_pose else None,
        sample_steps=_get(opt, "sample_steps", 256),
        num_segm_classes=_get(opt, "segm_num_segm_classes", 24),
    )
    conv_dtype = _get(opt, "conv_dtype", "float32")
    if conv_dtype != "float32":
        from text2human_tpu.pipelines.sample import with_conv_dtype

        cfgs = with_conv_dtype(cfgs, conv_dtype)
    return SamplePipeline(
        cfgs,
        # 'absorbing' (reference schedule, default) | 'maskgit' (fast decode,
        # documented divergence — diffusion/absorbing.py:sample_maskgit)
        decode_mode=_get(opt, "decode_mode", "absorbing"),
    )
