"""Typed configuration system.

Replaces the reference's flat YAML -> NoneDict pipeline (utils/options.py:33,112)
with typed dataclasses plus shared network presets, while still accepting the
same YAML files for drop-in compatibility.  Missing keys read as ``None`` like
the reference's ``NoneDict`` (utils/options.py:105-110).
"""

from __future__ import annotations

import dataclasses
import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import yaml


class NoneDict(dict):
    """Dict returning None for missing keys (reference utils/options.py:105)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    if isinstance(opt, dict):
        return NoneDict(**{k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, list):
        return [dict_to_nonedict(v) for v in opt]
    return opt


def parse(opt_path: str, is_train: bool = True, root: Optional[str] = None) -> NoneDict:
    """Parse a YAML option file (reference utils/options.py:33-81).

    Derives the experiments/results path tree from ``name`` and applies the
    ``debug`` frequency overrides when the experiment name contains "debug".
    """
    with open(opt_path, "r") as f:
        opt = yaml.safe_load(f)

    opt["is_train"] = is_train
    if root is None:
        # T2H_ROOT reroots the experiments/results tree (tests point it at a
        # tmp dir so suite cleanup can never touch real training artifacts);
        # default is the package parent, like the reference's repo-root
        # `experiments/` convention (utils/options.py:56-79).
        root = os.environ.get("T2H_ROOT") or osp.abspath(
            osp.join(osp.dirname(osp.abspath(__file__)), osp.pardir)
        )
    opt["path"] = {"root": root}
    if is_train:
        experiments_root = osp.join(root, "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = osp.join(experiments_root, "visualization")
        if "debug" in opt["name"]:
            opt["debug"] = True
            opt["val_freq"] = 1
            opt["print_freq"] = 1
            opt["save_checkpoint_freq"] = 1
    else:
        results_root = osp.join(root, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = osp.join(results_root, "visualization")

    return dict_to_nonedict(opt)


def dict2str(opt: Dict[str, Any], indent_level: int = 1) -> str:
    """Pretty-print an option dict (reference utils/options.py:84-101)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":[\n"
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + k + ": " + str(v) + "\n"
    return msg


# ---------------------------------------------------------------------------
# Typed network configs.  The reference duplicates these dims across 7 YAMLs
# (e.g. the top-VQ block repeated in vqvae_bottom.yml:37-48, sampler.yml:25-37);
# here they are single-source presets.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VQGANConfig:
    """Taming-style encoder/decoder stack (reference models/archs/vqgan_arch.py:818,922)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 512  # height; width is resolution // 2 in this dataset
    z_channels: int = 256
    embed_dim: int = 256
    double_z: bool = False
    dropout: float = 0.0
    # rematerialize res/attn blocks during backward (training at 512x256
    # exceeds 16 GB HBM without it; inference paths leave it off)
    remat: bool = False
    # activation dtype for the conv stacks ("float32" | "bfloat16"); params,
    # GroupNorm statistics and attention softmax stay float32
    compute_dtype: str = "float32"

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def latent_resolution(self) -> int:
        return self.resolution // 2 ** (self.num_resolutions - 1)


@dataclass(frozen=True)
class QuantizerConfig:
    """Codebook geometry for the three quantizer variants
    (reference models/archs/vqgan_arch.py:12,142,329)."""

    n_embed: int = 1024
    embed_dim: int = 256
    beta: float = 0.25
    num_codebooks: int = 1  # 18 for texture-aware variants
    spatial_size: int = 1  # 2 for the bottom patch quantizer
    legacy: bool = True  # keep the reference's swapped-beta codebook loss

    @property
    def effective_dim(self) -> int:
        return self.embed_dim * self.spatial_size * self.spatial_size


@dataclass(frozen=True)
class DiscriminatorConfig:
    """PatchGAN discriminator (reference models/archs/vqgan_arch.py:1155)."""

    nc: int = 3
    ndf: int = 64
    n_layers: int = 3


@dataclass(frozen=True)
class TransformerConfig:
    """Multi-head absorbing-diffusion transformer
    (reference models/archs/transformer_arch.py:184; configs/sampler.yml:51-67)."""

    codebook_size: int = 18432
    segm_codebook_size: int = 1024
    texture_codebook_size: int = 18
    n_emb: int = 512
    n_layers: int = 24
    n_head: int = 8
    block_size: int = 512
    latent_shape: Tuple[int, int] = (32, 16)
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    num_output_heads: int = 18
    sampler: str = "absorbing"  # or "autoregressive"

    def __post_init__(self):
        if self.sampler not in ("absorbing", "autoregressive"):
            # a typo'd YAML value would silently train the wrong objective
            raise ValueError(
                f"sampler={self.sampler!r}: expected 'absorbing' or "
                "'autoregressive'"
            )

    @property
    def vocab_size(self) -> int:
        # +1 mask token in absorbing mode (transformer_arch.py:203)
        return self.codebook_size + (0 if self.sampler == "autoregressive" else 1)

    @property
    def head_class_num(self) -> int:
        return self.codebook_size // self.num_output_heads


@dataclass(frozen=True)
class UNetConfig:
    """mmcv-free UNet (reference models/archs/unet_arch.py:317,503)."""

    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    attr_embedding: int = 0  # ShapeUNet concatenates this at every encoder stage
    enc_num_convs: Tuple[int, ...] = (2, 2, 2, 2, 2)
    dec_num_convs: Tuple[int, ...] = (2, 2, 2, 2)
    # activation dtype for the conv stacks ("float32" | "bfloat16"); params
    # and BatchNorm normalization stay float32 (same convention as VQGANConfig)
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class FCNHeadConfig:
    """FCN decode head (reference models/archs/fcn_arch.py:159,228)."""

    in_channels: int = 64
    channels: int = 64
    num_classes: int = 24
    num_convs: int = 1
    concat_input: bool = False
    dropout_ratio: float = 0.1
    # int for the default 'index' pick; a tuple with input_transform set
    # selects multiple levels (reference fcn_arch.py:120-145)
    in_index: Union[int, Tuple[int, ...]] = 4
    num_heads: int = 1  # 18 for the index-prediction head
    kernel_size: int = 3
    # None | 'resize_concat' | 'multiple_select' (fcn_arch.py:77-99)
    input_transform: Optional[str] = None
    align_corners: bool = False  # resize_concat's F.interpolate flag
    # activation dtype for the head convs ("float32" | "bfloat16"); the final
    # conv_seg logits are emitted in float32 either way
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class ShapeAttrConfig:
    """Per-attribute embedding MLPs (reference models/archs/shape_attr_embedding_arch.py:6)."""

    dim: int = 8
    out_dim: int = 128
    cls_num_list: Tuple[int, ...] = (2, 4, 6, 5, 4, 3, 5, 5, 3, 2, 2, 2, 2, 2, 2)


# ---------------------------------------------------------------------------
# Presets mirroring the 7 reference configs.
# ---------------------------------------------------------------------------

TOP_VQGAN = VQGANConfig()  # configs/vqvae_top.yml:19-31
TOP_QUANTIZER = QuantizerConfig(n_embed=1024, embed_dim=256, num_codebooks=18)

BOT_VQGAN = VQGANConfig(  # configs/vqvae_bottom.yml:26-35
    ch_mult=(1, 1, 2, 4), attn_resolutions=(64,), num_res_blocks=2
)
BOT_QUANTIZER = QuantizerConfig(
    n_embed=512, embed_dim=256, num_codebooks=18, spatial_size=2
)

SEGM_VQGAN = VQGANConfig(  # configs/parsing_token.yml:22-34
    ch=64,
    ch_mult=(1, 1, 2, 2, 4),
    num_res_blocks=1,
    attn_resolutions=(16,),
    in_channels=24,
    out_ch=24,
    z_channels=32,
    embed_dim=32,
)
SEGM_QUANTIZER = QuantizerConfig(n_embed=1024, embed_dim=32)

SAMPLER_TRANSFORMER = TransformerConfig()

DISCRIMINATOR = DiscriminatorConfig()

PARSING_GEN_UNET = UNetConfig(in_channels=1, attr_embedding=128)
PARSING_GEN_FCN = FCNHeadConfig(num_classes=24)
PARSING_GEN_ATTR = ShapeAttrConfig()

INDEX_PRED_UNET = UNetConfig(in_channels=256)
INDEX_PRED_FCN = FCNHeadConfig(num_classes=512, num_heads=18)

NUM_SEGM_CLASSES = 24
NUM_TEXTURE_CODEBOOKS = 18
NUM_DIFFUSION_TIMESTEPS = 1000
DEFAULT_SAMPLE_STEPS = 256


def tiny_like(cfg: VQGANConfig, resolution: int = 32, ch: int = 8) -> VQGANConfig:
    """Shrink a VQGAN config for CPU smoke tests (the reference's 'debug' convention)."""
    n = cfg.num_resolutions
    return dataclasses.replace(
        cfg,
        ch=ch,
        resolution=resolution,
        z_channels=min(cfg.z_channels, 16),
        embed_dim=min(cfg.embed_dim, 16),
        attn_resolutions=(resolution // 2 ** (n - 1),),
    )
