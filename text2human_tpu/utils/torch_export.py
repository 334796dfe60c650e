"""Export text2human_tpu params to the reference's state-dict layouts.

Inverse of ``torch_import``: produces flat dicts keyed exactly like the
reference checkpoints (SURVEY.md §5), with numpy arrays — pass through
``torch.save({k: torch.from_numpy(v) ...})`` for a reference-loadable .pth.
Lets users move trained weights back to the original PyTorch implementation.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def conv_export(sd: Dict, prefix: str, p: Dict):
    sd[f"{prefix}.weight" if prefix else "weight"] = _np(p["kernel"]).transpose(
        3, 2, 0, 1
    )
    if "bias" in p:
        sd[f"{prefix}.bias" if prefix else "bias"] = _np(p["bias"])


def linear_export(sd: Dict, prefix: str, p: Dict):
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def norm_export(sd: Dict, prefix: str, p: Dict):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def group_norm_export(sd: Dict, prefix: str, p: Dict):
    norm_export(sd, prefix, p["GroupNorm_0"])


def resnet_block_export(sd: Dict, prefix: str, p: Dict):
    group_norm_export(sd, f"{prefix}.norm1", p["norm1"])
    conv_export(sd, f"{prefix}.conv1", p["conv1"])
    group_norm_export(sd, f"{prefix}.norm2", p["norm2"])
    conv_export(sd, f"{prefix}.conv2", p["conv2"])
    if "nin_shortcut" in p:
        conv_export(sd, f"{prefix}.nin_shortcut", p["nin_shortcut"])
    if "conv_shortcut" in p:
        conv_export(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"])


def attn_block_export(sd: Dict, prefix: str, p: Dict):
    group_norm_export(sd, f"{prefix}.norm", p["norm"])
    for name in ("q", "k", "v", "proj_out"):
        conv_export(sd, f"{prefix}.{name}", p[name])


def encoder_export(params: Dict) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    conv_export(sd, "conv_in", params["conv_in"])
    for key, p in params.items():
        if key.startswith("down_"):
            parts = key.split("_")  # down_{lvl}_{block|attn|downsample}[_{idx}]
            lvl, kind = parts[1], parts[2]
            if kind == "block":
                resnet_block_export(sd, f"down.{lvl}.block.{parts[3]}", p)
            elif kind == "attn":
                attn_block_export(sd, f"down.{lvl}.attn.{parts[3]}", p)
            elif kind == "downsample":
                conv_export(sd, f"down.{lvl}.downsample.conv", p["conv"])
    resnet_block_export(sd, "mid.block_1", params["mid_block_1"])
    attn_block_export(sd, "mid.attn_1", params["mid_attn_1"])
    resnet_block_export(sd, "mid.block_2", params["mid_block_2"])
    group_norm_export(sd, "norm_out", params["norm_out"])
    conv_export(sd, "conv_out", params["conv_out"])
    return sd


def decoder_export(params: Dict) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    conv_export(sd, "conv_in", params["conv_in"])
    resnet_block_export(sd, "mid.block_1", params["mid_block_1"])
    attn_block_export(sd, "mid.attn_1", params["mid_attn_1"])
    resnet_block_export(sd, "mid.block_2", params["mid_block_2"])
    for key, p in params.items():
        if key.startswith("up_"):
            parts = key.split("_")
            lvl, kind = parts[1], parts[2]
            if kind == "block":
                resnet_block_export(sd, f"up.{lvl}.block.{parts[3]}", p)
            elif kind == "attn":
                attn_block_export(sd, f"up.{lvl}.attn.{parts[3]}", p)
            elif kind == "upsample":
                conv_export(sd, f"up.{lvl}.upsample.conv", p["conv"])
    group_norm_export(sd, "norm_out", params["norm_out"])
    conv_export(sd, "conv_out", params["conv_out"])
    return sd


def quantizer_export(params: Dict) -> Dict[str, np.ndarray]:
    if "codebook" in params:
        return {"embedding.weight": _np(params["codebook"])}
    books = _np(params["codebooks"])
    return {
        f"embedding_list.{k}.weight": books[k] for k in range(books.shape[0])
    }


def transformer_export(params: Dict) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {
        "tok_emb.weight": _np(params["tok_emb"]),
        "pos_emb": _np(params["pos_emb"])[None],
        "segm_emb.weight": _np(params["segm_emb"]),
        "texture_emb.weight": _np(params["texture_emb"]),
    }
    if "start_tok" in params:  # causal mode (transformer_arch.py:220)
        sd["start_tok"] = _np(params["start_tok"]).reshape(1, 1, -1)
    norm_export(sd, "ln_f", params["ln_f"])
    blocks = params["blocks"]
    n_layers = _np(blocks["ln1"]["scale"]).shape[0]
    for i in range(n_layers):
        layer = {  # unstack the scan axis
            "ln1": {k: _np(v)[i] for k, v in blocks["ln1"].items()},
            "ln2": {k: _np(v)[i] for k, v in blocks["ln2"].items()},
        }
        norm_export(sd, f"blocks.{i}.ln1", layer["ln1"])
        norm_export(sd, f"blocks.{i}.ln2", layer["ln2"])
        for name in ("query", "key", "value", "proj"):
            linear_export(
                sd,
                f"blocks.{i}.attn.{name}",
                {k: _np(v)[i] for k, v in blocks["attn"][name].items()},
            )
        linear_export(
            sd, f"blocks.{i}.mlp.0", {k: _np(v)[i] for k, v in blocks["mlp_fc"].items()}
        )
        linear_export(
            sd, f"blocks.{i}.mlp.2", {k: _np(v)[i] for k, v in blocks["mlp_proj"].items()}
        )
    heads = _np(params["heads"])  # [K, D, C]
    for k in range(heads.shape[0]):
        sd[f"head_list.{k}.weight"] = heads[k].T
    return sd


def top_vqgan_export(params: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    """TextureVQGAN params -> vqvae_top.pth layout (sans discriminator)."""
    return {
        "encoder": encoder_export(params["encoder"]),
        "decoder": decoder_export(params["decoder"]),
        "quantize": quantizer_export(params["quantize"]),
        "quant_conv": _single_conv_export(params["quant_conv"]),
        "post_quant_conv": _single_conv_export(params["post_quant_conv"]),
    }


def _single_conv_export(p: Dict) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    conv_export(sd, "", p)
    return sd
