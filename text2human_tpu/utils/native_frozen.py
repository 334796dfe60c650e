"""Frozen-tokenizer params from NATIVE orbax checkpoints.

The reference's downstream jobs freeze upstream checkpoints saved by torch
(`transformer_model.py:100-121` loads the top/segm VQGANs from .pth;
`hierarchy_inference_model.py:131-168` the top+bottom pair) — so
``cli/train.py`` grew up reading `.pth` through ``utils/torch_import``.
This module is the all-native other half: a user who trained the upstream
jobs with THIS framework points ``img_ae_path`` / ``segm_ae_path`` /
``top_vae_path`` / ``bot_vae_path`` at the orbax checkpoint *directories*
``cli/train.py`` wrote, and gets the same frozen-param subtrees — no torch
round-trip anywhere in the pipeline (the sibling of
``pipelines/assemble.py``, which does this for serving).

Dispatch rule everywhere: a checkpoint path that is a DIRECTORY is native
orbax; a file is a torch ``.pth``.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict

from text2human_tpu.pipelines.assemble import _HIER_BOT_KEYS, _gen, _params
from text2human_tpu.utils.checkpoint import load_checkpoint


def is_native_ckpt(path: str) -> bool:
    """True for orbax checkpoint directories (cli/train.py output)."""
    return bool(path) and osp.isdir(path)


def native_top_params(path: str) -> Dict[str, Any]:
    """Top-VQGAN generator params from a native top/vqvae checkpoint —
    the shape ``torch_import.convert_top_vqgan(...)['params']`` returns
    (encoder/decoder/quantize/quant_conv/post_quant_conv)."""
    gen = _gen(load_checkpoint(path), f"native top checkpoint {path}")
    missing = [
        k for k in ("encoder", "decoder", "quantize", "quant_conv")
        if k not in gen
    ]
    if missing:
        raise ValueError(
            f"{path} is not a top-VQGAN checkpoint: missing {missing}"
        )
    return gen


def native_segm_params(path: str) -> Dict[str, Any]:
    """Segm-tokenizer params from a native parsing-token checkpoint —
    the shape ``convert_segm_tokenizer(...)['params']`` returns."""
    params = _params(load_checkpoint(path))
    # the segm tokenizer trains as a plain (non-GAN) job: params are the
    # module tree itself, but accept a GAN-shaped tree defensively
    if isinstance(params, dict) and "gen" in params:
        params = params["gen"]
    return params


def native_hierarchy_params(top_path: str, bot_path: str) -> Dict[str, Any]:
    """HierarchyVQ params from native top + bottom checkpoints, with the
    bottom's finetuned decoder winning — the same dependency graph as
    ``torch_import.convert_hierarchy_params`` (reference
    sample_model.py:139-152 / hierarchy_inference_model.py:131-168)."""
    top = native_top_params(top_path)
    bot = _gen(load_checkpoint(bot_path), f"native bottom checkpoint {bot_path}")
    missing = [k for k in _HIER_BOT_KEYS if k not in bot]
    if missing:
        raise ValueError(
            f"{bot_path} is not a hierarchy (bottom) checkpoint: "
            f"missing {missing}"
        )
    return {
        "top_encoder": top["encoder"],
        "top_quantize": top["quantize"],
        "top_quant_conv": top["quant_conv"],
        "top_post_quant_conv": top["post_quant_conv"],
        "decoder": bot["decoder"],
        **{k: bot[k] for k in _HIER_BOT_KEYS},
    }
