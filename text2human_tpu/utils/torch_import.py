"""Convert reference ``.pth`` checkpoints into text2human_tpu param pytrees.

The six reference checkpoints and their state-dict layouts (SURVEY.md §5):
  vqvae_top.pth       encoder/decoder/quantize/quant_conv/post_quant_conv/discriminator
  vqvae_bottom.pth    bot_encoder/bot_decoder_res/decoder/bot_quantize/
                      bot_quant_conv/bot_post_quant_conv/discriminator
  parsing_token.pth   encoder/decoder/quantize/quant_conv/post_quant_conv
  sampler.pth         bare TransformerMultiHead state dict
  index_pred_net.pth  guidance_encoder/index_decoder
  parsing_gen.pth     embedder/encoder/decoder

Conversion rules: NCHW conv weights [O,I,kh,kw] -> HWIO; Linear [O,I] -> [I,O];
GroupNorm/LayerNorm weight/bias -> scale/bias; BatchNorm running stats -> the
``batch_stats`` collection; the 18 per-codebook embeddings / output heads /
FCN branches are stacked on a leading axis; transformer blocks are stacked on
the nn.scan layer axis.

Requires torch (CPU) only for deserialization.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_pth(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def conv(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[_key(prefix, "weight")]).transpose(2, 3, 1, 0)}
    if _key(prefix, "bias") in sd:
        out["bias"] = _np(sd[_key(prefix, "bias")])
    return out


def linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[_key(prefix, "weight")]).T}
    if _key(prefix, "bias") in sd:
        out["bias"] = _np(sd[_key(prefix, "bias")])
    return out


def norm_scale_bias(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def group_norm(sd: Dict, prefix: str) -> Dict[str, Any]:
    # our GroupNorm wrapper holds an inner nn.GroupNorm as GroupNorm_0
    return {"GroupNorm_0": norm_scale_bias(sd, prefix)}


def batch_norm(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = norm_scale_bias(sd, prefix)
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def resnet_block(sd: Dict, prefix: str) -> Dict[str, Any]:
    out = {
        "norm1": group_norm(sd, f"{prefix}.norm1"),
        "conv1": conv(sd, f"{prefix}.conv1"),
        "norm2": group_norm(sd, f"{prefix}.norm2"),
        "conv2": conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.temb_proj.weight" in sd:  # DDPM Model blocks only
        out["temb_proj"] = linear(sd, f"{prefix}.temb_proj")
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = conv(sd, f"{prefix}.nin_shortcut")
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = conv(sd, f"{prefix}.conv_shortcut")
    return out


def attn_block(sd: Dict, prefix: str) -> Dict[str, Any]:
    return {
        "norm": group_norm(sd, f"{prefix}.norm"),
        "q": conv(sd, f"{prefix}.q"),
        "k": conv(sd, f"{prefix}.k"),
        "v": conv(sd, f"{prefix}.v"),
        "proj_out": conv(sd, f"{prefix}.proj_out"),
    }


def encoder_params(sd: Dict, num_levels: int, num_res_blocks: int) -> Dict[str, Any]:
    """Reference Encoder state dict (vqgan_arch.py:818-919) -> our Encoder."""
    out: Dict[str, Any] = {"conv_in": conv(sd, "conv_in")}
    for lvl in range(num_levels):
        for blk in range(num_res_blocks):
            out[f"down_{lvl}_block_{blk}"] = resnet_block(sd, f"down.{lvl}.block.{blk}")
            if f"down.{lvl}.attn.{blk}.norm.weight" in sd:
                out[f"down_{lvl}_attn_{blk}"] = attn_block(sd, f"down.{lvl}.attn.{blk}")
        if f"down.{lvl}.downsample.conv.weight" in sd:
            out[f"down_{lvl}_downsample"] = {
                "conv": conv(sd, f"down.{lvl}.downsample.conv")
            }
    out["mid_block_1"] = resnet_block(sd, "mid.block_1")
    out["mid_attn_1"] = attn_block(sd, "mid.attn_1")
    out["mid_block_2"] = resnet_block(sd, "mid.block_2")
    out["norm_out"] = group_norm(sd, "norm_out")
    out["conv_out"] = conv(sd, "conv_out")
    return out


def decoder_params(sd: Dict, num_levels: int, num_res_blocks: int) -> Dict[str, Any]:
    """Reference Decoder state dict (vqgan_arch.py:922-1033) -> our Decoder."""
    out: Dict[str, Any] = {"conv_in": conv(sd, "conv_in")}
    out["mid_block_1"] = resnet_block(sd, "mid.block_1")
    out["mid_attn_1"] = attn_block(sd, "mid.attn_1")
    out["mid_block_2"] = resnet_block(sd, "mid.block_2")
    for lvl in range(num_levels):
        for blk in range(num_res_blocks + 1):
            out[f"up_{lvl}_block_{blk}"] = resnet_block(sd, f"up.{lvl}.block.{blk}")
            if f"up.{lvl}.attn.{blk}.norm.weight" in sd:
                out[f"up_{lvl}_attn_{blk}"] = attn_block(sd, f"up.{lvl}.attn.{blk}")
        if f"up.{lvl}.upsample.conv.weight" in sd:
            out[f"up_{lvl}_upsample"] = {"conv": conv(sd, f"up.{lvl}.upsample.conv")}
    out["norm_out"] = group_norm(sd, "norm_out")
    out["conv_out"] = conv(sd, "conv_out")
    return out


def ddpm_model_params(sd: Dict, num_levels: int, num_res_blocks: int) -> Dict[str, Any]:
    """Reference DDPM ``Model`` state dict (vqgan_arch.py:664-815) -> our
    DDPMUNet (models/ddpm.py)."""
    out: Dict[str, Any] = {"conv_in": conv(sd, "conv_in")}
    if "temb.dense.0.weight" in sd:
        out["temb_dense_0"] = linear(sd, "temb.dense.0")
        out["temb_dense_1"] = linear(sd, "temb.dense.1")
    for lvl in range(num_levels):
        for blk in range(num_res_blocks):
            out[f"down_{lvl}_block_{blk}"] = resnet_block(sd, f"down.{lvl}.block.{blk}")
            if f"down.{lvl}.attn.{blk}.norm.weight" in sd:
                out[f"down_{lvl}_attn_{blk}"] = attn_block(sd, f"down.{lvl}.attn.{blk}")
        if f"down.{lvl}.downsample.conv.weight" in sd:
            out[f"down_{lvl}_downsample"] = {
                "conv": conv(sd, f"down.{lvl}.downsample.conv")
            }
    out["mid_block_1"] = resnet_block(sd, "mid.block_1")
    out["mid_attn_1"] = attn_block(sd, "mid.attn_1")
    out["mid_block_2"] = resnet_block(sd, "mid.block_2")
    for lvl in range(num_levels):
        for blk in range(num_res_blocks + 1):
            out[f"up_{lvl}_block_{blk}"] = resnet_block(sd, f"up.{lvl}.block.{blk}")
            if f"up.{lvl}.attn.{blk}.norm.weight" in sd:
                out[f"up_{lvl}_attn_{blk}"] = attn_block(sd, f"up.{lvl}.attn.{blk}")
        if f"up.{lvl}.upsample.conv.weight" in sd:
            out[f"up_{lvl}_upsample"] = {"conv": conv(sd, f"up.{lvl}.upsample.conv")}
    out["norm_out"] = group_norm(sd, "norm_out")
    out["conv_out"] = conv(sd, "conv_out")
    return out


def decoder_res_params(sd: Dict) -> Dict[str, Any]:
    return {
        "conv_in": conv(sd, "conv_in"),
        "mid_block_1": resnet_block(sd, "mid.block_1"),
        "mid_attn_1": attn_block(sd, "mid.attn_1"),
        "mid_block_2": resnet_block(sd, "mid.block_2"),
    }


def quantizer_params(sd: Dict) -> Dict[str, np.ndarray]:
    """Single codebook (vqgan_arch.py:35) or stacked 18 (vqgan_arch.py:166, 355)."""
    if "embedding.weight" in sd:
        return {"codebook": _np(sd["embedding.weight"])}
    books = []
    k = 0
    while f"embedding_list.{k}.weight" in sd:
        books.append(_np(sd[f"embedding_list.{k}.weight"]))
        k += 1
    if not books:
        raise ValueError(
            "unrecognized quantizer state-dict layout: expected "
            "'embedding.weight' (single codebook) or "
            "'embedding_list.<k>.weight' (stacked texture codebooks); got "
            f"keys like {sorted(sd)[:6]}"
        )
    return {"codebooks": np.stack(books)}


def _pos_emb(sd: Dict) -> "np.ndarray":
    pe = _np(sd["pos_emb"])
    return pe.reshape(-1, pe.shape[-1])


def discriminator_params(sd: Dict, n_layers: int = 3) -> Tuple[Dict, Dict]:
    """PatchGAN Sequential (vqgan_arch.py:1155-1203): conv,lrelu,(conv,bn,lrelu)*,conv."""
    params: Dict[str, Any] = {"conv_0": conv(sd, "main.0")}
    stats: Dict[str, Any] = {}
    idx = 2
    for n in range(1, n_layers + 1):
        params[f"conv_{n}"] = conv(sd, f"main.{idx}")
        p, s = batch_norm(sd, f"main.{idx + 1}")
        params[f"bn_{n}"] = p
        stats[f"bn_{n}"] = s
        idx += 3
    params["conv_out"] = conv(sd, f"main.{idx}")
    return params, stats


def transformer_params(
    sd: Dict, n_layers: int, num_heads: int, causal: bool = False
) -> Dict[str, Any]:
    """TransformerMultiHead state dict (transformer_arch.py:184-235) -> our
    scan-stacked layout.  ``causal=True`` additionally maps the learned
    ``start_tok`` (transformer_arch.py:220 — declared in every reference
    checkpoint, consumed only by the autoregressive mode)."""
    out: Dict[str, Any] = {
        "tok_emb": _np(sd["tok_emb.weight"]),
        "pos_emb": _pos_emb(sd),
        "segm_emb": _np(sd["segm_emb.weight"]),
        "texture_emb": _np(sd["texture_emb.weight"]),
        "ln_f": norm_scale_bias(sd, "ln_f"),
    }
    if causal:
        out["start_tok"] = _np(sd["start_tok"]).reshape(-1)

    layers = [_transformer_layer_tree(sd, i) for i in range(n_layers)]
    out["blocks"] = jax_tree_stack(layers)

    heads = [
        _np(sd[f"head_list.{k}.weight"]).T for k in range(num_heads)
    ]  # [D, C] each
    out["heads"] = np.stack(heads)
    return out


def _transformer_layer_tree(sd: Dict, i: int) -> Dict[str, Any]:
    p = f"blocks.{i}"
    return {
        "ln1": norm_scale_bias(sd, f"{p}.ln1"),
        "ln2": norm_scale_bias(sd, f"{p}.ln2"),
        "attn": {
            "query": linear(sd, f"{p}.attn.query"),
            "key": linear(sd, f"{p}.attn.key"),
            "value": linear(sd, f"{p}.attn.value"),
            "proj": linear(sd, f"{p}.attn.proj"),
        },
        "mlp_fc": linear(sd, f"{p}.mlp.0"),
        "mlp_proj": linear(sd, f"{p}.mlp.2"),
    }


def transformer_single_params(
    sd: Dict, n_layers: int, causal: bool = False
) -> Dict[str, Any]:
    """Single-head ``Transformer`` state dict (transformer_arch.py:102-181,
    dead code in the reference) -> our models/transformer.py:Transformer."""
    out: Dict[str, Any] = {
        "tok_emb": _np(sd["tok_emb.weight"]),
        "pos_emb": _pos_emb(sd),
        "segm_emb": _np(sd["segm_emb.weight"]),
        "ln_f": norm_scale_bias(sd, "ln_f"),
        "head": _np(sd["head.weight"]).T,  # [D, codebook_size]
    }
    if causal:
        out["start_tok"] = _np(sd["start_tok"]).reshape(-1)
    out["blocks"] = jax_tree_stack(
        [_transformer_layer_tree(sd, i) for i in range(n_layers)]
    )
    return out


def jax_tree_stack(trees: List[Any]) -> Any:
    """Stack a list of identical-structure nested dicts on a new leading axis."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: jax_tree_stack([t[k] for t in trees]) for k in first}
    return np.stack(trees)


# -- UNet / FCN families -----------------------------------------------------


def _conv_module(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    p, s = batch_norm(sd, f"{prefix}.bn")
    return {"conv": conv(sd, f"{prefix}.conv"), "bn": p}, {"bn": s}


def _basic_block(sd: Dict, prefix: str, num_convs: int) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for j in range(num_convs):
        p, s = _conv_module(sd, f"{prefix}.convs.{j}")
        params[f"conv_{j}"] = p
        stats[f"conv_{j}"] = s
    return params, stats


def unet_params(
    sd: Dict,
    num_stages: int = 5,
    enc_num_convs: Tuple[int, ...] = (2, 2, 2, 2, 2),
    dec_num_convs: Tuple[int, ...] = (2, 2, 2, 2),
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """Reference UNet/ShapeUNet state dict (unet_arch.py:317-500) -> ours.

    torch encoder.{i} is Sequential(maybe MaxPool, BasicConvBlock): the conv
    block is at index 1 for stages > 0 (MaxPool holds position 0), 0 otherwise.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_stages):
        seq_idx = 0 if i == 0 else 1
        p, s = _basic_block(sd, f"{prefix}encoder.{i}.{seq_idx}", enc_num_convs[i])
        params[f"enc_{i}"] = p
        stats[f"enc_{i}"] = s
    for i in range(num_stages - 1):
        dec: Dict[str, Any] = {}
        dec_s: Dict[str, Any] = {}
        p, s = _conv_module(sd, f"{prefix}decoder.{i}.upsample.interp_upsample.1")
        dec["upsample"] = {"conv": p}
        dec_s["upsample"] = {"conv": s}
        p, s = _basic_block(sd, f"{prefix}decoder.{i}.conv_block", dec_num_convs[i])
        dec["conv_block"] = p
        dec_s["conv_block"] = s
        params[f"dec_{i}"] = dec
        stats[f"dec_{i}"] = dec_s
    return params, stats


def fcn_head_params(
    sd: Dict, num_convs: int = 1, concat_input: bool = False, prefix: str = ""
) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_convs):
        p, s = _conv_module(sd, f"{prefix}convs.{i}")
        params[f"conv_{i}"] = p
        stats[f"conv_{i}"] = s
    if concat_input:
        p, s = _conv_module(sd, f"{prefix}conv_cat")
        params["conv_cat"] = p
        stats["conv_cat"] = s
    params["conv_seg"] = conv(sd, f"{prefix}conv_seg")
    return params, stats


def multihead_fcn_params(
    sd: Dict, num_heads: int = 18, num_convs: int = 1, concat_input: bool = False
) -> Tuple[Dict, Dict]:
    """18 branches -> one vmapped head with stacked [18, ...] params."""
    per_params, per_stats = [], []
    for k in range(num_heads):
        params: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}
        for i in range(num_convs):
            p, s = _conv_module(sd, f"convs_list.{k}.{i}")
            params[f"conv_{i}"] = p
            stats[f"conv_{i}"] = s
        if concat_input:
            p, s = _conv_module(sd, f"conv_cat_list.{k}")
            params["conv_cat"] = p
            stats["conv_cat"] = s
        params["conv_seg"] = conv(sd, f"conv_seg_head_list.{k}")
        per_params.append(params)
        per_stats.append(stats)
    return (
        {"heads": jax_tree_stack(per_params)},
        {"heads": jax_tree_stack(per_stats)},
    )


def shape_attr_params(sd: Dict, num_attrs: int = 15) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(num_attrs):
        out[f"attr_{i}_fc1"] = linear(sd, f"attr_{i}.0")
        out[f"attr_{i}_fc2"] = linear(sd, f"attr_{i}.2")
    out["fusion_fc1"] = linear(sd, "fusion.0")
    out["fusion_fc2"] = linear(sd, "fusion.2")
    return out


# -- checkpoint-level converters --------------------------------------------


def convert_top_vqgan(
    ckpt: Dict[str, Any], num_levels: int = 5, num_res_blocks: int = 2
) -> Dict[str, Any]:
    """vqvae_top.pth -> TextureVQGAN params (+ discriminator)."""
    params = {
        "encoder": encoder_params(ckpt["encoder"], num_levels, num_res_blocks),
        "decoder": decoder_params(ckpt["decoder"], num_levels, num_res_blocks),
        "quantize": quantizer_params(ckpt["quantize"]),
        "quant_conv": conv(ckpt["quant_conv"], ""),
        "post_quant_conv": conv(ckpt["post_quant_conv"], ""),
    }
    out = {"params": params}
    if "discriminator" in ckpt:
        d_params, d_stats = discriminator_params(ckpt["discriminator"])
        out["discriminator"] = {"params": d_params, "batch_stats": d_stats}
    return out


def convert_segm_tokenizer(
    ckpt: Dict[str, Any], num_levels: int = 5, num_res_blocks: int = 1
) -> Dict[str, Any]:
    """parsing_token.pth -> SegmVQVAE params."""
    return {
        "params": {
            "encoder": encoder_params(ckpt["encoder"], num_levels, num_res_blocks),
            "decoder": decoder_params(ckpt["decoder"], num_levels, num_res_blocks),
            "quantize": quantizer_params(ckpt["quantize"]),
            "quant_conv": conv(ckpt["quant_conv"], ""),
            "post_quant_conv": conv(ckpt["post_quant_conv"], ""),
        }
    }


def convert_bottom_vqgan(
    ckpt: Dict[str, Any],
    bot_levels: int = 4,
    top_levels: int = 5,
    num_res_blocks: int = 2,
) -> Dict[str, Any]:
    """vqvae_bottom.pth -> the bottom/decoder part of HierarchyVQ params."""
    params = {
        "bot_encoder": encoder_params(ckpt["bot_encoder"], bot_levels, num_res_blocks),
        "bot_decoder_res": decoder_res_params(ckpt["bot_decoder_res"]),
        "decoder": decoder_params(ckpt["decoder"], top_levels, num_res_blocks),
        "bot_quantize": quantizer_params(ckpt["bot_quantize"]),
        "bot_quant_conv": conv(ckpt["bot_quant_conv"], ""),
        "bot_post_quant_conv": conv(ckpt["bot_post_quant_conv"], ""),
    }
    out = {"params": params}
    if "discriminator" in ckpt:
        d_params, d_stats = discriminator_params(ckpt["discriminator"])
        out["discriminator"] = {"params": d_params, "batch_stats": d_stats}
    return out


def convert_sampler(
    sd: Dict[str, Any],
    n_layers: int = 24,
    num_heads: int = 18,
    causal: bool = False,
):
    """sampler.pth (bare transformer state dict).  ``causal=True`` for a
    checkpoint served in autoregressive mode (imports start_tok)."""
    return {"params": transformer_params(sd, n_layers, num_heads, causal)}


def convert_index_pred(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """index_pred_net.pth -> IndexPredictionNet variables."""
    enc_p, enc_s = unet_params(ckpt["guidance_encoder"])
    dec_p, dec_s = multihead_fcn_params(ckpt["index_decoder"])
    return {
        "params": {"guidance_encoder": enc_p, "index_decoder": dec_p},
        "batch_stats": {"guidance_encoder": enc_s, "index_decoder": dec_s},
    }


def convert_parsing_gen(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """parsing_gen.pth -> ParsingGenerator variables."""
    enc_p, enc_s = unet_params(ckpt["encoder"])
    dec_p, dec_s = fcn_head_params(ckpt["decoder"])
    return {
        "params": {
            "embedder": shape_attr_params(ckpt["embedder"]),
            "encoder": {"unet": enc_p},
            "decoder": dec_p,
        },
        "batch_stats": {"encoder": {"unet": enc_s}, "decoder": dec_s},
    }


def convert_hierarchy_params(top_path: str, bottom_path: str) -> Dict[str, Any]:
    """top + bottom .pth -> HierarchyVQ params (the bottom checkpoint's
    finetuned decoder wins, reference sample_model.py:139-152 /
    hierarchy_inference_model.py:131-168)."""
    top = convert_top_vqgan(load_pth(top_path))["params"]
    bot = convert_bottom_vqgan(load_pth(bottom_path))["params"]
    return {
        "top_encoder": top["encoder"],
        "top_quantize": top["quantize"],
        "top_quant_conv": top["quant_conv"],
        "top_post_quant_conv": top["post_quant_conv"],
        "decoder": bot["decoder"],
        "bot_encoder": bot["bot_encoder"],
        "bot_decoder_res": bot["bot_decoder_res"],
        "bot_quantize": bot["bot_quantize"],
        "bot_quant_conv": bot["bot_quant_conv"],
        "bot_post_quant_conv": bot["bot_post_quant_conv"],
    }


def convert_pipeline_checkpoints(
    top_path: str,
    bottom_path: str,
    segm_path: str,
    sampler_path: str,
    index_pred_path: str,
    parsing_gen_path: str = "",
    causal_sampler: bool = False,
) -> Dict[str, Any]:
    """Build the SamplePipeline params dict from the reference's six .pth files
    (≙ BaseSampleModel.__init__ loads, sample_model.py:124-181,397-410).
    ``causal_sampler=True`` when the pipeline's TransformerConfig.sampler is
    'autoregressive' (the causal trunk needs the checkpoint's start_tok)."""
    params = {
        "hierarchy": convert_hierarchy_params(top_path, bottom_path),
        "segm": convert_segm_tokenizer(load_pth(segm_path))["params"],
        "sampler": convert_sampler(
            load_pth(sampler_path), causal=causal_sampler
        )["params"],
        "index_pred": convert_index_pred(load_pth(index_pred_path)),
    }
    if parsing_gen_path:
        params["parsing_gen"] = convert_parsing_gen(load_pth(parsing_gen_path))
    return params
