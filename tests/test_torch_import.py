"""Checkpoint-converter tests.

Primitive mappings are verified numerically against torch ops; composite
converters are verified structurally by synthesizing reference-layout state
dicts and checking the converted tree drops into our flax-initialized modules
(same key paths, same leaf shapes).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.config import (
    FCNHeadConfig,
    QuantizerConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.models.composites import IndexPredictionNet
from text2human_tpu.models.transformer import TransformerMultiHead
from text2human_tpu.models.vqgan import Discriminator, Encoder
from text2human_tpu.utils import torch_import as ti

torch = pytest.importorskip("torch")


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def assert_structure_matches(converted, init_tree):
    cs, is_ = tree_shapes(converted), tree_shapes(init_tree)
    assert cs == is_, f"\nconverted: {cs}\ninit:      {is_}"


def test_conv_mapping_numeric(rng):
    w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal(5).astype(np.float32)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    tconv.weight.data = torch.from_numpy(w)
    tconv.bias.data = torch.from_numpy(b)
    want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    params = ti.conv({"weight": torch.from_numpy(w), "bias": torch.from_numpy(b)}, "")
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(params["kernel"]),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["bias"]
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
    )


def test_linear_mapping_numeric(rng):
    w = rng.standard_normal((7, 4)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    want = x @ w.T + b
    p = ti.linear({"weight": torch.from_numpy(w), "bias": torch.from_numpy(b)}, "")
    got = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


# -- synthetic reference-layout state dicts ---------------------------------


def _conv_sd(sd, prefix, cin, cout, k, bias=True):
    sd[f"{prefix}.weight"] = np.zeros((cout, cin, k, k), np.float32)
    if bias:
        sd[f"{prefix}.bias"] = np.zeros((cout,), np.float32)


def _norm_sd(sd, prefix, c):
    sd[f"{prefix}.weight"] = np.ones((c,), np.float32)
    sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)


def _resblock_sd(sd, prefix, cin, cout):
    _norm_sd(sd, f"{prefix}.norm1", cin)
    _conv_sd(sd, f"{prefix}.conv1", cin, cout, 3)
    _norm_sd(sd, f"{prefix}.norm2", cout)
    _conv_sd(sd, f"{prefix}.conv2", cout, cout, 3)
    if cin != cout:
        _conv_sd(sd, f"{prefix}.nin_shortcut", cin, cout, 1)


def _attn_sd(sd, prefix, c):
    _norm_sd(sd, f"{prefix}.norm", c)
    for name in ["q", "k", "v", "proj_out"]:
        _conv_sd(sd, f"{prefix}.{name}", c, c, 1)


def make_encoder_sd(cfg: VQGANConfig):
    sd = {}
    _conv_sd(sd, "conv_in", cfg.in_channels, cfg.ch, 3)
    curr_res = cfg.resolution
    block_in = cfg.ch
    for lvl in range(cfg.num_resolutions):
        block_out = cfg.ch * cfg.ch_mult[lvl]
        for blk in range(cfg.num_res_blocks):
            _resblock_sd(sd, f"down.{lvl}.block.{blk}", block_in, block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                _attn_sd(sd, f"down.{lvl}.attn.{blk}", block_in)
        if lvl != cfg.num_resolutions - 1:
            _conv_sd(sd, f"down.{lvl}.downsample.conv", block_in, block_in, 3)
            curr_res //= 2
    _resblock_sd(sd, "mid.block_1", block_in, block_in)
    _attn_sd(sd, "mid.attn_1", block_in)
    _resblock_sd(sd, "mid.block_2", block_in, block_in)
    _norm_sd(sd, "norm_out", block_in)
    out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    _conv_sd(sd, "conv_out", block_in, out_ch, 3)
    return {k: torch.from_numpy(v) for k, v in sd.items()}


TINY = VQGANConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    resolution=32, z_channels=8, embed_dim=8,
)


def test_encoder_converter_structure():
    sd = make_encoder_sd(TINY)
    converted = ti.encoder_params(sd, TINY.num_resolutions, TINY.num_res_blocks)
    init = Encoder(TINY).init(jax.random.key(0), jnp.zeros((1, 32, 16, 3)))["params"]
    assert_structure_matches(converted, init)


def test_transformer_converter_structure():
    cfg = TransformerConfig(
        codebook_size=48, segm_codebook_size=16, texture_codebook_size=3,
        n_emb=16, n_layers=2, n_head=2, block_size=12, latent_shape=(4, 3),
        num_output_heads=3,
    )
    sd = {}
    d = cfg.n_emb
    sd["tok_emb.weight"] = np.zeros((cfg.vocab_size, d), np.float32)
    sd["pos_emb"] = np.zeros((1, cfg.block_size, d), np.float32)
    sd["segm_emb.weight"] = np.zeros((cfg.segm_codebook_size, d), np.float32)
    sd["texture_emb.weight"] = np.zeros((cfg.texture_codebook_size, d), np.float32)
    _norm = lambda p, c: (_norm_sd(sd, p, c))
    for i in range(cfg.n_layers):
        _norm(f"blocks.{i}.ln1", d)
        _norm(f"blocks.{i}.ln2", d)
        for nm in ["key", "query", "value", "proj"]:
            sd[f"blocks.{i}.attn.{nm}.weight"] = np.zeros((d, d), np.float32)
            sd[f"blocks.{i}.attn.{nm}.bias"] = np.zeros((d,), np.float32)
        sd[f"blocks.{i}.mlp.0.weight"] = np.zeros((4 * d, d), np.float32)
        sd[f"blocks.{i}.mlp.0.bias"] = np.zeros((4 * d,), np.float32)
        sd[f"blocks.{i}.mlp.2.weight"] = np.zeros((d, 4 * d), np.float32)
        sd[f"blocks.{i}.mlp.2.bias"] = np.zeros((d,), np.float32)
    _norm("ln_f", d)
    for k in range(cfg.num_output_heads):
        sd[f"head_list.{k}.weight"] = np.zeros((cfg.head_class_num, d), np.float32)
    sd = {k: torch.from_numpy(v) for k, v in sd.items()}

    converted = ti.transformer_params(sd, cfg.n_layers, cfg.num_output_heads)
    tok = jnp.zeros((1, cfg.block_size), jnp.int32)
    init = TransformerMultiHead(cfg).init(jax.random.key(0), tok, tok, tok)["params"]
    assert_structure_matches(converted, init)


def test_discriminator_converter_structure():
    ndf, n_layers = 8, 3
    sd = {}
    _conv_sd(sd, "main.0", 3, ndf, 4)
    idx, cin = 2, ndf
    for n in range(1, n_layers + 1):
        mult = min(2 ** n, 8)
        _conv_sd(sd, f"main.{idx}", cin, ndf * mult, 4, bias=False)
        _norm_sd(sd, f"main.{idx+1}", ndf * mult)
        sd[f"main.{idx+1}.running_mean"] = np.zeros((ndf * mult,), np.float32)
        sd[f"main.{idx+1}.running_var"] = np.ones((ndf * mult,), np.float32)
        cin = ndf * mult
        idx += 3
    _conv_sd(sd, f"main.{idx}", cin, 1, 4)
    sd = {k: torch.from_numpy(v) for k, v in sd.items()}

    params, stats = ti.discriminator_params(sd, n_layers)
    variables = Discriminator(ndf=ndf, n_layers=n_layers).init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )
    assert_structure_matches(params, variables["params"])
    # batch stats: converter uses mean/var names matching flax BatchNorm
    assert_structure_matches(stats, variables["batch_stats"])


def _convmodule_sd(sd, prefix, cin, cout, k):
    _conv_sd(sd, f"{prefix}.conv", cin, cout, k, bias=False)
    _norm_sd(sd, f"{prefix}.bn", cout)
    sd[f"{prefix}.bn.running_mean"] = np.zeros((cout,), np.float32)
    sd[f"{prefix}.bn.running_var"] = np.ones((cout,), np.float32)


def make_unet_sd(cfg: UNetConfig):
    sd = {}
    cin = cfg.in_channels + cfg.attr_embedding
    for i in range(cfg.num_stages):
        seq = 0 if i == 0 else 1
        cout = cfg.base_channels * 2 ** i
        for j in range(cfg.enc_num_convs[i]):
            _convmodule_sd(sd, f"encoder.{i}.{seq}.convs.{j}", cin if j == 0 else cout, cout, 3)
        cin = cout + cfg.attr_embedding
    for i in range(cfg.num_stages - 1):
        skip = cfg.base_channels * 2 ** i
        _convmodule_sd(sd, f"decoder.{i}.upsample.interp_upsample.1", skip * 2, skip, 1)
        for j in range(cfg.dec_num_convs[i]):
            _convmodule_sd(
                sd, f"decoder.{i}.conv_block.convs.{j}", 2 * skip if j == 0 else skip, skip, 3
            )
    return {k: torch.from_numpy(v) for k, v in sd.items()}


def test_index_pred_converter_structure():
    unet_cfg = UNetConfig(
        in_channels=8, base_channels=4, num_stages=3,
        enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1),
    )
    fcn_cfg = FCNHeadConfig(
        in_channels=4, channels=4, num_classes=8, num_convs=1, in_index=2, num_heads=3
    )
    unet_sd = make_unet_sd(unet_cfg)

    fcn_sd = {}
    for k in range(fcn_cfg.num_heads):
        _convmodule_sd(fcn_sd, f"convs_list.{k}.0", fcn_cfg.in_channels, fcn_cfg.channels, 3)
        _conv_sd(fcn_sd, f"conv_seg_head_list.{k}", fcn_cfg.channels, fcn_cfg.num_classes, 1)
    fcn_sd = {
        k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
        for k, v in fcn_sd.items()
    }

    # convert_index_pred hardcodes the full-size config; drive the pieces
    # directly with the tiny dims
    conv_p, conv_s = ti.unet_params(
        unet_sd, unet_cfg.num_stages, unet_cfg.enc_num_convs, unet_cfg.dec_num_convs
    )
    head_p, head_s = ti.multihead_fcn_params(
        fcn_sd, fcn_cfg.num_heads, fcn_cfg.num_convs, fcn_cfg.concat_input
    )
    converted = {
        "params": {"guidance_encoder": conv_p, "index_decoder": head_p},
        "batch_stats": {"guidance_encoder": conv_s, "index_decoder": head_s},
    }
    net = IndexPredictionNet(unet_cfg, fcn_cfg)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 16, 8, 8)))
    assert_structure_matches(converted["params"], variables["params"])
    assert_structure_matches(converted["batch_stats"], variables["batch_stats"])


def make_decoder_sd(cfg: VQGANConfig):
    sd = {}
    block_in = cfg.ch * cfg.ch_mult[-1]
    _conv_sd(sd, "conv_in", cfg.z_channels, block_in, 3)
    _resblock_sd(sd, "mid.block_1", block_in, block_in)
    _attn_sd(sd, "mid.attn_1", block_in)
    _resblock_sd(sd, "mid.block_2", block_in, block_in)
    curr_res = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
    for lvl in reversed(range(cfg.num_resolutions)):
        block_out = cfg.ch * cfg.ch_mult[lvl]
        for blk in range(cfg.num_res_blocks + 1):
            _resblock_sd(sd, f"up.{lvl}.block.{blk}", block_in, block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                _attn_sd(sd, f"up.{lvl}.attn.{blk}", block_in)
        if lvl != 0:
            _conv_sd(sd, f"up.{lvl}.upsample.conv", block_in, block_in, 3)
            curr_res *= 2
    _norm_sd(sd, "norm_out", block_in)
    _conv_sd(sd, "conv_out", block_in, cfg.out_ch, 3)
    return {k: torch.from_numpy(v) for k, v in sd.items()}


def test_top_vqgan_checkpoint_converter_structure():
    """Full vqvae_top.pth-shaped checkpoint -> TextureVQGAN params (tiny dims)."""
    from text2human_tpu.config import QuantizerConfig
    from text2human_tpu.models.composites import TextureVQGAN

    quant = QuantizerConfig(n_embed=8, embed_dim=8, num_codebooks=3)
    enc_sd = make_encoder_sd(TINY)
    dec_sd = make_decoder_sd(TINY)
    q_sd = {
        f"embedding_list.{k}.weight": torch.zeros(8, 8) for k in range(3)
    }
    cc = {"weight": torch.zeros(8, TINY.z_channels, 1, 1), "bias": torch.zeros(8)}
    pc = {"weight": torch.zeros(TINY.z_channels, 8, 1, 1), "bias": torch.zeros(TINY.z_channels)}
    ckpt = {
        "encoder": enc_sd, "decoder": dec_sd, "quantize": q_sd,
        "quant_conv": cc, "post_quant_conv": pc,
    }
    converted = ti.convert_top_vqgan(
        ckpt, num_levels=TINY.num_resolutions, num_res_blocks=TINY.num_res_blocks
    )
    model = TextureVQGAN(TINY, quant)
    init = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 16, 3)), jnp.zeros((1, 32, 16))
    )["params"]
    assert_structure_matches(converted["params"], init)
