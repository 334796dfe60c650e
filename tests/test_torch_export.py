"""Export/import roundtrip: our params -> reference layout -> our params."""

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu.config import QuantizerConfig, TransformerConfig, VQGANConfig
from text2human_tpu.models.composites import TextureVQGAN
from text2human_tpu.models.transformer import TransformerMultiHead
from text2human_tpu.utils import torch_export as te
from text2human_tpu.utils import torch_import as ti

TINY = VQGANConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    resolution=32, z_channels=8, embed_dim=8,
)


def assert_trees_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)),
        a,
        b,
    )


def test_top_vqgan_export_import_roundtrip():
    quant = QuantizerConfig(n_embed=8, embed_dim=8, num_codebooks=3)
    model = TextureVQGAN(TINY, quant)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 16, 3)), jnp.zeros((1, 32, 16))
    )["params"]

    exported = te.top_vqgan_export(params)
    # reference key style: dotted, NCHW
    assert "conv_in.weight" in exported["encoder"]
    assert exported["encoder"]["conv_in.weight"].shape == (8, 3, 3, 3)
    assert "embedding_list.0.weight" in exported["quantize"]

    back = ti.convert_top_vqgan(
        exported, num_levels=TINY.num_resolutions, num_res_blocks=TINY.num_res_blocks
    )["params"]
    assert_trees_equal(back, params)


def test_transformer_export_import_roundtrip():
    cfg = TransformerConfig(
        codebook_size=48, segm_codebook_size=16, texture_codebook_size=3,
        n_emb=16, n_layers=2, n_head=2, block_size=12, latent_shape=(4, 3),
        num_output_heads=3,
    )
    tok = jnp.zeros((1, cfg.block_size), jnp.int32)
    params = TransformerMultiHead(cfg).init(jax.random.key(0), tok, tok, tok)["params"]

    exported = te.transformer_export(params)
    assert exported["pos_emb"].shape == (1, cfg.block_size, cfg.n_emb)
    assert exported["head_list.0.weight"].shape == (cfg.head_class_num, cfg.n_emb)

    back = ti.transformer_params(exported, cfg.n_layers, cfg.num_output_heads)
    assert_trees_equal(back, params)


def test_transformer_causal_roundtrip_start_tok():
    """Autoregressive mode carries the reference's learned start_tok
    (transformer_arch.py:220): exported in the [1,1,D] torch layout,
    re-imported with causal=True, exact roundtrip."""
    import dataclasses

    cfg = TransformerConfig(
        codebook_size=48, segm_codebook_size=16, texture_codebook_size=3,
        n_emb=16, n_layers=2, n_head=2, block_size=12, latent_shape=(4, 3),
        num_output_heads=3, sampler="autoregressive",
    )
    tok = jnp.zeros((1, cfg.block_size), jnp.int32)
    params = TransformerMultiHead(cfg).init(jax.random.key(0), tok, tok, tok)["params"]
    assert "start_tok" in params

    exported = te.transformer_export(params)
    assert exported["start_tok"].shape == (1, 1, cfg.n_emb)
    back = ti.transformer_params(
        exported, cfg.n_layers, cfg.num_output_heads, causal=True
    )
    assert_trees_equal(back, params)

    # absorbing import of the same dict ignores the extra key
    absorbing = ti.transformer_params(exported, cfg.n_layers, cfg.num_output_heads)
    assert "start_tok" not in absorbing
