"""Shape/jit tests for the architecture layer on tiny configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu import config as C
from text2human_tpu.config import (
    FCNHeadConfig,
    ShapeAttrConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.models.fcn import FCNHead, MultiHeadFCNHead
from text2human_tpu.models.shape_attr import ShapeAttrEmbedding
from text2human_tpu.models.transformer import (
    TransformerMultiHead,
    ragged_head_groups,
    select_head_logits,
)
from text2human_tpu.models.unet import ShapeUNet, UNet
from text2human_tpu.models.vqgan import Decoder, DecoderRes, Discriminator, Encoder

TINY = VQGANConfig(
    ch=8,
    ch_mult=(1, 1, 2),
    num_res_blocks=1,
    attn_resolutions=(8,),
    resolution=32,
    z_channels=8,
    embed_dim=8,
)


def test_encoder_decoder_shapes():
    enc = Encoder(TINY)
    x = jnp.zeros((2, 32, 16, 3))
    params = enc.init(jax.random.key(0), x)
    h = enc.apply(params, x)
    assert h.shape == (2, 8, 4, 8)  # 32/2^2 x 16/2^2 x z_channels

    dec = Decoder(TINY)
    dparams = dec.init(jax.random.key(1), h)
    y = dec.apply(dparams, h)
    assert y.shape == (2, 32, 16, 3)


def test_decoder_hierarchy_fusion():
    """bot_h injected after the deepest level's upsample changes the output."""
    dec = Decoder(TINY)
    z = jnp.ones((1, 8, 4, 8))
    params = dec.init(jax.random.key(0), z)
    base = dec.apply(params, z)
    # after first upsample: 16x8 at ch*ch_mult[-1]... fusion expects that shape
    bot_h = jnp.ones((1, 16, 8, TINY.ch * TINY.ch_mult[-1]))
    fused = dec.apply(params, z, bot_h)
    assert fused.shape == base.shape
    assert not np.allclose(np.asarray(fused), np.asarray(base))


def test_decoder_res():
    cfg = dataclasses.replace(TINY, ch_mult=(1, 2))
    dec = DecoderRes(cfg)
    z = jnp.zeros((1, 8, 4, 8))
    params = dec.init(jax.random.key(0), z)
    h = dec.apply(params, z)
    assert h.shape == (1, 8, 4, cfg.ch * cfg.ch_mult[-1])


def test_discriminator():
    disc = Discriminator(ndf=8, n_layers=3)
    x = jnp.zeros((2, 32, 16, 3))
    variables = disc.init(jax.random.key(0), x)
    y = disc.apply(variables, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    # train mode mutates batch_stats
    y2, mutated = disc.apply(x=x, train=True, variables=variables, mutable=["batch_stats"])
    assert "batch_stats" in mutated


TINY_TF = TransformerConfig(
    codebook_size=36,
    segm_codebook_size=16,
    texture_codebook_size=3,
    n_emb=16,
    n_layers=2,
    n_head=2,
    block_size=12,
    latent_shape=(4, 3),
    num_output_heads=3,
)


def test_transformer_multihead_shapes():
    tf = TransformerMultiHead(TINY_TF)
    b, t = 2, 12
    idx = jnp.zeros((b, t), dtype=jnp.int32)
    segm = jnp.zeros((b, t), dtype=jnp.int32)
    tex = jnp.ones((b, t), dtype=jnp.int32)
    params = tf.init(jax.random.key(0), idx, segm, tex)
    logits = jax.jit(lambda p, a, s, x: tf.apply(p, a, s, x))(params, idx, segm, tex)
    assert logits.shape == (b, t, 3, 12)  # K=3 heads, 36/3 classes
    sel = select_head_logits(logits, tex)
    assert sel.shape == (b, t, 12)
    np.testing.assert_allclose(np.asarray(sel), np.asarray(logits[:, :, 1]))


def test_transformer_mask_token_in_vocab():
    tf = TransformerMultiHead(TINY_TF)
    idx = jnp.full((1, 12), TINY_TF.codebook_size, dtype=jnp.int32)  # mask id
    segm = jnp.zeros((1, 12), dtype=jnp.int32)
    tex = jnp.zeros((1, 12), dtype=jnp.int32)
    params = tf.init(jax.random.key(0), idx, segm, tex)
    logits = tf.apply(params, idx, segm, tex)
    assert np.isfinite(np.asarray(logits)).all()


def test_unet_decoder_outputs():
    cfg = UNetConfig(in_channels=3, base_channels=4, num_stages=3,
                     enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1))
    unet = UNet(cfg)
    x = jnp.zeros((1, 16, 8, 3))
    variables = unet.init(jax.random.key(0), x)
    outs = unet.apply(variables, x)
    assert len(outs) == 3  # bottleneck + 2 decoder stages
    assert outs[0].shape == (1, 4, 2, 16)
    assert outs[-1].shape == (1, 16, 8, 4)


def test_shape_unet_attr_conditioning():
    cfg = UNetConfig(in_channels=1, base_channels=4, num_stages=3,
                     attr_embedding=8, enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1))
    unet = ShapeUNet(cfg)
    x = jnp.zeros((2, 16, 8, 1))
    emb = jnp.ones((2, 8))
    variables = unet.init(jax.random.key(0), x, emb)
    outs = unet.apply(variables, x, emb)
    assert outs[-1].shape == (2, 16, 8, 4)
    outs2 = unet.apply(variables, x, emb * 2)
    assert not np.allclose(np.asarray(outs[-1]), np.asarray(outs2[-1]))


def test_fcn_heads():
    cfg = FCNHeadConfig(in_channels=4, channels=4, num_classes=5, in_index=1)
    head = FCNHead(cfg)
    feats = [jnp.zeros((1, 4, 4, 8)), jnp.zeros((1, 8, 8, 4))]
    variables = head.init(jax.random.key(0), feats)
    y = head.apply(variables, feats)
    assert y.shape == (1, 8, 8, 5)

    mcfg = FCNHeadConfig(
        in_channels=4, channels=4, num_classes=6, in_index=1, num_heads=3
    )
    mhead = MultiHeadFCNHead(mcfg)
    variables = mhead.init(jax.random.key(0), feats)
    y = mhead.apply(variables, feats)
    assert y.shape == (1, 8, 8, 3, 6)


def test_shape_attr_embedding():
    cfg = ShapeAttrConfig(dim=4, out_dim=8, cls_num_list=(2, 3, 4))
    emb = ShapeAttrEmbedding(cfg)
    attr = jnp.array([[1, 2, 3], [0, 0, 0]], dtype=jnp.int32)
    variables = emb.init(jax.random.key(0), attr)
    y = emb.apply(variables, attr)
    assert y.shape == (2, 8)


def test_transformer_select_heads_matches_full():
    """Fused head selection == full heads + gather."""
    tf = TransformerMultiHead(TINY_TF)
    b, t = 2, 12
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, TINY_TF.vocab_size, (b, t)), jnp.int32)
    segm = jnp.asarray(rng.integers(0, 16, (b, t)), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 3, (b, t)), jnp.int32)
    params = tf.init(jax.random.key(0), idx, segm, tex)
    full = tf.apply(params, idx, segm, tex)
    sel = select_head_logits(full, tex)
    fused = tf.apply(params, idx, segm, tex, select_heads=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(sel), atol=1e-5)
    # grouped-matmul (ragged_dot) head selection: same math, 18x fewer FLOPs
    ragged = tf.apply(
        params, idx, segm, tex, select_heads=True, ragged_heads=True
    )
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(sel), atol=1e-4)
    # precomputed head_groups (the sort hoisted out of a decode scan) must be
    # bit-identical to the in-body sort path
    groups = ragged_head_groups(tex, TINY_TF.num_output_heads)
    hoisted = tf.apply(
        params, idx, segm, tex,
        select_heads=True, ragged_heads=True, head_groups=groups,
    )
    np.testing.assert_array_equal(np.asarray(hoisted), np.asarray(ragged))


def test_transformer_causal_mode():
    """autoregressive mode: no mask token in vocab; future tokens cannot
    influence earlier positions (reference transformer_arch.py:30-35,125-127)."""
    cfg = dataclasses.replace(TINY_TF, sampler="autoregressive")
    assert cfg.vocab_size == cfg.codebook_size  # no +1 mask token
    tf = TransformerMultiHead(cfg)
    b, t = 1, 12
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cfg.codebook_size, (b, t)), jnp.int32)
    segm = jnp.zeros((b, t), jnp.int32)
    tex = jnp.zeros((b, t), jnp.int32)
    params = tf.init(jax.random.key(0), idx, segm, tex)
    base = np.asarray(tf.apply(params, idx, segm, tex))
    # change the LAST token: logits at earlier positions must not move
    idx2 = idx.at[0, -1].set((idx[0, -1] + 1) % cfg.codebook_size)
    out2 = np.asarray(tf.apply(params, idx2, segm, tex))
    np.testing.assert_allclose(out2[:, :-1], base[:, :-1], atol=1e-5)
    assert not np.allclose(out2[:, -1], base[:, -1])


def test_causal_mode_is_actually_causal(rng):
    """Autoregressive mode behavioral check: logits at position i are
    invariant to tokens at positions > i (round-1 weak #10 — the causal flag
    was construction-tested only)."""
    import dataclasses

    from text2human_tpu.config import TransformerConfig
    from text2human_tpu.models.transformer import TransformerMultiHead

    cfg = TransformerConfig(
        codebook_size=24, segm_codebook_size=8, texture_codebook_size=2,
        n_emb=16, n_layers=2, n_head=2, block_size=12, latent_shape=(4, 3),
        num_output_heads=2, sampler="autoregressive",
    )
    model = TransformerMultiHead(cfg)
    t = cfg.block_size
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, t)), jnp.int32)
    segm = jnp.asarray(rng.integers(0, 8, (1, t)), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 2, (1, t)), jnp.int32)
    params = model.init(jax.random.key(0), tok, tok, tok)["params"]

    base = model.apply({"params": params}, tok, segm, tex)
    # perturb the future: change the last 4 tokens
    tok2 = tok.at[:, -4:].set((tok[:, -4:] + 1) % cfg.vocab_size)
    out2 = model.apply({"params": params}, tok2, segm, tex)
    cut = t - 4
    np.testing.assert_allclose(
        np.asarray(base[:, :cut]), np.asarray(out2[:, :cut]), atol=1e-6,
        err_msg="future tokens leaked into past positions",
    )
    # and the perturbed region does change (mask isn't over-blocking)
    assert float(np.max(np.abs(np.asarray(base[:, cut:] - out2[:, cut:])))) > 1e-4

    # the bidirectional default must NOT be causal
    cfg_bi = dataclasses.replace(cfg, sampler="absorbing")
    model_bi = TransformerMultiHead(cfg_bi)
    tok_bi = jnp.minimum(tok, cfg_bi.vocab_size - 1)
    params_bi = model_bi.init(jax.random.key(0), tok_bi, tok_bi, tok_bi)["params"]
    b1 = model_bi.apply({"params": params_bi}, tok_bi, segm, tex)
    tok_bi2 = tok_bi.at[:, -1:].set((tok_bi[:, -1:] + 1) % cfg_bi.vocab_size)
    b2 = model_bi.apply({"params": params_bi}, tok_bi2, segm, tex)
    assert float(np.max(np.abs(np.asarray(b1[:, 0] - b2[:, 0])))) > 1e-6
