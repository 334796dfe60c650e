"""KV-cached autoregressive decode (models/ar_decode.py) vs the full causal
forward — teacher-forced logits parity and sampled-token equivalence.

Parity target: the reference's past_key_values-style incremental decode
(models/archs/transformer_arch.py:52-55)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text2human_tpu.config import TransformerConfig
from text2human_tpu.diffusion.absorbing import (
    AbsorbingDiffusion,
    _shift_right,
    sample_autoregressive,
)
from text2human_tpu.models.ar_decode import ar_decode_kv
from text2human_tpu.models.transformer import TransformerMultiHead

AR_CFG_KW = dict(
    codebook_size=12, segm_codebook_size=8, texture_codebook_size=2,
    n_emb=16, n_layers=3, n_head=2, block_size=16, latent_shape=(4, 4),
    num_output_heads=2, sampler="autoregressive",
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _setup(rng, b=2):
    cfg = TransformerConfig(**AR_CFG_KW)
    t_len = cfg.block_size
    model = TransformerMultiHead(cfg)
    dummy = jnp.zeros((1, t_len), jnp.int32)
    params = model.init(jax.random.key(0), dummy, dummy, dummy)["params"]
    segm = jnp.asarray(rng.integers(0, 8, (b, t_len)), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 2, (b, t_len)), jnp.int32)
    return cfg, model, params, segm, tex


def test_kv_decode_teacher_forced_logits_match_full_forward(rng):
    """Feeding a fixed stream through the KV decode position-by-position must
    produce exactly the logits of ONE whole-sequence causal forward on the
    shifted stream — the cache is a pure re-factoring, not an approximation."""
    cfg, model, params, segm, tex = _setup(rng)
    b, t_len = segm.shape
    c = cfg.head_class_num
    local = rng.integers(0, c, (b, t_len))
    cont = jnp.asarray(local + c * np.asarray(tex), jnp.int32)

    full = model.apply(
        {"params": params}, _shift_right(cont), segm, tex, select_heads=True
    )
    _, cont_out, kv_logits = ar_decode_kv(
        jax.random.key(1), params, cfg, segm, tex,
        n_embed_per_head=c, forced_cont=cont,
    )
    np.testing.assert_array_equal(np.asarray(cont_out), np.asarray(cont))
    np.testing.assert_allclose(
        np.asarray(kv_logits), np.asarray(full), atol=2e-4, rtol=1e-4
    )


def test_kv_decode_samples_match_whole_sequence_loop(rng):
    """With the same per-position keys, the KV decode and the whole-sequence
    scan decode walk the same sampling trajectory token for token."""
    cfg, model, params, segm, tex = _setup(rng)
    c = cfg.head_class_num
    diff = AbsorbingDiffusion(
        mask_id=cfg.codebook_size, num_tokens=cfg.block_size,
        n_embed_per_head=c,
    )

    def denoise(x_t):
        return model.apply(
            {"params": params}, x_t, segm, tex, select_heads=True
        )

    key = jax.random.key(7)
    ref_local, ref_cont = sample_autoregressive(key, diff, denoise, tex)
    kv_local, kv_cont, _ = ar_decode_kv(
        key, params, cfg, segm, tex, n_embed_per_head=c
    )
    np.testing.assert_array_equal(np.asarray(kv_local), np.asarray(ref_local))
    np.testing.assert_array_equal(np.asarray(kv_cont), np.asarray(ref_cont))


def test_pipeline_ar_mode_uses_kv_cache_and_matches_loop(rng):
    """SamplePipeline dispatch: kv_cache=True (default) and kv_cache=False
    produce the same tokens for the same key (single-device path)."""
    import dataclasses

    from text2human_tpu.config import (
        FCNHeadConfig, QuantizerConfig, ShapeAttrConfig, UNetConfig,
        VQGANConfig,
    )
    from text2human_tpu.pipelines.sample import PipelineConfigs, SamplePipeline

    res = 32
    top = VQGANConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(16,), resolution=res, z_channels=8,
                      embed_dim=8)
    tcfg = TransformerConfig(
        codebook_size=48, segm_codebook_size=16, texture_codebook_size=3,
        n_emb=16, n_layers=2, n_head=2, block_size=128, latent_shape=(16, 8),
        num_output_heads=3, sampler="autoregressive",
    )
    cfgs = PipelineConfigs(
        top=top,
        top_quant=QuantizerConfig(n_embed=16, embed_dim=8, num_codebooks=3),
        bot=dataclasses.replace(top, ch=16, ch_mult=(1,), attn_resolutions=(32,)),
        bot_quant=QuantizerConfig(n_embed=8, embed_dim=8, num_codebooks=3,
                                  spatial_size=2),
        segm=dataclasses.replace(top, in_channels=24, out_ch=24),
        segm_quant=QuantizerConfig(n_embed=16, embed_dim=8),
        transformer=tcfg,
        index_unet=UNetConfig(in_channels=8, base_channels=4, num_stages=3,
                              enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1)),
        index_fcn=FCNHeadConfig(in_channels=4, channels=4, num_classes=8,
                                num_convs=1, in_index=2, num_heads=3),
        shape_attr=ShapeAttrConfig(dim=4, out_dim=8, cls_num_list=(2, 3)),
        parsing_unet=UNetConfig(in_channels=1, base_channels=4, num_stages=3,
                                attr_embedding=8, enc_num_convs=(1, 1, 1),
                                dec_num_convs=(1, 1)),
        parsing_fcn=FCNHeadConfig(in_channels=4, channels=4, num_classes=24,
                                  in_index=2),
        sample_steps=4, num_segm_classes=24,
    )
    pipe_kv = SamplePipeline(cfgs)  # kv_cache defaults on
    pipe_loop = SamplePipeline(cfgs, kv_cache=False)
    assert pipe_kv.kv_cache and not pipe_loop.kv_cache

    t = tcfg.block_size
    dummy = jnp.zeros((1, t), jnp.int32)
    sampler_params = pipe_kv.denoiser.init(
        jax.random.key(2), dummy, dummy, dummy
    )["params"]
    params = {"sampler": sampler_params}
    b = 2
    segm = jnp.asarray(rng.integers(0, 16, (b, t)), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 3, (b, t)), jnp.int32)

    key = jax.random.key(9)
    out_kv = pipe_kv.sample_indices(params, key, segm, tex)
    out_loop = pipe_loop.sample_indices(params, key, segm, tex)
    np.testing.assert_array_equal(np.asarray(out_kv), np.asarray(out_loop))


def test_kv_decode_bf16_tracks_full_forward(rng):
    """Serving dtype (bfloat16) at a larger config: the cached decode's
    teacher-forced logits stay within bf16 noise of the full causal forward
    run in bf16."""
    import dataclasses

    import jax.numpy as jnp

    cfg = TransformerConfig(**AR_CFG_KW)
    cfg = dataclasses.replace(
        cfg, n_layers=4, n_emb=32, n_head=4, block_size=32, latent_shape=(8, 4),
        num_output_heads=3, texture_codebook_size=3,
    )
    b, t_len = 2, cfg.block_size
    c = cfg.head_class_num
    model = TransformerMultiHead(cfg, dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, t_len), jnp.int32)
    params = model.init(jax.random.key(0), dummy, dummy, dummy)["params"]
    segm = jnp.asarray(rng.integers(0, 8, (b, t_len)), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 3, (b, t_len)), jnp.int32)
    local = rng.integers(0, c, (b, t_len))
    cont = jnp.asarray(local + c * np.asarray(tex), jnp.int32)

    full = model.apply(
        {"params": params}, _shift_right(cont), segm, tex, select_heads=True
    )
    _, _, kv_logits = ar_decode_kv(
        jax.random.key(1), params, cfg, segm, tex,
        n_embed_per_head=c, forced_cont=cont, dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(kv_logits), np.asarray(full), atol=0.15, rtol=0.1
    )
