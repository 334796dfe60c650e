"""End-to-end pipeline smoke test on a tiny config (CPU-runnable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu.config import (
    FCNHeadConfig,
    QuantizerConfig,
    ShapeAttrConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.pipelines.sample import (
    PipelineConfigs,
    SamplePipeline,
    texture_mask_from_segm,
)

RES = 32  # height; width RES//2

TOP = VQGANConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    resolution=RES, z_channels=8, embed_dim=8,
)
TOP_QUANT = QuantizerConfig(n_embed=16, embed_dim=8, num_codebooks=3)
BOT = dataclasses.replace(TOP, ch=16, ch_mult=(1,), attn_resolutions=(32,))
BOT_QUANT = QuantizerConfig(n_embed=8, embed_dim=8, num_codebooks=3, spatial_size=2)
SEGM = dataclasses.replace(TOP, in_channels=24, out_ch=24)
SEGM_QUANT = QuantizerConfig(n_embed=16, embed_dim=8)
TF = TransformerConfig(
    codebook_size=48, segm_codebook_size=16, texture_codebook_size=3,
    n_emb=16, n_layers=2, n_head=2, block_size=128, latent_shape=(16, 8),
    num_output_heads=3,
)
IDX_UNET = UNetConfig(in_channels=8, base_channels=4, num_stages=3,
                      enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1))
IDX_FCN = FCNHeadConfig(in_channels=4, channels=4, num_classes=8, num_convs=1,
                        in_index=2, num_heads=3)
ATTR = ShapeAttrConfig(dim=4, out_dim=8, cls_num_list=(2, 3))
PG_UNET = UNetConfig(in_channels=1, base_channels=4, num_stages=3,
                     attr_embedding=8, enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1))
PG_FCN = FCNHeadConfig(in_channels=4, channels=4, num_classes=24, in_index=2)

CFGS = PipelineConfigs(
    top=TOP, top_quant=TOP_QUANT, bot=BOT, bot_quant=BOT_QUANT,
    segm=SEGM, segm_quant=SEGM_QUANT, transformer=TF,
    index_unet=IDX_UNET, index_fcn=IDX_FCN,
    shape_attr=ATTR, parsing_unet=PG_UNET, parsing_fcn=PG_FCN,
    sample_steps=8, num_segm_classes=24,
)


def _init_params(pipe: SamplePipeline, rng):
    b = 2
    img = jnp.zeros((b, RES, RES // 2, 3))
    mask = jnp.zeros((b, RES, RES // 2))
    segm = jnp.zeros((b, RES, RES // 2), jnp.int32)
    t = TF.block_size
    tok = jnp.zeros((1, t), jnp.int32)
    params = {
        "hierarchy": pipe.hierarchy.init(jax.random.key(0), img, mask)["params"],
        "segm": pipe.segm_vq.init(
            jax.random.key(1), jax.nn.one_hot(segm, 24, dtype=jnp.float32)
        )["params"],
        "sampler": pipe.denoiser.init(jax.random.key(2), tok, tok, tok)["params"],
    }
    ip_vars = pipe.index_pred.init(jax.random.key(3), jnp.zeros((1, 16, 8, 8)))
    params["index_pred"] = {
        "params": ip_vars["params"],
        "batch_stats": ip_vars.get("batch_stats", {}),
    }
    pg_vars = pipe.parsing_gen.init(
        jax.random.key(4), jnp.zeros((1, RES, RES // 2, 1)),
        jnp.zeros((1, 2), jnp.int32),
    )
    params["parsing_gen"] = {
        "params": pg_vars["params"],
        "batch_stats": pg_vars.get("batch_stats", {}),
    }
    return params


def test_texture_mask_from_segm():
    segm = jnp.asarray(
        [[[1, 4, 3], [5, 21, 2], [0, 9, 13]]], dtype=jnp.int32
    )
    upper = jnp.asarray([2])
    lower = jnp.asarray([17])  # absent -> stays 0
    outer = jnp.asarray([5])
    mask = texture_mask_from_segm(segm, upper, lower, outer)
    want = np.array([[[3, 3, 0], [0, 0, 6], [0, 0, 0]]], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(mask), want)


def test_sample_from_parsing_end_to_end(rng):
    pipe = SamplePipeline(CFGS)
    params = _init_params(pipe, rng)
    b = 2
    segm = jnp.asarray(rng.integers(0, 24, (b, RES, RES // 2)))
    texture_mask = jnp.asarray(rng.integers(0, 3, (b, RES, RES // 2)).astype(np.float32))
    imgs = pipe.sample_from_parsing(params, jax.random.key(0), segm, texture_mask)
    assert imgs.shape == (b, RES, RES // 2, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_sample_from_pose_end_to_end(rng):
    pipe = SamplePipeline(CFGS)
    params = _init_params(pipe, rng)
    b = 2
    pose = jnp.asarray(rng.standard_normal((b, RES, RES // 2, 1)).astype(np.float32))
    shape_attr = jnp.asarray(rng.integers(0, 2, (b, 2)))
    upper = jnp.asarray([0, 17])
    lower = jnp.asarray([1, 1])
    outer = jnp.asarray([17, 0])
    imgs, segm = pipe.sample_from_pose(
        params, jax.random.key(0), pose, shape_attr, upper, lower, outer
    )
    assert imgs.shape == (b, RES, RES // 2, 3)
    assert segm.shape == (b, RES, RES // 2)
    assert int(segm.max()) < 24
    assert np.isfinite(np.asarray(imgs)).all()


def test_sample_from_parsing_autoregressive_mode(rng):
    """sampler: 'autoregressive' decodes left-to-right through the same
    composite path (the causal trunk disables the fused attention kernel)."""
    import dataclasses as _dc

    cfgs = _dc.replace(
        CFGS, transformer=_dc.replace(TF, sampler="autoregressive")
    )
    pipe = SamplePipeline(cfgs)
    params = _init_params(pipe, rng)
    b = 2
    segm = jnp.asarray(rng.integers(0, 24, (b, RES, RES // 2)))
    texture_mask = jnp.asarray(
        rng.integers(0, 3, (b, RES, RES // 2)).astype(np.float32)
    )
    imgs = pipe.sample_from_parsing(params, jax.random.key(0), segm, texture_mask)
    assert imgs.shape == (b, RES, RES // 2, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_cast_sampler_params_bf16(rng):
    """The bf16 memory knob: every sampler float leaf except LayerNorm
    params is cast, other components untouched, and the pipeline still
    decodes cleanly with the cast tree (serve --bf16-sampler path)."""
    from text2human_tpu.pipelines.sample import cast_sampler_params

    pipe = SamplePipeline(CFGS)
    params = _init_params(pipe, rng)
    cast = cast_sampler_params(params)

    def check(path, leaf):
        parts = [str(getattr(p, "key", p)) for p in path]
        if any(p.startswith("ln") for p in parts):
            assert leaf.dtype == jnp.float32, parts
        elif np.issubdtype(leaf.dtype, np.floating):
            assert leaf.dtype == jnp.bfloat16, parts

    jax.tree_util.tree_map_with_path(check, cast["sampler"])
    # norms really exist in the tree (the exclusion must have matched)
    flat = jax.tree_util.tree_flatten_with_path(cast["sampler"])[0]
    assert any(
        "ln" in "".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in flat
    )
    # non-sampler components untouched
    jax.tree.map(
        lambda a, b: a.dtype == b.dtype or (_ for _ in ()).throw(AssertionError),
        cast["hierarchy"],
        params["hierarchy"],
    )

    b = 2
    segm = jnp.asarray(rng.integers(0, 24, (b, RES, RES // 2)))
    mask = jnp.asarray(rng.integers(0, 3, (b, RES, RES // 2)).astype(np.float32))
    imgs = pipe.sample_from_parsing(cast, jax.random.key(0), segm, mask, 4)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_conv_dtype_bf16_matches_f32(rng):
    """The fast preset's bf16 conv stages (with_conv_dtype): identical param
    tree (param_dtype stays f32, so one checkpoint serves both), deterministic
    stages numerically close to the f32 pipeline, f32 logits emitted."""
    from text2human_tpu.pipelines.sample import with_conv_dtype

    pipe = SamplePipeline(CFGS)
    cfgs16 = with_conv_dtype(CFGS, "bfloat16")
    assert cfgs16.top.compute_dtype == "bfloat16"
    assert cfgs16.parsing_unet.compute_dtype == "bfloat16"
    assert cfgs16.transformer is CFGS.transformer  # sampler untouched
    pipe16 = SamplePipeline(cfgs16)

    params = _init_params(pipe, rng)
    # same structure AND dtypes: the bf16 pipeline loads f32 checkpoints as-is
    params16 = _init_params(pipe16, rng)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params16
    )
    jax.tree.map(lambda a, b: None if a.dtype == b.dtype else 1 / 0, params, params16)

    b = 2
    pose = jnp.asarray(rng.standard_normal((b, RES, RES // 2, 1)).astype(np.float32))
    shape_attr = jnp.asarray(rng.integers(0, 2, (b, 2)))

    logits_f32 = pipe.generate_parsing(params, pose, shape_attr)
    logits_b16 = pipe16.generate_parsing(params, pose, shape_attr)
    # argmax parsing maps must agree except on near-ties
    agree = float(np.mean(np.asarray(logits_f32) == np.asarray(logits_b16)))
    assert agree > 0.95, agree

    segm = jnp.asarray(rng.integers(0, 24, (b, RES, RES // 2)))
    mask = jnp.asarray(rng.integers(0, 3, (b, RES, RES // 2)).astype(np.float32))
    t = CFGS.transformer.block_size
    h, w = CFGS.transformer.latent_shape
    top_local = jnp.asarray(
        rng.integers(0, CFGS.transformer.head_class_num, (b, t)), jnp.int32
    )
    img_f32 = np.asarray(pipe.decode(params, top_local, mask))
    img_b16 = np.asarray(pipe16.decode(params, top_local, mask))
    assert img_b16.dtype == np.float32
    # decode runs many bf16 convs; [0,1] images stay visually identical
    assert np.mean(np.abs(img_f32 - img_b16)) < 0.02
    assert np.isfinite(img_b16).all()


def test_with_conv_dtype_rejects_unknown():
    import pytest

    from text2human_tpu.pipelines.sample import with_conv_dtype

    with pytest.raises(ValueError, match="conv_dtype"):
        with_conv_dtype(CFGS, "float16")
