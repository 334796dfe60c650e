"""Tiny-overfit END-TO-END learning harness (round-2 VERDICT item #1).

169 green tests proved forwards and single steps — nothing proved the
framework LEARNS.  This module trains ALL SIX jobs on a 4-sample structured
fixture set (data.datasets.OverfitFixtureDataset) at a res-32 geometry until
per-job thresholds, then assembles the freshly trained checkpoints into a
SamplePipeline (pipelines/assemble.py, through a real orbax save/load round
trip) and asserts the sampled image is decisively closer to the memorized
target than a random-init pipeline's output.

Reference behavior being matched: the train loops of
train_vqvae.py:86-128 / train_parsing_gen.py / train_parsing_token.py /
train_sampler.py / train_index_prediction.py producing checkpoints that
sample_from_parsing.py / sample_from_pose.py can actually use.

Each test trains one job (sequential module order; prerequisites skip if an
earlier job failed).  Thresholds carry 1.5-2x margin over calibrated runs;
a job that stops learning fails its own test.  ~12 min total on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.cli.builders import build_pipeline, build_trainer
from text2human_tpu.data.datasets import OverfitFixtureDataset
from text2human_tpu.data.loader import collate

pytestmark = pytest.mark.slow

RES = 32
TOP_KEYS = dict(double_z=False, z_channels=8, resolution=RES, in_channels=3,
                out_ch=3, ch=8, ch_mult=[1, 1, 2], num_res_blocks=1,
                attn_resolutions=[8], dropout=0.0)
BOT_KEYS = dict(double_z=False, z_channels=8, resolution=RES, in_channels=3,
                out_ch=3, ch=8, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[16], dropout=0.0)
SEGM_KEYS = dict(double_z=False, z_channels=8, resolution=RES, in_channels=24,
                 out_ch=24, ch=8, ch_mult=[1, 1, 2], num_res_blocks=1,
                 attn_resolutions=[8], dropout=0.0)

# artifacts shared across the sequential tests: host-side (numpy) snapshots
# only — the jitted train steps donate device buffers, so cross-job reuse of
# live state arrays would hit deleted-buffer errors
STATE = {}


def _pfx(keys, p):
    return {f"{p}{k}": v for k, v in keys.items()}


def _batch():
    if "batch" not in STATE:
        ds = OverfitFixtureDataset(length=4, resolution=RES)
        b = collate([ds[i] for i in range(len(ds))])
        STATE["batch"] = {
            k: jnp.asarray(v) for k, v in b.items() if not isinstance(v, list)
        }
    return STATE["batch"]


def _need(*keys):
    missing = [k for k in keys if k not in STATE]
    if missing:
        pytest.skip(f"prerequisite job(s) failed or skipped: {missing}")


def _snap(state):
    """Host snapshot of a TrainState's params (+batch_stats if present)."""
    out = {"params": jax.device_get(state.params)}
    bs = getattr(state, "batch_stats", None)
    if bs:
        out["batch_stats"] = jax.device_get(bs)
    return out


def test_overfit_segm_tokenizer():
    B = _batch()
    opt = {"model_type": "VQSegmentationModel", **SEGM_KEYS,
           "embed_dim": 8, "n_embed": 16, "num_segm_classes": 24, "lr": 1e-3}
    t = build_trainer(opt)
    state = t.init_state(jax.random.key(0), B["segm"])
    for i in range(250):
        state, log = t.train_step(state, B)
    rec = np.asarray(t.reconstruct(state.params, B["segm"]))
    acc = float((rec == np.asarray(B["segm"])).mean())
    assert acc > 0.95, f"segm tokenizer failed to memorize: acc={acc:.4f}"
    assert np.isfinite(float(log["train/total_loss"]))
    STATE["segm"] = _snap(state)


def _gan_l1(trainer, gen_params, B):
    dec, _ = trainer.model.apply(
        {"params": gen_params}, B["image"], B["texture_mask"]
    )
    return float(jnp.abs(dec - B["image"]).mean())


def test_overfit_top_vqgan():
    """The GAN trainer (explicit-VJP adaptive weight, disc from step 0,
    DiffAugment) converges to reconstructions — the round-2 VERDICT's
    'silent sign/scale bugs hide exactly here' job."""
    B = _batch()
    opt = {"model_type": "VQImageSegmTextureModel", "debug": True, **TOP_KEYS,
           "embed_dim": 8, "n_embed": 16, "disc_layers": 1, "ndf": 8,
           "disc_start_step": 0, "disc_weight_max": 1.0,
           "perceptual_weight": 1.0, "remat": False, "lr": 1.2e-3}
    t = build_trainer(opt)
    gen = t.init_gen_params(jax.random.key(0), B["image"], B["texture_mask"])
    state = t.init_state(jax.random.key(1), gen, B["image"])
    init_l1 = _gan_l1(t, state.params["gen"], B)
    for i in range(200):
        state, log = t.train_step(state, B, jax.random.key(i))
    l1 = _gan_l1(t, state.params["gen"], B)
    # calibrated: 0.63 -> 0.12 in 200 steps; require < 0.20 and a 3x drop
    assert l1 < 0.20, f"top VQGAN recon L1={l1:.4f} (init {init_l1:.4f})"
    assert l1 < init_l1 / 3.0, f"top VQGAN barely learned: {init_l1} -> {l1}"
    STATE["top"] = _snap(state)
    STATE["top_l1"] = l1


def test_overfit_hierarchy_vqgan():
    _need("top")
    B = _batch()
    opt = {"model_type": "HierarchyVQSpatialTextureAwareModel", "debug": True,
           **_pfx(TOP_KEYS, "top_"), **_pfx(BOT_KEYS, "bot_"),
           "embed_dim": 8, "n_embed": 16, "bot_n_embed": 8,
           "codebook_spatial_size": 2, "disc_layers": 1, "ndf": 8,
           "disc_start_step": 1, "disc_weight_max": 1.0,
           "perceptual_weight": 1.0, "remat": False, "lr": 1.2e-3}
    t = build_trainer(opt)
    gen = dict(t.init_gen_params(jax.random.key(0), B["image"], B["texture_mask"]))
    # warm-start the frozen top from job 2 (cli/train.py _load_into_gen)
    tg = STATE["top"]["params"]["gen"]
    gen.update(top_encoder=tg["encoder"], decoder=tg["decoder"],
               top_quantize=tg["quantize"], top_quant_conv=tg["quant_conv"],
               top_post_quant_conv=tg["post_quant_conv"])
    state = t.init_state(jax.random.key(1), gen, B["image"])
    for i in range(120):
        state, log = t.train_step(state, B, jax.random.key(i))
    l1 = _gan_l1(t, state.params["gen"], B)
    # calibrated: 0.15 -> 0.093 in 120 steps; the fused decode must BEAT the
    # top-only reconstruction (that is the hierarchy's entire purpose)
    assert l1 < 0.13, f"hierarchy recon L1={l1:.4f}"
    assert l1 < STATE["top_l1"], (
        f"bottom level did not improve the top-only recon: {l1:.4f} vs "
        f"{STATE['top_l1']:.4f}"
    )
    STATE["hier"] = _snap(state)


def test_overfit_sampler():
    _need("top", "segm")
    B = _batch()
    opt = {"model_type": "TransformerTextureAwareModel",
           **_pfx(TOP_KEYS, "img_"), "img_embed_dim": 8, "img_n_embed": 16,
           **_pfx(SEGM_KEYS, "segm_"), "segm_n_embed": 16, "segm_embed_dim": 8,
           "codebook_size": 288, "segm_codebook_size": 16,
           "texture_codebook_size": 18, "bert_n_emb": 16, "bert_n_layers": 2,
           "bert_n_head": 2, "block_size": 32, "latent_shape": [8, 4],
           "num_head": 18, "loss_type": "reweighted_elbo",
           "mask_schedule": "random", "sample_steps": 4, "lr": 3e-3}
    t = build_trainer(opt)
    tokens = t.tokenize(
        jax.tree.map(jnp.asarray, STATE["top"]["params"]["gen"]),
        jax.tree.map(jnp.asarray, STATE["segm"]["params"]),
        B,
    )
    state = t.init_state(jax.random.key(0))
    losses = []
    for i in range(350):
        state, m = t.train_step(state, tokens, jax.random.key(i))
        losses.append(float(m["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    # calibrated: 0.83 -> 0.003 in 350 steps
    assert last < 0.05, f"sampler loss plateaued at {last:.4f}"
    assert last < first / 10.0, (first, last)
    STATE["sampler"] = _snap(state)


def test_overfit_index_prediction():
    _need("hier")
    B = _batch()
    opt = {"model_type": "VQGANTextureAwareSpatialHierarchyInferenceModel",
           **_pfx(TOP_KEYS, "top_"), **_pfx(BOT_KEYS, "bot_"),
           "embed_dim": 8, "n_embed": 16, "bot_n_embed": 8,
           "codebook_spatial_size": 2, "encoder_in_channels": 8,
           "unet_base_channels": 8, "unet_num_stages": 3,
           "fc_in_channels": 8, "fc_in_index": 2, "fc_channels": 8,
           "fc_num_convs": 1, "fc_num_classes": 8, "fc_dropout_ratio": 0.1,
           "optimizer": "Adam", "lr": 1e-3}
    t = build_trainer(opt)
    data = t.prepare(jax.tree.map(jnp.asarray, STATE["hier"]["params"]["gen"]), B)
    state = t.init_state(jax.random.key(0), data["feature_top"])
    for i in range(200):
        state, m = t.train_step(state, data, jax.random.key(i))
    ev = t.eval_step(state.params, state.batch_stats, data)
    acc = float(ev["accuracy"])
    # calibrated: 1.00 at 200 steps
    assert acc > 0.9, f"index prediction region acc={acc:.4f}"
    STATE["index"] = _snap(state)


def test_overfit_parsing_generation():
    B = _batch()
    opt = {"model_type": "ParsingGenModel",
           "embedder_dim": 4, "embedder_out_dim": 16,
           "attr_class_num": [2] * 15, "encoder_in_channels": 1,
           "unet_base_channels": 8, "unet_num_stages": 3,
           "fc_in_channels": 8, "fc_in_index": 2, "fc_channels": 8,
           "fc_num_convs": 1, "fc_num_classes": 24, "fc_dropout_ratio": 0.1,
           "lr": 1e-3}
    t = build_trainer(opt)
    state = t.init_state(jax.random.key(0), B["densepose"], B["attr"])
    for i in range(300):
        state, m = t.train_step(state, B, jax.random.key(i))
    ev = t.eval_step(state.params, state.batch_stats, B)
    acc = float(ev["accuracy"])  # reference-style PERCENT accuracy
    # calibrated: 84% at 300 steps (densepose is an invertible fn of segm)
    assert acc > 70.0, f"parsing generation pixel acc={acc:.2f}%"
    STATE["parsing"] = _snap(state)


def _pipeline_opt():
    return {"model_type": "SampleFromPoseModel", "synthetic_resolution": RES,
            "embed_dim": 8, "n_embed": 16,
            "bot_n_embed": 8, "bot_codebook_spatial_size": 2,
            **_pfx(BOT_KEYS, "bot_"), **_pfx(TOP_KEYS, "top_"),
            "index_pred_encoder_in_channels": 8,
            "index_pred_unet_base_channels": 8, "index_pred_unet_num_stages": 3,
            "index_pred_fc_in_channels": 8, "index_pred_fc_in_index": 2,
            "index_pred_fc_channels": 8, "index_pred_fc_num_convs": 1,
            "index_pred_fc_concat_input": False,
            "index_pred_fc_dropout_ratio": 0.1, "index_pred_fc_num_classes": 8,
            **_pfx(SEGM_KEYS, "segm_"), "segm_num_segm_classes": 24,
            "segm_n_embed": 16, "segm_embed_dim": 8,
            "codebook_size": 288, "segm_codebook_size": 16,
            "texture_codebook_size": 18, "bert_n_emb": 16, "bert_n_layers": 2,
            "bert_n_head": 2, "block_size": 32, "latent_shape": [8, 4],
            "num_head": 18,
            "shape_embedder_dim": 4, "shape_embedder_out_dim": 16,
            "shape_attr_class_num": [2] * 15, "shape_encoder_in_channels": 1,
            "shape_unet_base_channels": 8, "shape_unet_num_stages": 3,
            "shape_fc_in_channels": 8, "shape_fc_in_index": 2,
            "shape_fc_channels": 8, "shape_fc_num_convs": 1,
            "shape_fc_concat_input": False, "shape_fc_dropout_ratio": 0.1,
            "shape_fc_num_classes": 24,
            "manual_seed": 0, "sample_steps": 4}


def test_overfit_e2e_pipeline(tmp_path):
    """The freshly trained six checkpoints, assembled through a REAL orbax
    save/load + pipelines/assemble round trip, reproduce the memorized
    targets decisively better than a random-init pipeline."""
    _need("segm", "top", "hier", "sampler", "index", "parsing")
    from text2human_tpu.pipelines.assemble import (
        assemble_pipeline_from_checkpoints,
    )
    from text2human_tpu.utils.checkpoint import save_checkpoint

    B = _batch()
    paths = {}
    for name in ("top", "hier", "segm", "sampler", "index", "parsing"):
        paths[name] = str(tmp_path / name)
        save_checkpoint(paths[name], {"state": STATE[name], "epoch": 0})
    params = assemble_pipeline_from_checkpoints(
        paths["top"], paths["hier"], paths["segm"], paths["sampler"],
        paths["index"], paths["parsing"],
    )

    opt = _pipeline_opt()
    pipe = build_pipeline(opt)
    target = np.asarray((B["image"] + 1.0) / 2.0)

    img = pipe.sample_from_parsing(
        params, jax.random.key(0), B["segm"], B["texture_mask"], 4
    )
    trained_l1 = float(np.abs(np.asarray(img) - target).mean())

    from text2human_tpu.cli.sample import load_params

    rnd = load_params(pipe, opt, synthetic=True)
    img_r = pipe.sample_from_parsing(
        rnd, jax.random.key(0), B["segm"], B["texture_mask"], 4
    )
    random_l1 = float(np.abs(np.asarray(img_r) - target).mean())

    # calibrated: 0.048 trained vs 0.28 random
    assert trained_l1 < 0.12, f"trained pipeline L1={trained_l1:.4f}"
    assert trained_l1 < 0.5 * random_l1, (
        f"trained pipeline ({trained_l1:.4f}) not decisively closer than "
        f"random init ({random_l1:.4f})"
    )

    # pose path: stage I reproduces the memorized parsing maps
    segm_pred = np.asarray(
        pipe.generate_parsing(
            params, B["densepose"], B["shape_attr"].astype(jnp.int32)
        )
    )
    acc = float((segm_pred == np.asarray(B["segm"])).mean())
    assert acc > 0.7, f"pose->parsing acc={acc:.4f}"

    # fast-decode quality proxy ON TRAINED WEIGHTS (the docstring promise in
    # diffusion/absorbing.py:sample_maskgit): the confidence-ordered decode
    # at 8 steps must also reproduce the memorized target, within 1.5x of
    # the reference schedule's error and decisively below random init
    pipe_fast = build_pipeline({**opt, "decode_mode": "maskgit"})
    img_f = pipe_fast.sample_from_parsing(
        params, jax.random.key(0), B["segm"], B["texture_mask"], 8
    )
    fast_l1 = float(np.abs(np.asarray(img_f) - target).mean())
    assert fast_l1 < 0.12, f"maskgit pipeline L1={fast_l1:.4f}"
    assert fast_l1 < max(1.5 * trained_l1, trained_l1 + 0.02), (
        f"maskgit quality delta too large: {fast_l1:.4f} vs "
        f"{trained_l1:.4f} (reference schedule)"
    )
