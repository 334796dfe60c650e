"""One-step smoke tests for every trainer on tiny configs (the reference's
'debug' convention, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.config import (
    FCNHeadConfig,
    QuantizerConfig,
    ShapeAttrConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.trainers.gan import GANTrainConfig
from text2human_tpu.trainers.hierarchy import (
    HierarchyVQGANTrainer,
    hierarchy_trainable_mask,
)
from text2human_tpu.trainers.index_pred import IndexPredTrainer
from text2human_tpu.trainers.parsing_gen import ParsingGenTrainer
from text2human_tpu.trainers.sampler import SamplerTrainer
from text2human_tpu.trainers.segm_tokenizer import (
    SegmTokenizerConfig,
    SegmTokenizerTrainer,
)
from text2human_tpu.trainers.top_vqgan import TopVQGANTrainer
from text2human_tpu.models.vqgan import Discriminator

# 32x16 test images need a shallow PatchGAN: 3 stride-2 layers would shrink
# the map to zero width.
TINY_DISC = Discriminator(ndf=8, n_layers=1)

TINY_IMG = VQGANConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    resolution=32, z_channels=8, embed_dim=8,
)
TINY_QUANT = QuantizerConfig(n_embed=16, embed_dim=8, num_codebooks=3)
TINY_SEGM = dataclasses.replace(TINY_IMG, in_channels=6, out_ch=6)
TINY_SEGM_QUANT = QuantizerConfig(n_embed=16, embed_dim=8)


def _img_batch(rng, b=2, res=32):
    return {
        "image": jnp.asarray(rng.standard_normal((b, res, res // 2, 3)).astype(np.float32)),
        "texture_mask": jnp.asarray(
            rng.integers(0, 3, (b, res, res // 2)).astype(np.float32)
        ),
        "segm": jnp.asarray(rng.integers(0, 6, (b, res, res // 2))),
    }


def test_segm_tokenizer_step(rng):
    trainer = SegmTokenizerTrainer(
        TINY_SEGM, TINY_SEGM_QUANT, SegmTokenizerConfig(num_segm_classes=6)
    )
    batch = _img_batch(rng)
    state = trainer.init_state(jax.random.key(0), batch["segm"])
    before = float(jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), state.params, 0.0))
    state, log = trainer.train_step(state, batch)
    assert np.isfinite(float(log["train/total_loss"]))
    after = float(jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), state.params, 0.0))
    assert before != after
    log2 = trainer.eval_step(state.params, batch)
    assert "val/bce_loss" in log2


def test_top_vqgan_gan_step(rng):
    trainer = TopVQGANTrainer(
        TINY_IMG, TINY_QUANT, GANTrainConfig(disc_start_step=0), disc=TINY_DISC
    )
    batch = _img_batch(rng)
    gen_params = trainer.init_gen_params(
        jax.random.key(0), batch["image"], batch["texture_mask"]
    )
    state = trainer.init_state(jax.random.key(1), gen_params, batch["image"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    for k in ["loss", "nll_loss", "g_loss", "d_weight", "d_loss", "l1", "perceptual"]:
        assert np.isfinite(float(metrics[k])), k
    # second step reuses compiled fn
    state, m2 = trainer.train_step(state, batch, jax.random.key(3))
    assert int(state.step) == 2
    ev = trainer.eval_loss(state.params["gen"], batch)
    assert np.isfinite(float(ev["nll_loss"]))


def test_disc_gate_blocks_updates_before_start(rng):
    trainer = TopVQGANTrainer(
        TINY_IMG, TINY_QUANT, GANTrainConfig(disc_start_step=1000), disc=TINY_DISC
    )
    batch = _img_batch(rng)
    gen_params = trainer.init_gen_params(
        jax.random.key(0), batch["image"], batch["texture_mask"]
    )
    state = trainer.init_state(jax.random.key(1), gen_params, batch["image"])
    disc_before = jax.tree.map(np.asarray, state.params["disc"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    disc_after = state.params["disc"]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, np.asarray(b)),
        disc_before,
        disc_after,
    )
    # d_weight gated to 0 before disc_start_step
    assert float(metrics["d_weight"]) == 0.0


def test_hierarchy_mask_and_step(rng):
    # bottom latent must live at the top decoder's first-upsample resolution
    # (here 32x16, one fewer downsampling level) with DecoderRes channels equal
    # to top ch * ch_mult[-1].
    bot_cfg = dataclasses.replace(
        TINY_IMG, ch=16, ch_mult=(1,), attn_resolutions=(32,)
    )
    bot_quant = QuantizerConfig(n_embed=8, embed_dim=8, num_codebooks=3, spatial_size=2)
    trainer = HierarchyVQGANTrainer(
        TINY_IMG, TINY_QUANT, bot_cfg, bot_quant,
        GANTrainConfig(disc_start_step=0),
        disc=TINY_DISC,
        sample_shape=(1, 32, 16, 3),
    )
    batch = _img_batch(rng)
    gen_params = trainer.init_gen_params(
        jax.random.key(0), batch["image"], batch["texture_mask"]
    )
    mask = hierarchy_trainable_mask(gen_params, fix_decoder=False)
    # top params frozen, bottom params trainable
    assert not jax.tree.leaves(mask["top_encoder"])[0]
    assert jax.tree.leaves(mask["bot_encoder"])[0]
    # decoder: up levels train EXCEPT the deepest (reference only enumerates
    # up.0..up.3 of 5 levels, hierarchy_vqgan_model.py:145-154); here the
    # deepest of the 2-level decoder is up_1
    flat = jax.tree_util.tree_flatten_with_path(mask["decoder"])[0]
    for path, v in flat:
        name = path[0].key
        want = name.startswith("up_") and not name.startswith("up_1")
        assert v == want, name

    state = trainer.init_state(jax.random.key(1), gen_params, batch["image"])
    before = jax.tree.map(np.asarray, state.params["gen"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    # EVERY mask=False leaf must be bit-identical after the step — including
    # decoder leaves with nonzero gradients (conv_in/mid/conv_out/up_deepest).
    # optax.masked alone passes raw grads through for frozen leaves; the
    # optimizer must explicitly zero them (trainers/base.py make_optimizer).
    changed_frozen = []
    trainable_moved = []

    def check(path, m, a, b):
        same = np.array_equal(a, np.asarray(b))
        if not m and not same:
            changed_frozen.append(jax.tree_util.keystr(path))
        if m and not same:
            trainable_moved.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(
        check, mask, before, state.params["gen"]
    )
    assert not changed_frozen, changed_frozen
    assert trainable_moved  # the step actually trained something


TINY_TF = TransformerConfig(
    codebook_size=48,
    segm_codebook_size=16,
    texture_codebook_size=3,
    n_emb=16,
    n_layers=2,
    n_head=2,
    block_size=32,  # 8x4 latent of a 32-res image with 2 levels... match below
    latent_shape=(8, 4),
    num_output_heads=3,
)


def test_sampler_trainer_step(rng):
    tf_cfg = dataclasses.replace(TINY_TF, block_size=128, latent_shape=(16, 8))
    trainer = SamplerTrainer(
        tf_cfg,
        TINY_IMG,
        dataclasses.replace(TINY_QUANT, n_embed=16),
        TINY_SEGM,
        TINY_SEGM_QUANT,
    )
    batch = _img_batch(rng)
    img_params = trainer.img_vq.init(
        jax.random.key(0), batch["image"], batch["texture_mask"]
    )["params"]
    segm_params = trainer.segm_vq.init(
        jax.random.key(1),
        jax.nn.one_hot(batch["segm"], 6, dtype=jnp.float32),
    )["params"]
    tokens = trainer.tokenize(img_params, segm_params, batch)
    assert tokens["x0_cont"].shape == (2, 128)
    assert int(tokens["texture_tokens"].max()) < 3
    state = trainer.init_state(jax.random.key(2))
    state, metrics = trainer.train_step(state, tokens, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    # sampling produces fully-unmasked local indices
    local, cont = trainer.sample(
        state.params,
        tokens["segm_tokens"],
        tokens["texture_tokens"],
        jax.random.key(4),
        sample_steps=8,
    )
    assert (np.asarray(local) >= 0).all()
    np.testing.assert_array_equal(
        np.asarray(cont),
        np.asarray(local) + 16 * np.asarray(tokens["texture_tokens"]),
    )


def test_index_pred_trainer_step(rng):
    bot_cfg = dataclasses.replace(
        TINY_IMG, ch=16, ch_mult=(1,), attn_resolutions=(32,)
    )
    bot_quant = QuantizerConfig(n_embed=8, embed_dim=8, num_codebooks=3, spatial_size=2)
    unet_cfg = UNetConfig(
        in_channels=8, base_channels=4, num_stages=3,
        enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1),
    )
    fcn_cfg = FCNHeadConfig(
        in_channels=4, channels=4, num_classes=8, num_convs=1,
        in_index=2, num_heads=3,
    )
    trainer = IndexPredTrainer(
        unet_cfg, fcn_cfg, TINY_IMG, TINY_QUANT, bot_cfg, bot_quant
    )
    batch = _img_batch(rng)
    vq_params = trainer.hierarchy.init(
        jax.random.key(0), batch["image"], batch["texture_mask"]
    )["params"]
    data = trainer.prepare(vq_params, batch)
    assert data["feature_top"].shape == (2, 16, 8, 8)
    assert data["gt_indices"].shape == (2, 16, 8)  # 32x16 bot latent / 2x2 patches
    state = trainer.init_state(jax.random.key(1), data["feature_top"])
    state, metrics = trainer.train_step(state, data, jax.random.key(2))
    assert np.isfinite(float(metrics["loss_total"]))
    ev = trainer.eval_step(state.params, state.batch_stats, data)
    assert 0.0 <= float(ev["accuracy"]) <= 1.0


def test_parsing_gen_trainer_step(rng):
    attr_cfg = ShapeAttrConfig(dim=4, out_dim=8, cls_num_list=(2, 3))
    unet_cfg = UNetConfig(
        in_channels=1, base_channels=4, num_stages=3, attr_embedding=8,
        enc_num_convs=(1, 1, 1), dec_num_convs=(1, 1),
    )
    fcn_cfg = FCNHeadConfig(in_channels=4, channels=4, num_classes=6, in_index=2)
    trainer = ParsingGenTrainer(attr_cfg, unet_cfg, fcn_cfg)
    batch = {
        "densepose": jnp.asarray(rng.standard_normal((2, 16, 8, 1)).astype(np.float32)),
        "attr": jnp.asarray(rng.integers(0, 2, (2, 2))),
        "segm": jnp.asarray(rng.integers(0, 6, (2, 16, 8))),
    }
    state = trainer.init_state(jax.random.key(0), batch["densepose"], batch["attr"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss_total"]))
    ev = trainer.eval_step(state.params, state.batch_stats, batch)
    assert ev["pred"].shape == (2, 16, 8)


def test_top_vqgan_bf16_step(rng):
    """Mixed-precision conv stacks: step runs and stays finite."""
    cfg = dataclasses.replace(TINY_IMG, compute_dtype="bfloat16", remat=True)
    trainer = TopVQGANTrainer(
        cfg, TINY_QUANT, GANTrainConfig(disc_start_step=0), disc=TINY_DISC
    )
    batch = _img_batch(rng)
    gen_params = trainer.init_gen_params(
        jax.random.key(0), batch["image"], batch["texture_mask"]
    )
    # params stay fp32 under mixed precision
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(gen_params)
    )
    state = trainer.init_state(jax.random.key(1), gen_params, batch["image"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_sampler_training_reduces_loss(rng):
    """Optimizer plumbing sanity: 40 steps on a fixed tiny batch overfit it."""
    from text2human_tpu.trainers.sampler import SamplerTrainConfig

    tf_cfg = dataclasses.replace(TINY_TF, block_size=32, latent_shape=(8, 4))
    trainer = SamplerTrainer(tf_cfg, train_cfg=SamplerTrainConfig(lr=3e-3))
    b, t, c = 4, 32, tf_cfg.head_class_num
    tex = rng.integers(0, 3, (b, t))
    local = rng.integers(0, c, (b, t))
    tokens = {
        "x0_cont": jnp.asarray(local + c * tex, jnp.int32),
        "gt_local": jnp.asarray(local, jnp.int32),
        "segm_tokens": jnp.asarray(rng.integers(0, 16, (b, t)), jnp.int32),
        "texture_tokens": jnp.asarray(tex, jnp.int32),
    }
    state = trainer.init_state(jax.random.key(0))
    losses = []
    for i in range(40):
        state, m = trainer.train_step(state, tokens, jax.random.key(i))
        losses.append(float(m["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.75, (first, last)


def test_gan_constant_weight_option(rng):
    """adaptive_weight=False uses the constant disc_weight_max."""
    trainer = TopVQGANTrainer(
        TINY_IMG, TINY_QUANT,
        GANTrainConfig(disc_start_step=0, adaptive_weight=False, disc_weight_max=0.5),
        disc=TINY_DISC,
    )
    batch = _img_batch(rng)
    gen = trainer.init_gen_params(jax.random.key(0), batch["image"], batch["texture_mask"])
    state = trainer.init_state(jax.random.key(1), gen, batch["image"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    assert float(metrics["d_weight"]) == 0.5
    assert np.isfinite(float(metrics["loss"]))


def test_gan_gen_grads_match_naive_value_and_grad(rng):
    """The VJP-restructured generator step (one AE + one LPIPS/disc forward,
    shared head backwards) must produce exactly the gradients of the naive
    value_and_grad formulation it replaced (VERDICT round-1 weak #3)."""
    from text2human_tpu.losses.vqgan_loss import (
        adopt_weight,
        calculate_adaptive_weight,
        diff_augment,
    )
    from text2human_tpu.trainers.gan import conv2d_same

    trainer = TopVQGANTrainer(
        TINY_IMG, TINY_QUANT, GANTrainConfig(disc_start_step=0), disc=TINY_DISC
    )
    cfg = trainer.cfg
    batch = _img_batch(rng)
    x, mask_ = batch["image"], batch["texture_mask"]
    gen_params = trainer.init_gen_params(jax.random.key(0), x, mask_)
    state = trainer.init_state(jax.random.key(1), gen_params, x)
    disc_params = state.params["disc"]
    disc_stats = state.batch_stats["disc"]

    key = jax.random.key(2)
    aug_key, _ = jax.random.split(key)

    # -- naive formulation (the pre-restructure train step, verbatim) --------
    def naive_loss(gp):
        xrec, qloss, a_pre = trainer.ae_apply(gp, x, mask_)

        def heads(xr):
            recon = jnp.abs(x - xr)
            p = trainer.lpips.apply(trainer.lpips_vars, x, xr)
            nll = jnp.mean(recon + cfg.perceptual_weight * p)
            xr_in = diff_augment(aug_key, xr, cfg.policy)
            logits_fake, _ = trainer.disc.apply(
                {"params": disc_params, "batch_stats": disc_stats},
                xr_in,
                train=True,
                mutable=["batch_stats"],
            )
            return nll, -jnp.mean(logits_fake)

        (nll, g_loss), head_vjp = jax.vjp(heads, xrec)
        (d_nll_dx,) = head_vjp((jnp.ones(()), jnp.zeros(())))
        (d_g_dx,) = head_vjp((jnp.zeros(()), jnp.ones(())))
        w = gp["decoder"]["conv_out"]
        a_sg = jax.lax.stop_gradient(a_pre)
        _, conv_vjp = jax.vjp(
            lambda wv: conv2d_same(a_sg, wv["kernel"], wv["bias"]), w
        )
        (nll_gw,) = conv_vjp(d_nll_dx)
        (g_gw,) = conv_vjp(d_g_dx)
        d_weight = calculate_adaptive_weight(
            nll_gw["kernel"], g_gw["kernel"], cfg.disc_weight_max
        )
        d_weight = d_weight * adopt_weight(1.0, state.step, cfg.disc_start_step)
        return nll + d_weight * g_loss + qloss

    naive_grads = jax.jit(jax.grad(naive_loss))(gen_params)

    # -- the trainer's restructured gradients ---------------------------------
    got_grads, _, _ = jax.jit(trainer.gen_grads_and_metrics)(
        gen_params, disc_params, disc_stats, state.step, x, mask_, aug_key
    )

    # the two formulations compile to differently-fused XLA programs, so
    # expect f32 reordering noise (~1e-3 relative), not bit equality; leaves
    # whose true gradient is ~0 are compared against the global grad scale
    global_scale = max(
        float(np.max(np.abs(x))) for x in jax.tree.leaves(naive_grads)
    )

    def check(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1e-5 * global_scale, rtol=5e-3)

    jax.tree.map(check, got_grads, naive_grads)


def test_plain_image_vqgan_no_mask(rng):
    """VQImageModel path: single shared codebook, no texture mask in the batch
    (reference models/vqgan_model.py:245-344)."""
    trainer = TopVQGANTrainer(
        TINY_IMG,
        dataclasses.replace(TINY_QUANT, num_codebooks=1),
        GANTrainConfig(disc_start_step=0),
        disc=TINY_DISC,
    )
    batch = {"image": _img_batch(rng)["image"]}  # no texture_mask key
    gen = trainer.init_gen_params(jax.random.key(0), batch["image"], None)
    state = trainer.init_state(jax.random.key(1), gen, batch["image"])
    state, metrics = trainer.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_weight_decay_matches_torch_coupled_l2():
    """make_optimizer's weight decay must be COUPLED (torch.optim.Adam/SGD
    add wd*param to the grad BEFORE moment accumulation), not decoupled
    AdamW-style — the parity target for any config with weight_decay > 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from text2human_tpu.trainers.base import make_optimizer

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(6).astype(np.float32)
    grads = [rng.standard_normal(6).astype(np.float32) for _ in range(3)]
    wd, lr = 0.1, 1e-2

    for name, kwargs, make_t in (
        ("Adam", dict(betas=(0.9, 0.999)),
         lambda p: torch.optim.Adam([p], lr=lr, weight_decay=wd)),
        ("SGD", dict(momentum=0.9),
         lambda p: torch.optim.SGD([p], lr=lr, momentum=0.9, weight_decay=wd)),
    ):
        tp = torch.nn.Parameter(torch.tensor(w0))
        opt_t = make_t(tp)
        for g in grads:
            opt_t.zero_grad()
            tp.grad = torch.tensor(g)
            opt_t.step()

        tx = make_optimizer(lr=lr, weight_decay=wd, optimizer=name, **kwargs)
        wj = jnp.asarray(w0)
        state = tx.init(wj)
        for g in grads:
            updates, state = tx.update(jnp.asarray(g), state, wj)
            wj = wj + updates
        np.testing.assert_allclose(
            np.asarray(wj), tp.detach().numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"{name} weight-decay semantics diverge from torch",
        )
