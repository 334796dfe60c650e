"""Absorbing-diffusion tests: masking statistics, loss behaviour, decode loop."""

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu.diffusion.absorbing import (
    AbsorbingDiffusion,
    q_sample,
    sample_loop,
    sample_time,
    train_loss,
)

DIFF = AbsorbingDiffusion(
    num_timesteps=1000, mask_id=36, num_tokens=12, n_embed_per_head=12
)


def test_sample_time_range():
    t, pt = sample_time(jax.random.key(0), 1000, 1000)
    t = np.asarray(t)
    assert t.min() >= 1 and t.max() <= 1000
    np.testing.assert_allclose(np.asarray(pt), 1e-3)


def test_q_sample_masking_statistics():
    """Masked fraction tracks t/T (transformer_model.py:218-220)."""
    x0 = jnp.zeros((4, 4096), dtype=jnp.int32)
    for t_val, expect in [(100, 0.1), (500, 0.5), (900, 0.9)]:
        t = jnp.full((4,), t_val)
        x_t, mask = q_sample(jax.random.key(1), x0, t, 1000, 36)
        frac = float(np.asarray(mask).mean())
        assert abs(frac - expect) < 0.03
        assert ((np.asarray(x_t) == 36) == np.asarray(mask)).all()


def test_train_loss_perfect_model_is_small():
    """A denoiser that puts all mass on the gt index gives ~zero loss."""
    b, t_len, k, c = 2, 12, 3, 12
    gt = jnp.asarray(np.random.default_rng(0).integers(0, c, (b, t_len)))
    tex = jnp.asarray(np.random.default_rng(1).integers(0, k, (b, t_len)))
    x0_cont = gt + c * tex

    def perfect(x_t):
        onehot = jax.nn.one_hot(gt, c) * 100.0
        return jnp.broadcast_to(onehot[:, :, None, :], (b, t_len, k, c))

    loss, vb, _ = train_loss(jax.random.key(0), DIFF, perfect, x0_cont, gt, tex)
    assert float(loss) < 1e-3

    def uniform(x_t):
        return jnp.zeros((b, t_len, k, c))

    loss_u, _, _ = train_loss(jax.random.key(0), DIFF, uniform, x0_cont, gt, tex)
    assert float(loss_u) > float(loss)


def test_sample_loop_unmasks_everything():
    b, t_len, k, c = 2, 12, 3, 12
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.integers(0, k, (b, t_len)))
    target = jnp.asarray(rng.integers(0, c, (b, t_len)))

    def denoise(x_t):
        onehot = jax.nn.one_hot(target, c) * 100.0
        return jnp.broadcast_to(onehot[:, :, None, :], (b, t_len, k, c))

    local, cont = jax.jit(
        lambda key: sample_loop(key, DIFF, denoise, tex, sample_steps=32)
    )(jax.random.key(0))
    local, cont = np.asarray(local), np.asarray(cont)
    assert (local >= 0).all(), "all positions must be unmasked"
    np.testing.assert_array_equal(local, np.asarray(target))
    np.testing.assert_array_equal(cont, local + c * np.asarray(tex))


def test_sample_loop_respects_temperature_determinism():
    """Same key -> same sample; different keys -> (almost surely) different."""
    b, t_len, k, c = 1, 12, 3, 12
    tex = jnp.zeros((b, t_len), dtype=jnp.int32)

    def noisy(x_t):
        return jnp.zeros((b, t_len, k, c))  # uniform logits

    l1, _ = sample_loop(jax.random.key(0), DIFF, noisy, tex, sample_steps=16)
    l2, _ = sample_loop(jax.random.key(0), DIFF, noisy, tex, sample_steps=16)
    l3, _ = sample_loop(jax.random.key(7), DIFF, noisy, tex, sample_steps=16)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert not np.array_equal(np.asarray(l1), np.asarray(l3))


def test_importance_time_sampling_warmup_and_skew(rng):
    """Before every t has >10 observations, sampling is uniform; once ready,
    high-loss timesteps are drawn more often (transformer_model.py:188-199)."""
    from text2human_tpu.diffusion.absorbing import (
        init_importance_state,
        sample_time_importance,
        update_importance_state,
    )

    T = 8
    state = init_importance_state(T)

    # warmup: counts are zero -> falls back to uniform over [1, T]
    t, pt = sample_time_importance(jax.random.key(0), 4096, T, state)
    t = np.asarray(t)
    assert t.min() >= 1 and t.max() <= T
    np.testing.assert_allclose(np.asarray(pt), 1.0 / T)
    counts = np.bincount(t, minlength=T + 1)[1:]
    assert counts.min() > 0.7 * 4096 / T  # roughly uniform

    # fill the history: timestep T has 100x the loss of the others
    vb = jnp.asarray([10.0 if tt == T else 1.0 for tt in range(1, T + 1)] * 20)
    ts = jnp.asarray(list(range(1, T + 1)) * 20, jnp.int32)
    state = update_importance_state(state, ts, vb)
    assert int(state["lt_count"][1]) == 20
    # EMA of squared losses converges toward vb^2
    assert float(state["lt_history"][T]) > float(state["lt_history"][1]) * 10

    t2, pt2 = sample_time_importance(jax.random.key(1), 4096, T, state)
    t2 = np.asarray(t2)
    counts2 = np.bincount(t2, minlength=T + 1)
    assert counts2[0] == 0  # t=0 excluded
    assert counts2[T] > 2 * counts2[1:T].mean()  # skewed toward the lossy t
    # pt matches the draw probabilities (importance weights)
    assert float(np.asarray(pt2)[t2 == T].mean()) > float(
        np.asarray(pt2)[t2 == 1].mean()
    )


def test_sampler_trainer_importance_mode(rng):
    """time_sampling='importance' threads the Lt buffers through TrainState."""
    from text2human_tpu.config import TransformerConfig
    from text2human_tpu.trainers.sampler import SamplerTrainConfig, SamplerTrainer

    cfg = TransformerConfig(
        codebook_size=12, segm_codebook_size=8, texture_codebook_size=2,
        n_emb=16, n_layers=1, n_head=2, block_size=16, latent_shape=(4, 4),
        num_output_heads=2,
    )
    import pytest

    with pytest.raises(ValueError, match="loss_type='elbo'"):
        SamplerTrainer(
            cfg,
            train_cfg=SamplerTrainConfig(
                time_sampling="importance", num_timesteps=10
            ),
        )
    trainer = SamplerTrainer(
        cfg,
        train_cfg=SamplerTrainConfig(
            time_sampling="importance", loss_type="elbo", num_timesteps=10
        ),
    )
    b, t = 4, cfg.block_size
    c = cfg.head_class_num
    tex = rng.integers(0, 2, (b, t))
    local = rng.integers(0, c, (b, t))
    tokens = {
        "x0_cont": jnp.asarray(local + c * tex, jnp.int32),
        "gt_local": jnp.asarray(local, jnp.int32),
        "segm_tokens": jnp.asarray(rng.integers(0, 8, (b, t)), jnp.int32),
        "texture_tokens": jnp.asarray(tex, jnp.int32),
    }
    state = trainer.init_state(jax.random.key(0))
    assert state.extra is not None and int(state.extra["lt_count"].sum()) == 0
    state, metrics = trainer.train_step(state, tokens, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.extra["lt_count"].sum()) == b  # one observation per sample
