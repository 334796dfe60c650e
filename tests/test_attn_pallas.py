"""Fused whole-sequence attention kernel vs the XLA einsum reference
(interpret mode on CPU; the same code path runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.ops.attn_pallas import fused_attention, fused_attention_btc


def _reference(q, k, v, n_head, scale):
    b, t, c = q.shape
    d = c // n_head
    qh = q.reshape(b, t, n_head, d)
    kh = k.reshape(b, t, n_head, d)
    vh = v.reshape(b, t, n_head, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(b, t, c)


def test_fused_attention_btc_matches_einsum(rng):
    b, t, n_head, d = 2, 128, 4, 64
    c = n_head * d
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    got = fused_attention_btc(q, k, v, n_head=n_head, sm_scale=scale, interpret=True)
    want = _reference(q, k, v, n_head, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_attention_btc_bf16(rng):
    b, t, n_head, d = 1, 128, 2, 64
    c = n_head * d
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    got = fused_attention_btc(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        n_head=n_head,
        sm_scale=scale,
        interpret=True,
    ).astype(jnp.float32)
    want = _reference(q, k, v, n_head, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_fused_attention_bhtd_matches_einsum(rng):
    b, h, t, d = 2, 3, 64, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    got = fused_attention(q, k, v, sm_scale=scale, interpret=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_self_attention_flash_matches_einsum(rng):
    """SelfAttention(flash=True) (interpret off-TPU) == the einsum path."""
    from text2human_tpu.models.transformer import SelfAttention

    x = jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32))
    mod = SelfAttention(n_head=2)
    params = mod.init(jax.random.key(0), x)["params"]
    base = mod.apply({"params": params}, x)
    flash = SelfAttention(n_head=2, flash=True).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(base), atol=1e-5)


def test_flash_causal_raises(rng):
    from text2human_tpu.models.transformer import SelfAttention

    x = jnp.zeros((1, 8, 16))
    mod = SelfAttention(n_head=2, flash=True, causal=True)
    with pytest.raises(ValueError, match="non-causal"):
        mod.init(jax.random.key(0), x)


def test_fused_attention_btc_block_heads(rng):
    """Partial-head grid blocks (2 heads x 64 dims = 128 lanes) match the
    all-heads default.  (Measured on v5e: all-heads per batch element is the
    fastest config at every batch size; the knob exists for tuning.)"""
    b, t, n_head, d = 2, 128, 4, 64
    c = n_head * d
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    full = fused_attention_btc(q, k, v, n_head=n_head, sm_scale=scale, interpret=True)
    split = fused_attention_btc(
        q, k, v, n_head=n_head, sm_scale=scale, block_heads=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(split), np.asarray(full), atol=1e-6)


def test_fused_attention_backward_matches_autodiff(rng):
    """Custom-VJP backward kernel == autodiff through the einsum reference."""
    from text2human_tpu.ops.attn_pallas import fused_attention_btc_trainable

    b, t, n_head, d = 2, 64, 2, 64
    c = n_head * d
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    def loss_fused(q, k, v):
        o = fused_attention_btc_trainable(
            q, k, v, n_head=n_head, sm_scale=scale, interpret=True
        )
        return jnp.sum(o * co)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, n_head, scale) * co)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_fused, g_ref, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_fused_attention_backward_head_blocked(rng):
    """At the full C=512 trunk width the backward kernel blocks over heads
    (whole-C blocks bust the 16 MB scoped-VMEM limit at b>=32 on v5e);
    head blocks are exact, so gradients still match autodiff."""
    from text2human_tpu.ops.attn_pallas import fused_attention_btc_trainable

    b, t, n_head, d = 1, 32, 8, 64
    c = n_head * d  # 512 -> block_heads=4, two grid blocks per batch elt
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    def loss_fused(q, k, v):
        o = fused_attention_btc_trainable(
            q, k, v, n_head=n_head, sm_scale=scale, interpret=True
        )
        return jnp.sum(o * co)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, n_head, scale) * co)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_fused, g_ref, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_transformer_train_step_with_flash(rng):
    """The sampler training loss differentiates through the fused kernel and
    matches the einsum path's gradients."""
    from text2human_tpu.config import TransformerConfig
    from text2human_tpu.models.transformer import TransformerMultiHead

    cfg = TransformerConfig(
        codebook_size=12, segm_codebook_size=8, texture_codebook_size=2,
        n_emb=128, n_layers=1, n_head=2, block_size=16, latent_shape=(4, 4),
        num_output_heads=2,
    )
    model = TransformerMultiHead(cfg)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    segm = jnp.asarray(rng.integers(0, 8, (2, 16)), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 2, (2, 16)), jnp.int32)
    params = model.init(jax.random.key(0), tok, tok, tok)["params"]

    def loss(p, flash):
        out = model.apply({"params": p}, tok, segm, tex, flash=flash)
        return jnp.mean(out ** 2)

    g_flash = jax.grad(lambda p: loss(p, True))(params)
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    scale = max(float(np.max(np.abs(x))) for x in jax.tree.leaves(g_ref))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5 * scale, rtol=2e-4
        ),
        g_flash,
        g_ref,
    )


def test_flash_serves_checkpoints_trained_with_attn_dropout(rng):
    """attn_pdrop > 0 must not block the fused kernel at inference —
    dropout is a no-op when deterministic (serving a dropout-trained
    checkpoint through SamplePipeline's auto-flash must work)."""
    from text2human_tpu.models.transformer import SelfAttention

    x = jnp.asarray(rng.standard_normal((1, 64, 128)).astype(np.float32))
    mod = SelfAttention(n_head=2, flash=True, attn_pdrop=0.1, deterministic=True)
    params = mod.init(jax.random.key(0), x)["params"]
    out = mod.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out)).all()
    # training (deterministic=False) still refuses
    with pytest.raises(ValueError, match="dropout"):
        SelfAttention(
            n_head=2, flash=True, attn_pdrop=0.1, deterministic=False
        ).init(jax.random.key(0), x)


def test_block_heads_must_divide_n_head(rng):
    """A block_heads value that passes the lane check but does not divide
    n_head must fall back to all-heads (never skip head columns)."""
    b, t, n_head, d = 1, 32, 3, 128  # block_heads=2 -> 256 lanes OK, 3 % 2 != 0
    c = n_head * d
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    out = fused_attention_btc(
        q, q, q, n_head=n_head, sm_scale=0.1, block_heads=2, interpret=True
    )
    want = fused_attention_btc(q, q, q, n_head=n_head, sm_scale=0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_partitioned_kernel_shards_batch_and_heads(rng):
    """The custom_partitioning rule must genuinely split the kernel — local
    per-device shapes in the compiled module, no all-gather — over a dp x tp
    mesh, with exact-equal output (forward) and matching gradients (backward),
    and T forced replicated."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from text2human_tpu.ops.attn_pallas import fused_attention_btc_trainable

    b, t, n_head, d = 8, 64, 8, 64
    c = n_head * d
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))

    def attn(q, k, v):
        return fused_attention_btc_trainable(
            q, k, v, n_head=n_head, sm_scale=scale, interpret=True
        )

    ref = attn(q, k, v)
    g_ref = jax.grad(lambda *a: jnp.sum(jnp.sin(attn(*a))), argnums=(0, 1, 2))(
        q, k, v
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh = NamedSharding(mesh, P("dp", None, "tp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    jitted = jax.jit(attn)
    out = jitted(qs, ks, vs)
    assert out.sharding.spec == P("dp", None, "tp")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    hlo = jitted.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" not in hlo
    assert f"f32[{b // 4},{t},{c // 2}]" in hlo  # per-device kernel block
    assert f"f32[{b},{t},{c}]" not in hlo  # nothing runs at global shape

    g = jax.jit(
        jax.grad(lambda *a: jnp.sum(jnp.sin(attn(*a))), argnums=(0, 1, 2))
    )(qs, ks, vs)
    for got, want in zip(g, g_ref):
        assert got.sharding.spec == P("dp", None, "tp")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    # a tp split that cannot align to head boundaries (6 heads over tp=4:
    # C divides but heads do not) falls back to replicated heads — still
    # correct, never wrong-shaped
    nh6, c6 = 6, 6 * d
    q6 = jnp.asarray(rng.standard_normal((4, t, c6)).astype(np.float32))

    def attn6(q, k, v):
        return fused_attention_btc_trainable(
            q, k, v, n_head=nh6, sm_scale=scale, interpret=True
        )

    ref6 = attn6(q6, q6, q6)
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("tp",))
    sh4 = NamedSharding(mesh4, P(None, None, "tp"))
    q6s = jax.device_put(q6, sh4)
    out6 = jax.jit(attn6)(q6s, q6s, q6s)
    np.testing.assert_array_equal(np.asarray(out6), np.asarray(ref6))
