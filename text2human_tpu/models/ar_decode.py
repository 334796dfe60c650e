"""KV-cached autoregressive decode for ``TransformerMultiHead``.

Parity target: the reference's ``past_key_values``-style incremental decode
hook on its causal trunk (models/archs/transformer_arch.py:52-55 caches
per-layer key/value tensors between steps).  The whole-sequence decode loop
(diffusion/absorbing.py:sample_autoregressive) re-runs the full causal trunk
every step — O(T) trunk passes of O(T) tokens.  This module is the
incremental equivalent: one single-token trunk pass per step against
per-layer K/V caches, O(T) total token-passes.

TPU-first shape choices:
  * the cache is a pair of dense ``[L, B, H, T, D]`` arrays carried through
    a ``lax.scan`` over positions — static shapes, in-place
    ``dynamic_update_slice`` writes, no host round-trips;
  * the per-step layer stack is itself a ``lax.scan`` over the leading layer
    axis of the nn.scan-stacked block params (the same stacked layout the
    training trunk uses), so the step compiles once regardless of depth;
  * attention per step is two small einsums (``q·K^T`` then ``att·V``) with
    f32 accumulation and an iota mask over the static T axis — masking, not
    dynamic shapes, keeps XLA happy.

The math mirrors ``models/transformer.py`` exactly (pre-LN blocks, gelu
MLP, f32 layernorm/softmax, texture-selected output heads); equality with
the full causal forward is asserted position-by-position by
tests/test_ar_kv.py via the teacher-forcing mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.config import TransformerConfig

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _layernorm(x: jax.Array, p) -> jax.Array:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * p["scale"] + p["bias"]


def _dense(x: jax.Array, p, dtype) -> jax.Array:
    return (
        x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)
    )


def _step_layer(x, layer_p, k_cache, v_cache, pos, n_head, dtype):
    """One pre-LN block for a single token x [B, C] at position ``pos``
    against this layer's [B, H, T, D] caches.  Returns (x', k', v')."""
    b, c = x.shape
    hs = c // n_head

    h = _layernorm(x, layer_p["ln1"]).astype(dtype)
    attn_p = layer_p["attn"]
    q = _dense(h, attn_p["query"], dtype).reshape(b, n_head, hs)
    k = _dense(h, attn_p["key"], dtype).reshape(b, n_head, hs)
    v = _dense(h, attn_p["value"], dtype).reshape(b, n_head, hs)

    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k[:, :, None].astype(k_cache.dtype), (0, 0, pos, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v[:, :, None].astype(v_cache.dtype), (0, 0, pos, 0)
    )

    score_dtype = jnp.float32
    att = jnp.einsum(
        "bhd,bhtd->bht", q, k_cache.astype(dtype),
        preferred_element_type=score_dtype,
    ) * (1.0 / float(hs) ** 0.5)
    t_len = k_cache.shape[2]
    att = jnp.where(jnp.arange(t_len)[None, None] <= pos, att, -jnp.inf)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(dtype)
    y = jnp.einsum(
        "bht,bhtd->bhd", att, v_cache.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(b, c)
    x = x + _dense(y, attn_p["proj"], dtype)

    h = _layernorm(x, layer_p["ln2"]).astype(dtype)
    h = jax.nn.gelu(_dense(h, layer_p["mlp_fc"], dtype))
    h = _dense(h, layer_p["mlp_proj"], dtype)
    return x + h, k_cache, v_cache


def _trunk_step(params, cfg, x, k_caches, v_caches, pos, dtype):
    """Single-token pass through the stacked layers.  ``x`` [B, C] is the
    embedded input; caches are [L, B, H, T, D].  Returns (hidden [B, C] after
    ln_f, new caches)."""

    def body(carry, xs):
        x = carry
        layer_p, k_c, v_c = xs
        x, k_c, v_c = _step_layer(
            x, layer_p, k_c, v_c, pos, cfg.n_head, dtype
        )
        return x, (k_c, v_c)

    x, (k_caches, v_caches) = jax.lax.scan(
        body, x, (params["blocks"], k_caches, v_caches)
    )
    return _layernorm(x, params["ln_f"]), k_caches, v_caches


def _embed_step(params, cfg, prev_cont, seg_emb_i, tex_emb_i, pos, dtype):
    """Input embedding for position ``pos``: the shifted stream means the
    input token is the PREVIOUS position's sampled token; position 0 uses
    the learned start embedding (transformer_arch.py:220,256-259)."""
    tok = jnp.take(params["tok_emb"], prev_cont, axis=0)
    start = jnp.broadcast_to(params["start_tok"], tok.shape)
    tok = jnp.where(pos == 0, start, tok)
    pos_e = jax.lax.dynamic_index_in_dim(
        params["pos_emb"], pos, axis=0, keepdims=False
    )
    return (tok + pos_e[None] + seg_emb_i + tex_emb_i).astype(dtype)


def _head_logits(params, hidden, tex_i, num_heads, dtype):
    """Texture-selected output head for one position: [B, C] -> [B, Cc]."""
    tex = jnp.clip(tex_i.astype(jnp.int32), 0, num_heads - 1)
    head = jnp.take(params["heads"], tex, axis=0).astype(dtype)  # [B, C, Cc]
    return jnp.einsum(
        "bd,bdc->bc", hidden.astype(dtype), head,
        preferred_element_type=jnp.float32,
    )


def ar_decode_kv(
    key: jax.Array,
    params,
    cfg: TransformerConfig,
    segm_tokens: jax.Array,
    texture_tokens: jax.Array,
    n_embed_per_head: int,
    temp: float = 1.0,
    dtype: jnp.dtype = jnp.float32,
    forced_cont: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Left-to-right KV-cached decode.

    Returns ``(local [B,T], cont [B,T], logits [B,T,Cc])`` — the same token
    contract as ``diffusion.absorbing.sample_autoregressive`` plus the
    per-position selected-head logits (the teacher-forcing/parity hook).

    ``forced_cont`` [B, T]: teacher forcing — feed these continual indices
    instead of the sampled ones (the logits output then reproduces exactly
    what the full causal forward computes on the shifted stream).
    """
    assert cfg.sampler == "autoregressive", cfg.sampler
    b, t_len = texture_tokens.shape
    c = cfg.n_emb
    hs = c // cfg.n_head
    texture = texture_tokens.astype(jnp.int32)

    # position-independent embedding streams, computed once
    seg_emb = jnp.take(params["segm_emb"], segm_tokens.astype(jnp.int32), axis=0)
    tex_emb = jnp.take(params["texture_emb"], texture, axis=0)

    cache_shape = (cfg.n_layers, b, cfg.n_head, t_len, hs)
    k_caches = jnp.zeros(cache_shape, dtype)
    v_caches = jnp.zeros(cache_shape, dtype)

    def body(carry, args):
        prev_cont, k_caches, v_caches = carry
        pos, step_key = args
        seg_i = jax.lax.dynamic_slice_in_dim(seg_emb, pos, 1, axis=1)[:, 0]
        tex_e_i = jax.lax.dynamic_slice_in_dim(tex_emb, pos, 1, axis=1)[:, 0]
        x = _embed_step(params, cfg, prev_cont, seg_i, tex_e_i, pos, dtype)
        hidden, k_caches, v_caches = _trunk_step(
            params, cfg, x, k_caches, v_caches, pos, dtype
        )
        tex_i = jax.lax.dynamic_slice_in_dim(texture, pos, 1, axis=1)[:, 0]
        logits = _head_logits(
            params, hidden, tex_i, cfg.num_output_heads, dtype
        )
        sampled = jax.random.categorical(
            step_key, logits.astype(jnp.float32) / temp, axis=-1
        ).astype(jnp.int32)
        cont_i = sampled + n_embed_per_head * tex_i
        if forced_cont is not None:
            cont_i = jax.lax.dynamic_slice_in_dim(
                forced_cont, pos, 1, axis=1
            )[:, 0]
            sampled = cont_i - n_embed_per_head * tex_i
        return (cont_i, k_caches, v_caches), (sampled, cont_i, logits)

    keys = jax.random.split(key, t_len)
    init = (jnp.zeros((b,), jnp.int32), k_caches, v_caches)
    _, (local, cont, logits) = jax.lax.scan(
        body, init, (jnp.arange(t_len), keys)
    )
    # scan stacks along axis 0: [T, B, ...] -> [B, T, ...]
    return (
        jnp.moveaxis(local, 0, 1),
        jnp.moveaxis(cont, 0, 1),
        jnp.moveaxis(logits, 0, 1),
    )
