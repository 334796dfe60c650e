"""Multi-head denoising transformer (BERT-style trunk, 18 output heads).

Parity target: reference models/archs/transformer_arch.py:184-273
(TransformerMultiHead: tok/pos/segm/texture embeddings -> 24 pre-LN blocks ->
18 linear heads of codebook_size/18 classes each).

TPU-first choices:
  * the 18 per-texture output heads are one stacked [K, D, C] einsum (MXU)
    instead of a python list of Linears (transformer_arch.py:232-235, 271);
  * blocks are rolled with nn.scan -> one compiled layer body (fast compile,
    identical math), rematerialized for training memory;
  * activations can run in bfloat16 (``dtype``) with fp32 params and fp32
    softmax/layernorm accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.config import TransformerConfig


class SelfAttention(nn.Module):
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    causal: bool = False
    deterministic: bool = True
    flash: bool = False  # fused Pallas flash-attention kernel (TPU only)
    # store attention scores in the activation dtype (halves the dominant
    # [B,H,T,T] HBM traffic; softmax still reduces in f32). Off by default —
    # bf16 scores perturb sampled logits slightly.
    bf16_scores: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, c = x.shape
        hs = c // self.n_head
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        q = dense(c, name="query")(x)
        k = dense(c, name="key")(x)
        v = dense(c, name="value")(x)

        if self.flash and self.attn_pdrop > 0.0 and not self.deterministic:
            # dropout is a no-op at inference (deterministic=True), so a
            # checkpoint trained with attn_pdrop > 0 can still be SERVED
            # through the fused kernel — only training must fall back
            raise ValueError(
                "flash attention has no dropout support; set attn_pdrop=0 "
                "or disable flash for training"
            )
        if self.flash and self.causal:
            raise ValueError(
                "the fused attention kernel is non-causal (absorbing-"
                "diffusion decode); disable flash for autoregressive mode"
            )
        if self.flash:
            # whole-sequence fused kernel: each head's [T, T] score matrix
            # stays in VMEM — never written to HBM (the batch>=16 bottleneck;
            # ops/attn_pallas.py). Consumes the dense layers' packed [B,T,C]
            # output directly, so no transpose/reshape copies. Interpreted
            # off-TPU so CPU tests exercise the same code path.
            from text2human_tpu.ops.attn_pallas import (
                fused_attention_btc_trainable as fused_attention_btc,
            )

            y = fused_attention_btc(
                q,
                k,
                v,
                n_head=self.n_head,
                sm_scale=1.0 / float(hs) ** 0.5,
                interpret=jax.default_backend() != "tpu",
            ).astype(self.dtype)
        else:
            q = q.reshape(b, t, self.n_head, hs)
            k = k.reshape(b, t, self.n_head, hs)
            v = v.reshape(b, t, self.n_head, hs)
            score_dtype = self.dtype if self.bf16_scores else jnp.float32
            att = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=score_dtype
            ) * (1.0 / float(hs) ** 0.5)
            if self.causal:
                mask = jnp.tril(jnp.ones((t, t), dtype=bool))
                att = jnp.where(mask[None, None], att, -jnp.inf)
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
            att = nn.Dropout(self.attn_pdrop, deterministic=self.deterministic)(att)
            y = jnp.einsum(
                "bhqk,bkhd->bqhd", att, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)
            y = y.reshape(b, t, c)
        y = dense(c, name="proj")(y)
        y = nn.Dropout(self.resid_pdrop, deterministic=self.deterministic)(y)
        return y


class Block(nn.Module):
    """Pre-LN transformer block (reference transformer_arch.py:74-99).

    Signature is (carry, _) -> (carry, None) so it can be rolled with nn.scan.
    """

    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    causal: bool = False
    deterministic: bool = True
    flash: bool = False
    bf16_scores: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, _=None):
        c = x.shape[-1]
        ln = partial(nn.LayerNorm, dtype=jnp.float32, param_dtype=jnp.float32)
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)

        h = ln(name="ln1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + SelfAttention(
            n_head=self.n_head,
            attn_pdrop=self.attn_pdrop,
            resid_pdrop=self.resid_pdrop,
            causal=self.causal,
            deterministic=self.deterministic,
            flash=self.flash,
            bf16_scores=self.bf16_scores,
            dtype=self.dtype,
            name="attn",
        )(h)

        h = ln(name="ln2")(x.astype(jnp.float32)).astype(self.dtype)
        h = dense(4 * c, name="mlp_fc")(h)
        h = nn.gelu(h)
        h = dense(c, name="mlp_proj")(h)
        h = nn.Dropout(self.resid_pdrop, deterministic=self.deterministic)(h)
        return x + h, None


def _encode_trunk(
    m: nn.Module,
    cfg: TransformerConfig,
    dtype,
    idx: jax.Array,
    segm_tokens: jax.Array,
    texture_tokens: Optional[jax.Array],
    deterministic: bool,
    flash: bool = False,
    bf16_scores: bool = False,
) -> jax.Array:
    """Shared embedding + block-scan + final-norm trunk for both transformer
    variants (multi-head and the single-head dead-code port).  Creates the
    checkpoint-compatible parameter names on ``m``; ``texture_tokens=None``
    omits the texture embedding (transformer_arch.py:102-181 vs :184-273)."""
    init02 = nn.initializers.normal(stddev=0.02)
    tok_emb = m.param("tok_emb", init02, (cfg.vocab_size, cfg.n_emb))
    pos_emb = m.param("pos_emb", nn.initializers.zeros, (cfg.block_size, cfg.n_emb))
    segm_emb = m.param("segm_emb", init02, (cfg.segm_codebook_size, cfg.n_emb))

    tok = jnp.take(tok_emb, idx, axis=0)
    if cfg.sampler == "autoregressive":
        # learned start embedding (reference transformer_arch.py:220,
        # 256-259 prepends ``start_tok``; with our fixed-length shifted
        # stream, position 0's token embedding IS the start token — the
        # shift provides real tokens for positions >= 1). Zeros init
        # matches the reference parameter.
        start = m.param("start_tok", nn.initializers.zeros, (cfg.n_emb,))
        tok = jnp.concatenate(
            [jnp.broadcast_to(start, (tok.shape[0], 1, cfg.n_emb)), tok[:, 1:]],
            axis=1,
        )
    x = tok + pos_emb[None, : idx.shape[1]] + jnp.take(segm_emb, segm_tokens, axis=0)
    if texture_tokens is not None:
        texture_emb = m.param(
            "texture_emb", init02, (cfg.texture_codebook_size, cfg.n_emb)
        )
        x = x + jnp.take(texture_emb, texture_tokens, axis=0)
    x = x.astype(dtype)
    x = nn.Dropout(cfg.embd_pdrop, deterministic=deterministic)(x)

    body = Block if deterministic else nn.remat(Block)
    ScanBlocks = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=cfg.n_layers,
        metadata_params={nn.PARTITION_NAME: "layers"},
    )
    x, _ = ScanBlocks(
        n_head=cfg.n_head,
        attn_pdrop=cfg.attn_pdrop,
        resid_pdrop=cfg.resid_pdrop,
        causal=cfg.sampler == "autoregressive",
        deterministic=deterministic,
        flash=flash,
        bf16_scores=bf16_scores,
        dtype=dtype,
        name="blocks",
    )(x, None)

    return nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x.astype(jnp.float32))


def ragged_head_groups(
    texture_tokens: jax.Array, num_heads: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Precompute the ragged-head sort for ``TransformerMultiHead``.

    Returns ``(order, inv, group_sizes)`` over the flattened B*T positions:
    ``order`` sorts positions by active head, ``inv`` undoes the sort,
    ``group_sizes`` counts positions per head.  The assignment depends only
    on ``texture_tokens`` — constant across a decode — so sample loops
    compute this once and pass it as ``head_groups`` to every trunk pass."""
    tex = jnp.clip(texture_tokens.astype(jnp.int32), 0, num_heads - 1)
    tf = tex.reshape(-1)
    order = jnp.argsort(tf)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(tf.shape[0]))
    group_sizes = jnp.bincount(tf, length=num_heads).astype(jnp.int32)
    return order, inv, group_sizes


class TransformerMultiHead(nn.Module):
    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        idx: jax.Array,
        segm_tokens: jax.Array,
        texture_tokens: jax.Array,
        *,
        deterministic: bool = True,
        select_heads: bool = False,
        flash: bool = False,
        bf16_scores: bool = False,
        ragged_heads: bool = False,
        head_groups: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """idx/segm_tokens/texture_tokens: [B, T] int32.

        Returns logits [B, T, K, head_class_num] — the stacked equivalent of
        the reference's list of 18 [B, T, 1024] tensors.

        With ``select_heads=True`` only each position's texture-selected head
        is emitted ([B, T, head_class_num]): the per-head matmuls are masked
        and accumulated so the full [B, T, K, C] tensor (600 MB at batch 16)
        never hits HBM — exactly one head per position is ever consumed
        (reference sample_model.py:300-317 discards the rest too).

        ``ragged_heads=True`` additionally removes the K-fold FLOP
        over-compute of the masked accumulation: positions are sorted by
        their active head and pushed through ONE grouped matmul
        (``lax.ragged_dot`` — the MoE-style grouped GEMM XLA maps onto the
        MXU), then unsorted.  Identical math (each output row is a single
        x·W_k dot product); measured 2.8x faster than the masked loop at
        serving shapes (~7% of the decode step, BENCHMARKS.md).

        ``head_groups`` optionally supplies the precomputed
        ``ragged_head_groups(texture_tokens, K)`` sort for the ragged path.
        The head assignment is constant across a whole decode, so callers
        that apply the trunk inside a scan (pipelines/sample.py) hoist the
        argsort/bincount out of the loop instead of re-sorting every step
        (TPU sorts are bitonic — O(T log^2 T) vector work per step that the
        MXU can't help with, and XLA's LICM does not reliably lift sorts out
        of while bodies).  Identical math by construction.
        """
        cfg = self.cfg
        init02 = nn.initializers.normal(stddev=0.02)
        x = _encode_trunk(
            self, cfg, self.dtype, idx, segm_tokens, texture_tokens,
            deterministic, flash=flash, bf16_scores=bf16_scores,
        )

        heads = self.param(
            "heads",
            init02,
            (cfg.num_output_heads, cfg.n_emb, cfg.head_class_num),
        )
        x = x.astype(self.dtype)
        if select_heads:
            b, t = idx.shape
            tex = jnp.clip(
                texture_tokens.astype(jnp.int32), 0, cfg.num_output_heads - 1
            )

            if ragged_heads:
                # group all B*T positions by their active head (the head
                # assignment is constant across the whole decode scan) and
                # run one grouped matmul over the sorted rows.
                xf = x.reshape(b * t, -1)
                if head_groups is None:
                    head_groups = ragged_head_groups(tex, cfg.num_output_heads)
                order, inv, group_sizes = head_groups
                xs = jnp.take(xf, order, axis=0)
                out = jax.lax.ragged_dot(
                    xs,
                    heads.astype(self.dtype),
                    group_sizes,
                    preferred_element_type=jnp.float32,
                )
                return jnp.take(out, inv, axis=0).reshape(
                    b, t, cfg.head_class_num
                )

            def add_head(k, acc):
                head_k = jax.lax.dynamic_index_in_dim(
                    heads, k, axis=0, keepdims=False
                ).astype(self.dtype)
                logits_k = jnp.einsum(
                    "btd,dc->btc", x, head_k, preferred_element_type=jnp.float32
                )
                return acc + jnp.where((tex == k)[..., None], logits_k, 0.0)

            return jax.lax.fori_loop(
                0,
                cfg.num_output_heads,
                add_head,
                jnp.zeros((b, t, cfg.head_class_num), jnp.float32),
            )

        logits = jnp.einsum(
            "btd,kdc->btkc",
            x,
            heads.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits


class Transformer(nn.Module):
    """Single-head GPT/BERT trunk (reference transformer_arch.py:102-181).

    Dead code in the reference (only ``TransformerMultiHead`` is ever
    imported) — implemented for complete drop-in parity: tok + pos + segm
    embeddings (no texture embedding), the same pre-LN blocks, and ONE
    bias-free head over ``codebook_size`` classes.  Converter:
    ``utils/torch_import.py:transformer_single_params``.
    """

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        idx: jax.Array,
        segm_tokens: jax.Array,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        x = _encode_trunk(
            self, cfg, self.dtype, idx, segm_tokens, None, deterministic
        )
        head = self.param(
            "head", nn.initializers.normal(stddev=0.02),
            (cfg.n_emb, cfg.codebook_size),
        )
        return jnp.einsum(
            "btd,dc->btc",
            x.astype(self.dtype),
            head.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )


def select_head_logits(logits: jax.Array, texture_tokens: jax.Array) -> jax.Array:
    """Gather each position's active codebook head: [B,T,K,C], [B,T] -> [B,T,C].

    This replaces the reference's per-codebook masked scatter in the sampling
    loop (models/sample_model.py:300-317) — only the head selected by the
    texture token at each position is ever used.
    """
    idx = jnp.clip(texture_tokens[..., None, None].astype(jnp.int32), 0, logits.shape[2] - 1)
    return jnp.take_along_axis(logits, idx, axis=2)[:, :, 0, :]
