"""Absorbing (masked) discrete diffusion: training loss and scan-based decode.

Parity targets:
  sample_time / q_sample / _train_loss  reference models/transformer_model.py:188-274
  sample_fn (256-step unmask loop)      reference models/sample_model.py:256-328

TPU-first choices:
  * the decode loop is a ``jax.lax.scan`` over timesteps with the transformer
    traced once (fixed 512-token shape);
  * per-codebook Categorical sampling + masked scatter (the reference's 18-way
    python loop) becomes a single gather of the active head's logits per
    position followed by one ``jax.random.categorical`` — distributionally
    identical, since exactly one head is ever consulted per position;
  * RNG is explicitly threaded ``jax.random`` keys (the reference relies on
    the global torch RNG, models/sample_model.py:286,306).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.models.transformer import select_head_logits

DenoiseFn = Callable[[jax.Array], jax.Array]  # x_t [B,T] -> logits [B,T,K,C]


@dataclass(frozen=True)
class AbsorbingDiffusion:
    num_timesteps: int = 1000
    mask_id: int = 18432
    num_tokens: int = 512  # latent positions (32*16)
    n_embed_per_head: int = 1024
    loss_type: str = "reweighted_elbo"  # 'elbo' | 'mlm' | 'reweighted_elbo'
    mask_schedule: str = "random"


def sample_time(key: jax.Array, batch: int, num_timesteps: int) -> Tuple[jax.Array, jax.Array]:
    """Uniform t in [1, T] and its probability (transformer_model.py:203-207)."""
    t = jax.random.randint(key, (batch,), 1, num_timesteps + 1)
    pt = jnp.full((batch,), 1.0 / num_timesteps, dtype=jnp.float32)
    return t, pt


def init_importance_state(num_timesteps: int) -> dict:
    """Lt history buffers for importance time-sampling (size T+1, index by t)."""
    return {
        "lt_history": jnp.zeros(num_timesteps + 1, jnp.float32),
        "lt_count": jnp.zeros(num_timesteps + 1, jnp.int32),
    }


def sample_time_importance(
    key: jax.Array, batch: int, num_timesteps: int, imp_state: dict
) -> Tuple[jax.Array, jax.Array]:
    """Importance time-sampling (reference transformer_model.py:188-199).

    The reference's 'importance' branch reads ``Lt_history``/``Lt_count``
    buffers it never registers or updates (vestigial code inherited from
    unleashing-transformers); this is the working mechanism from that
    lineage: an EMA history of squared per-t vb-losses, with
    ``pt ∝ sqrt(E[L_t^2]) + 1e-4`` once every timestep has > 10
    observations (strictly more, matching the lineage's ``Lt_count > 10``)
    and uniform sampling before.  t stays in [1, T] (the reference's
    index-0 "decoder term" is excluded — the train loss divides by t),
    implemented branch-free for jit.
    """
    lt_history = imp_state["lt_history"]
    lt_count = imp_state["lt_count"]
    ready = jnp.all(lt_count[1:] > 10)
    lt_sqrt = jnp.sqrt(lt_history + 1e-10) + 1e-4  # :193
    lt_sqrt = lt_sqrt.at[0].set(0.0)  # exclude t=0 (cf. :194)
    pt_all = lt_sqrt / jnp.sum(lt_sqrt)
    ukey, ikey = jax.random.split(key)
    t_imp = jax.random.categorical(
        ikey, jnp.log(pt_all + 1e-20), shape=(batch,)
    ).astype(jnp.int32)
    pt_imp = pt_all[t_imp]
    t_uni, pt_uni = sample_time(ukey, batch, num_timesteps)
    t = jnp.where(ready, t_imp, t_uni).astype(jnp.int32)
    pt = jnp.where(ready, pt_imp, pt_uni)
    return t, pt


def update_importance_state(imp_state: dict, t: jax.Array, vb_per_sample: jax.Array) -> dict:
    """EMA the squared vb-loss into the per-t history and bump the counts.

    Two lineage-faithful quirks (unleashing-transformers' update, which the
    reference inherited the read side of), kept deliberately so training
    semantics match the established method rather than a 'corrected' one:
      * ``vb_per_sample`` is the importance-WEIGHTED vb (ce/t/pt), so after
        the ready-gate flips the fixed point is pt ∝ E[L_t^2]^(1/4) rather
        than sqrt — the elbo estimator stays unbiased either way;
      * duplicate timesteps in a batch keep one arbitrary update
        (scatter-set semantics, same as torch ``scatter_``) while the count
        increments for each duplicate.
    """
    lt2 = jax.lax.stop_gradient(vb_per_sample.astype(jnp.float32)) ** 2
    hist = imp_state["lt_history"]
    new_hist = hist.at[t].set(0.1 * lt2 + 0.9 * hist[t])
    new_count = imp_state["lt_count"].at[t].add(1)
    return {"lt_history": new_hist, "lt_count": new_count}


def q_sample(
    key: jax.Array, x0: jax.Array, t: jax.Array, num_timesteps: int, mask_id: int
) -> Tuple[jax.Array, jax.Array]:
    """Randomly absorb tokens with prob t/T (transformer_model.py:212-230)."""
    u = jax.random.uniform(key, x0.shape)
    mask = u < (t.astype(jnp.float32)[:, None] / num_timesteps)
    x_t = jnp.where(mask, mask_id, x0)
    return x_t, mask


def train_loss(
    key: jax.Array,
    diffusion: AbsorbingDiffusion,
    denoise_fn: DenoiseFn,
    x0_cont: jax.Array,
    gt_local: jax.Array,
    texture_tokens: jax.Array,
    imp_state: dict = None,
) -> Tuple[jax.Array, jax.Array, dict]:
    """Reweighted-ELBO masked-CE loss (transformer_model.py:232-274).

    x0_cont:       [B, T] continual indices (local + 1024*codebook).
    gt_local:      [B, T] per-position local index within the active codebook.
    texture_tokens:[B, T] active codebook ids.
    imp_state:     optional Lt buffers (init_importance_state) — switches
                   time sampling to 'importance' and returns the updated
                   buffers in the aux dict under 'imp_state'.

    The reference sums CE over 18 heads with -1-ignore; exactly one head is
    active per position, so this equals CE of the texture-selected head over
    the masked positions.
    """
    b = x0_cont.shape[0]
    t_key, mask_key = jax.random.split(key)
    if imp_state is not None:
        t, pt = sample_time_importance(t_key, b, diffusion.num_timesteps, imp_state)
    else:
        t, pt = sample_time(t_key, b, diffusion.num_timesteps)
    if diffusion.mask_schedule != "random":
        raise NotImplementedError(diffusion.mask_schedule)
    x_t, mask = q_sample(mask_key, x0_cont, t, diffusion.num_timesteps, diffusion.mask_id)

    logits = denoise_fn(x_t)  # [B, T, K, C] or pre-selected [B, T, C]
    sel = (
        logits if logits.ndim == 3 else select_head_logits(logits, texture_tokens)
    )

    logp = jax.nn.log_softmax(sel.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, gt_local[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    ce = jnp.where(mask & (gt_local >= 0), ce, 0.0)
    cross_entropy_loss = jnp.sum(ce, axis=1)  # [B]

    denom_bits = math.log(2) * diffusion.num_tokens
    vb_loss = cross_entropy_loss / t.astype(jnp.float32) / pt / denom_bits

    if diffusion.loss_type == "elbo":
        loss = vb_loss
    elif diffusion.loss_type == "mlm":
        denom = jnp.sum(mask.astype(jnp.float32), axis=1)
        denom = jnp.where(denom == 0, 1.0, denom)
        loss = cross_entropy_loss / denom
    elif diffusion.loss_type == "reweighted_elbo":
        weight = 1.0 - t.astype(jnp.float32) / diffusion.num_timesteps
        loss = weight * cross_entropy_loss / denom_bits
    else:
        raise ValueError(diffusion.loss_type)

    aux = {"masked_frac": mask.mean()}
    if imp_state is not None:
        aux["imp_state"] = update_importance_state(imp_state, t, vb_loss)
    return loss.mean(), vb_loss.mean(), aux


def _shift_right(x0_cont: jax.Array) -> jax.Array:
    """Teacher-forcing input stream for the causal trunk: position j sees the
    token at j-1.  Position 0's fill value (id 0) is inert — the causal
    transformer replaces position 0's token embedding with its learned
    ``start_tok`` (models/transformer.py, mirroring transformer_arch.py:220,
    256-259), so the start of sequence is carried by that parameter plus the
    positional/segm/texture embeddings."""
    return jnp.concatenate(
        [jnp.zeros_like(x0_cont[:, :1]), x0_cont[:, :-1]], axis=1
    )


def ar_train_loss(
    denoise_fn: DenoiseFn,
    x0_cont: jax.Array,
    gt_local: jax.Array,
    texture_tokens: jax.Array,
) -> Tuple[jax.Array, dict]:
    """Next-token cross-entropy for the causal (autoregressive) sampler mode.

    The reference defines the causal trunk (transformer_arch.py:30-35,125-127)
    but ships no training objective or decode loop for it (no config enables
    it); this is the standard AR factorization over the same per-position
    texture-selected heads: logits at position j (computed from tokens < j via
    the shifted input stream) predict the local index at j.  Positions with
    gt_local < 0 (never produced by the tokenizers, kept for symmetry with the
    diffusion loss) are ignored.
    """
    logits = denoise_fn(_shift_right(x0_cont))
    sel = logits if logits.ndim == 3 else select_head_logits(logits, texture_tokens)
    logp = jax.nn.log_softmax(sel.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(
        logp, jnp.maximum(gt_local, 0)[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    valid = gt_local >= 0
    ce = jnp.where(valid, ce, 0.0)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss = jnp.sum(ce) / denom
    return loss, {"masked_frac": jnp.zeros(())}


def sample_autoregressive(
    key: jax.Array,
    diffusion: AbsorbingDiffusion,
    denoise_fn: DenoiseFn,
    texture_tokens: jax.Array,
    temp: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Left-to-right decode for the causal sampler mode, as a lax.scan over
    positions.  Returns (local_indices [B,T], continual indices [B,T]) — the
    same contract as :func:`sample_loop`.

    Each step re-runs the full causal trunk on the current shifted stream (no
    kv-cache: at T=512 the whole-sequence forward is one large MXU-friendly
    batch, and causal masking makes unfilled tail positions provably inert —
    exactness is asserted by the teacher-forcing replay test).
    """
    b, t_len = texture_tokens.shape
    texture = texture_tokens.astype(jnp.int32)
    cont = jnp.zeros((b, t_len), dtype=jnp.int32)
    local = jnp.full((b, t_len), -1, dtype=jnp.int32)

    def body(carry, args):
        cont, local = carry
        i, step_key = args
        logits = denoise_fn(_shift_right(cont))
        sel = logits if logits.ndim == 3 else select_head_logits(logits, texture)
        row = jax.lax.dynamic_slice_in_dim(sel, i, 1, axis=1)[:, 0] / temp
        sampled = jax.random.categorical(
            step_key, row.astype(jnp.float32), axis=-1
        ).astype(jnp.int32)
        tex_i = jax.lax.dynamic_slice_in_dim(texture, i, 1, axis=1)[:, 0]
        cont_i = sampled + diffusion.n_embed_per_head * tex_i
        cont = jax.lax.dynamic_update_slice_in_dim(
            cont, cont_i[:, None], i, axis=1
        )
        local = jax.lax.dynamic_update_slice_in_dim(
            local, sampled[:, None], i, axis=1
        )
        return (cont, local), None

    keys = jax.random.split(key, t_len)
    (cont, local), _ = jax.lax.scan(
        body, (cont, local), (jnp.arange(t_len), keys)
    )
    return local, cont


def maskgit_unmask_counts(num_tokens: int, sample_steps: int) -> "list":
    """Static per-step unmask counts for the cosine schedule: after step i,
    floor(T * cos(pi/2 * (i+1)/S)) positions remain masked (0 after the
    last).  Computed in Python — the counts are jit-static."""
    remaining = [
        int(math.floor(num_tokens * math.cos(math.pi / 2 * (i + 1) / sample_steps)))
        for i in range(sample_steps)
    ]
    remaining[-1] = 0
    counts = []
    prev = num_tokens
    for r in remaining:
        r = min(r, prev - 1) if prev > 0 else 0  # unmask >= 1 per step
        counts.append(prev - r)
        prev = r
    return counts


def sample_maskgit(
    key: jax.Array,
    diffusion: AbsorbingDiffusion,
    denoise_fn: DenoiseFn,
    texture_tokens: jax.Array,
    sample_steps: int,
    temp: float = 1.0,
    choice_temperature: float = 4.5,
) -> Tuple[jax.Array, jax.Array]:
    """Confidence-ordered multi-token unmasking (MaskGIT, Chang et al.,
    CVPR 2022) — the fast-decode serving knob.

    DOCUMENTED DIVERGENCE from the reference: sample_model.py:256-328 unmasks
    positions in RANDOM order over ``sample_steps`` trunk passes (256 by
    default).  This decode instead commits, each step, the cosine-scheduled
    number of *most confident* predictions (confidence = log-prob of the
    sampled token + annealed Gumbel noise, MaskGIT's temperature annealing),
    so 16-32 trunk passes replace 256.  Off by default — enable with
    ``decode_mode: maskgit`` (pipelines/sample.py); quality-proxy deltas vs
    the reference schedule are tested (tests/test_diffusion.py,
    tests/test_overfit_e2e.py) and benchmarked (BENCHMARKS.md).

    Same contract as :func:`sample_loop`: returns (local [B,T], cont [B,T]),
    all positions unmasked by the final step.
    """
    b, t_len = texture_tokens.shape
    x_t = jnp.full((b, t_len), diffusion.mask_id, dtype=jnp.int32)
    unmasked = jnp.zeros((b, t_len), dtype=bool)
    local = jnp.full((b, t_len), -1, dtype=jnp.int32)
    texture = texture_tokens.astype(jnp.int32)
    counts = jnp.asarray(
        maskgit_unmask_counts(t_len, sample_steps), jnp.int32
    )
    ratios = (jnp.arange(sample_steps) + 1.0) / sample_steps

    def body(carry, args):
        x_t, unmasked, local = carry
        step_key, n_unmask, ratio = args
        cat_key, gumbel_key = jax.random.split(step_key)

        logits = denoise_fn(x_t)
        sel = (
            logits if logits.ndim == 3 else select_head_logits(logits, texture)
        ) / temp
        logp = jax.nn.log_softmax(sel.astype(jnp.float32), axis=-1)
        sampled = jax.random.categorical(cat_key, sel.astype(jnp.float32), axis=-1)
        sampled = sampled.astype(jnp.int32)

        conf = jnp.take_along_axis(logp, sampled[..., None], axis=-1)[..., 0]
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(gumbel_key, conf.shape) + 1e-20) + 1e-20
        )
        conf = conf + choice_temperature * (1.0 - ratio) * gumbel
        # already-committed positions never compete again
        conf = jnp.where(unmasked, -jnp.inf, conf)

        # threshold = n-th largest confidence per row (static T, traced n)
        order = jnp.sort(conf, axis=-1)[:, ::-1]
        thresh = jnp.take_along_axis(
            order, jnp.full((b, 1), n_unmask - 1, jnp.int32), axis=-1
        )
        changes = (conf >= thresh) & (~unmasked)

        x_t = jnp.where(changes, sampled + diffusion.n_embed_per_head * texture, x_t)
        local = jnp.where(changes, sampled, local)
        unmasked = unmasked | changes
        return (x_t, unmasked, local), None

    keys = jax.random.split(key, sample_steps)
    (x_t, unmasked, local), _ = jax.lax.scan(
        body, (x_t, unmasked, local), (keys, counts, ratios)
    )
    return local, x_t


def sample_loop(
    key: jax.Array,
    diffusion: AbsorbingDiffusion,
    denoise_fn: DenoiseFn,
    texture_tokens: jax.Array,
    sample_steps: int,
    temp: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Reverse unmasking loop (sample_model.py:256-328) as a lax.scan.

    Returns (local_indices [B,T], x_t_cont [B,T]).  Positions never unmasked
    keep local index -1 (can only happen if sample_steps is tiny).
    """
    b, t_len = texture_tokens.shape
    x_t = jnp.full((b, t_len), diffusion.mask_id, dtype=jnp.int32)
    unmasked = jnp.zeros((b, t_len), dtype=bool)
    local = jnp.full((b, t_len), -1, dtype=jnp.int32)
    texture = texture_tokens.astype(jnp.int32)

    def body(carry, step_key_and_t):
        x_t, unmasked, local = carry
        step_key, t = step_key_and_t
        change_key, cat_key = jax.random.split(step_key)

        u = jax.random.uniform(change_key, (b, t_len))
        changes = (u < 1.0 / t.astype(jnp.float32)) & (~unmasked)
        unmasked = unmasked | changes

        logits = denoise_fn(x_t)  # [B, T, K, C] or pre-selected [B, T, C]
        sel = (
            logits if logits.ndim == 3 else select_head_logits(logits, texture)
        ) / temp
        sampled = jax.random.categorical(cat_key, sel.astype(jnp.float32), axis=-1)
        sampled = sampled.astype(jnp.int32)

        x_t = jnp.where(changes, sampled + diffusion.n_embed_per_head * texture, x_t)
        local = jnp.where(changes, sampled, local)
        return (x_t, unmasked, local), None

    keys = jax.random.split(key, sample_steps)
    ts = jnp.arange(sample_steps, 0, -1)
    (x_t, unmasked, local), _ = jax.lax.scan(
        body, (x_t, unmasked, local), (keys, ts)
    )
    return local, x_t
