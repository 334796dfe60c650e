"""Classification losses and metrics.

Parity targets:
  cross_entropy (ignore_index, mean over valid)  reference models/losses/cross_entropy_loss.py:58-103
  BCELossWithQuant                               reference models/losses/segmentation_loss.py:12-25
  accuracy (top-k)                               reference models/losses/accuracy.py:1-46
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = -100,
    reduction: str = "mean",
) -> jax.Array:
    """Softmax CE over the last axis of ``logits`` (labels same shape minus it).

    Reduction follows the reference's mmseg-style ``weight_reduce_loss``
    (cross_entropy_loss.py:46-47,58-81): F.cross_entropy(reduction='none',
    ignore_index) zeroes ignored positions and ``loss.mean()`` then divides
    by the TOTAL element count — NOT torch's bare F.cross_entropy semantics
    of averaging over valid elements only.  (Identical whenever nothing is
    ignored, which is every shipped trainer today.)
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    return jnp.mean(nll)


def _bce_elements(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Stable elementwise BCE-with-logits: max(x,0) - x*t + log1p(e^-|x|).
    One definition — a numerical-stability fix must not fork."""
    zeros = jnp.zeros_like(logits)
    return jnp.maximum(logits, zeros) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy with logits (stable form)."""
    return jnp.mean(_bce_elements(logits, targets))


def bce_with_quant(
    qloss: jax.Array,
    target: jax.Array,
    prediction: jax.Array,
    codebook_weight: float = 1.0,
    split: str = "train",
) -> Tuple[jax.Array, dict]:
    """BCE reconstruction + weighted codebook loss (segmentation_loss.py:12-25)."""
    bce = bce_with_logits(prediction, target)
    loss = bce + codebook_weight * qloss
    log = {
        f"{split}/total_loss": loss,
        f"{split}/bce_loss": bce,
        f"{split}/quant_loss": qloss,
    }
    return loss, log


def binary_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = 255,
) -> jax.Array:
    """Per-class BCE with one-hot-expanded integer labels
    (reference models/losses/cross_entropy_loss.py:106-146).

    logits [..., C]; labels integer [...] (expanded) or float same shape.
    """
    if labels.shape == logits.shape:
        target = labels.astype(jnp.float32)
        weight = jnp.ones_like(target)
    else:
        valid = (labels >= 0) & (labels != ignore_index)
        safe = jnp.where(valid, labels, 0).astype(jnp.int32)
        target = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
        target = target * valid[..., None].astype(jnp.float32)
        weight = jnp.broadcast_to(
            valid[..., None].astype(jnp.float32), logits.shape
        )
    loss = _bce_elements(logits, target)
    # reference reduction (cross_entropy_loss.py:106-146 -> weight_reduce_
    # loss -> loss.mean()): divide by the TOTAL element count, with ignored
    # positions contributing zero — not by the valid count
    return jnp.mean(loss * weight)


def mask_cross_entropy(
    logits: jax.Array, target: jax.Array, label: jax.Array
) -> jax.Array:
    """BCE of the per-sample selected class channel
    (reference cross_entropy_loss.py:149-184).  Channel-LAST here: logits
    may be [N, C] or [N, H, W, C] (the reference slices pred[inds, label]
    on its channel-second layout)."""
    idx = label.reshape(label.shape[0], *([1] * (logits.ndim - 1)))
    sel = jnp.take_along_axis(logits, idx.astype(jnp.int32), axis=-1)[..., 0]
    return bce_with_logits(sel, target.astype(jnp.float32))


def accuracy(
    logits: jax.Array,
    target: jax.Array,
    topk: int = 1,
    thresh: Optional[float] = None,
) -> jax.Array:
    """Top-k pixel accuracy in percent; logits [..., C] channel-last
    (the reference is channel-second, accuracy.py:1-46)."""
    k = topk
    values, pred = jax.lax.top_k(logits, k)
    correct = pred == target[..., None]
    if thresh is not None:
        correct = correct & (values > thresh)
    return jnp.sum(correct.astype(jnp.float32)) * 100.0 / target.size
