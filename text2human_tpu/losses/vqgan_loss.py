"""VQGAN adversarial-training losses and DiffAugment (NHWC, key-threaded RNG).

Parity targets (reference models/losses/vqgan_loss.py):
  calculate_adaptive_weight :5-12   grad-norm-ratio discriminator weight —
      in JAX this is two extra VJPs of scalars w.r.t. the decoder's conv_out
      kernel instead of torch retain_graph double-backward
  adopt_weight              :15-18  step gate
  hinge_d_loss              :21-26
  DiffAugment (color,translation) :29-114
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def adopt_weight(weight, global_step: jax.Array, threshold: int = 0, value: float = 0.0):
    """Zero the weight before ``threshold`` steps — jit-safe via jnp.where."""
    return jnp.where(global_step < threshold, value, weight)


def calculate_adaptive_weight(
    nll_grad: jax.Array, g_grad: jax.Array, disc_weight_max: float
) -> jax.Array:
    """d_weight = ||d nll/d w|| / (||d g/d w|| + 1e-4), clipped.

    Callers compute the two gradients w.r.t. the decoder's final conv kernel
    with ``jax.grad`` restricted to that subtree (cheap: two extra VJPs).
    """
    flat_n = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(nll_grad)])
    flat_g = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(g_grad)])
    d_weight = jnp.linalg.norm(flat_n) / (jnp.linalg.norm(flat_g) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, disc_weight_max))


# --- DiffAugment ("color,translation" policy) ------------------------------


def _rand_brightness(key, x):
    shift = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype) - 0.5
    return x + shift


def _rand_saturation(key, x):
    x_mean = x.mean(axis=-1, keepdims=True)
    scale = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype) * 2.0
    return (x - x_mean) * scale + x_mean


def _rand_contrast(key, x):
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    scale = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype) + 0.5
    return (x - x_mean) * scale + x_mean


def _rand_translation(key, x, ratio: float = 0.125):
    """Random per-sample integer shift with zero padding (vqgan_loss.py:63-79)."""
    n, h, w, c = x.shape
    shift_h = int(h * ratio + 0.5)
    shift_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (n, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(kw, (n, 1, 1), -shift_w, shift_w + 1)

    grid_h = jnp.arange(h)[None, :, None]
    grid_w = jnp.arange(w)[None, None, :]
    src_h = jnp.clip(grid_h + th + 1, 0, h + 1)  # indices into padded array
    src_w = jnp.clip(grid_w + tw + 1, 0, w + 1)

    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    batch_idx = jnp.arange(n)[:, None, None]
    return x_pad[batch_idx, src_h, src_w]


def _rand_cutout(key, x, ratio: float = 0.5):
    n, h, w, c = x.shape
    cut_h = int(h * ratio + 0.5)
    cut_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    off_h = jax.random.randint(kh, (n, 1, 1), 0, h + (1 - cut_h % 2))
    off_w = jax.random.randint(kw, (n, 1, 1), 0, w + (1 - cut_w % 2))
    grid_h = jnp.arange(h)[None, :, None]
    grid_w = jnp.arange(w)[None, None, :]
    in_cut_h = (grid_h >= off_h - cut_h // 2) & (grid_h < off_h - cut_h // 2 + cut_h)
    in_cut_w = (grid_w >= off_w - cut_w // 2) & (grid_w < off_w - cut_w // 2 + cut_w)
    mask = 1.0 - (in_cut_h & in_cut_w).astype(x.dtype)
    return x * mask[..., None]


_POLICY_FNS: Dict[str, Tuple[Callable, ...]] = {
    "color": (_rand_brightness, _rand_saturation, _rand_contrast),
    "translation": (_rand_translation,),
    "cutout": (_rand_cutout,),
}


def diff_augment(key: jax.Array, x: jax.Array, policy: str = "color,translation") -> jax.Array:
    """Differentiable augmentation for GAN inputs (vqgan_loss.py:29-41), NHWC."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in _POLICY_FNS[p]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x
