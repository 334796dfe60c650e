"""Small functional ops shared across the framework.  NHWC layout throughout."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (reference models/archs/vqgan_arch.py:510-512)."""
    return x * jax.nn.sigmoid(x)


def nearest_resize(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize of an NHWC tensor to (H, W).

    Matches torch ``F.interpolate(mode='nearest')`` semantics: source index is
    ``floor(dst * scale)`` with ``scale = src/dst`` (exact for the integer
    up/down factors used throughout this pipeline).
    """
    n, h, w, c = x.shape
    out_h, out_w = size
    if (out_h, out_w) == (h, w):
        return x
    rows = (jnp.arange(out_h) * h // out_h).astype(jnp.int32)
    cols = (jnp.arange(out_w) * w // out_w).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def nearest_upsample2x(x: jax.Array) -> jax.Array:
    """2x nearest upsample of NHWC, cheap repeat form (vqgan_arch.py:529-531)."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def nearest_downsample_mask(mask: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-downsample an integer/float NHW(C) mask to (H, W).

    Used to bring the texture mask to latent resolution
    (reference models/archs/vqgan_arch.py:222, 385-389).
    """
    squeeze = False
    if mask.ndim == 3:
        mask = mask[..., None]
        squeeze = True
    out = nearest_resize(mask, size)
    return out[..., 0] if squeeze else out


def bilinear_resize(x: jax.Array, size: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Bilinear resize of NHWC matching torch align_corners=False semantics."""
    n, h, w, c = x.shape
    out_h, out_w = size
    if (out_h, out_w) == (h, w):
        return x
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, out_h)
        xs = jnp.linspace(0.0, w - 1.0, out_w)
    else:
        ys = (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
        xs = (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]

    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def one_hot_segm(segm: jax.Array, num_classes: int) -> jax.Array:
    """[N,H,W] int parsing map -> [N,H,W,C] float one-hot
    (reference models/vqgan_model.py:119-126, NHWC instead of NCHW)."""
    return jax.nn.one_hot(segm.astype(jnp.int32), num_classes, dtype=jnp.float32)
