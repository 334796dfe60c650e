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


def _interp_matrix(out_size: int, in_size: int, align_corners: bool) -> jax.Array:
    """[out, in] row-stochastic bilinear interpolation matrix (two taps/row)."""
    if align_corners:
        # out_size == 1: torch's align_corners scale is 0 -> samples index 0
        # (same as jnp.linspace(0, in-1, 1)); the half-pixel branch would
        # sample the center instead
        pos = jnp.linspace(0.0, in_size - 1.0, out_size)
    else:
        pos = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        pos = jnp.clip(pos, 0.0, in_size - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    f = (pos - i0).astype(jnp.float32)
    return (
        jax.nn.one_hot(i0, in_size, dtype=jnp.float32) * (1.0 - f)[:, None]
        + jax.nn.one_hot(i1, in_size, dtype=jnp.float32) * f[:, None]
    )


def bilinear_resize(x: jax.Array, size: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Bilinear resize of NHWC matching torch align_corners semantics.

    Implemented as two separable interpolation matmuls (``A_h @ x @ A_w^T``)
    rather than corner gathers: on TPU the contraction runs on the MXU and —
    decisively — its VJP is just the transposed matmuls.  A gather-based
    resize differentiates to 4 scatter-adds per call, which at this
    pipeline's 512x256 maps made the XLA TPU backward compile of the
    parsing-gen ShapeUNet (4 upsamples + full-res FCN resize) effectively
    hang (>20 min, observed on hardware); the matmul form compiles in
    seconds and is numerically identical up to float associativity.
    """
    n, h, w, c = x.shape
    out_h, out_w = size
    if (out_h, out_w) == (h, w):
        return x
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    out = x.astype(dt)
    if out_h != h:
        a_h = _interp_matrix(out_h, h, align_corners).astype(dt)
        out = jnp.einsum("Hh,nhwc->nHwc", a_h, out)
    if out_w != w:
        a_w = _interp_matrix(out_w, w, align_corners).astype(dt)
        out = jnp.einsum("Ww,nhwc->nhWc", a_w, out)
    return out.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else out


def one_hot_segm(segm: jax.Array, num_classes: int) -> jax.Array:
    """[N,H,W] int parsing map -> [N,H,W,C] float one-hot
    (reference models/vqgan_model.py:119-126, NHWC instead of NCHW)."""
    return jax.nn.one_hot(segm.astype(jnp.int32), num_classes, dtype=jnp.float32)
