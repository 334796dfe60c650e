"""Patch fold/unfold for the bottom-level spatial quantizer.

The reference uses F.unfold/F.fold with a row-major (c, ph, pw) channel order
(models/archs/vqgan_arch.py:312-326, 441-445).  On TPU these are pure reshapes
and transposes, which XLA fuses away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_patches(x: jax.Array, patch: int) -> jax.Array:
    """NHWC -> [N, H/p, W/p, C*p*p], feature order (c, ph, pw) like F.unfold.

    F.unfold on NCHW produces per-patch vectors ordered channel-major then
    row-major within the patch; we replicate that ordering so codebooks learned
    in either frontend are interchangeable.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // patch, patch, w // patch, patch, c)
    # -> [n, h/p, w/p, c, ph, pw]
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // patch, w // patch, c * patch * patch)


def patches_to_space(x: jax.Array, patch: int, channels: int) -> jax.Array:
    """Inverse of space_to_patches: [N, Hp, Wp, C*p*p] -> [N, Hp*p, Wp*p, C]."""
    n, hp, wp, _ = x.shape
    x = x.reshape(n, hp, wp, channels, patch, patch)
    # -> [n, hp, ph, wp, pw, c]
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, hp * patch, wp * patch, channels)
