"""Taming-style building blocks as flax.linen modules (NHWC).

Behavioral parity targets (reference models/archs/vqgan_arch.py):
  Normalize      :515-517  GroupNorm(32, eps=1e-6, affine)
  Upsample       :520-534  nearest 2x + optional 3x3 conv
  Downsample     :537-554  asymmetric (0,1,0,1) pad + 3x3 stride-2 conv
  ResnetBlock    :557-617  GN-swish-conv x2 + (nin|conv) shortcut
  AttnBlock      :620-661  single-head full HWxHW attention
  get_timestep_embedding :489-507  DDPM sinusoidal embedding
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.ops.nn import nearest_upsample2x, swish


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int) -> jax.Array:
    """DDPM sinusoidal timestep embedding (vqgan_arch.py:489-507; used there
    only by the dead-code DDPM ``Model``, kept for drop-in parity).

    timesteps: [N] -> [N, embedding_dim] f32 ([sin | cos], odd dims zero-pad).
    """
    import math

    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm(nn.Module):
    """GroupNorm(32) with eps 1e-6, matching the reference Normalize().

    Statistics are always accumulated in float32; the result is cast back to
    the input dtype (safe mixed precision)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # deliberate divergence: torch GroupNorm(32, ch) refuses ch % 32 != 0
        # at construction, which would forbid every tiny debug/test geometry
        # in configs/debug.  Channel counts below 32 lower the group count
        # (per-channel norm at the extreme); all golden-parity tests use
        # ch >= 32 where numerics must match the reference exactly.
        groups = min(self.num_groups, x.shape[-1])
        out = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(x.dtype)


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample2x(x)
        if self.with_conv:
            x = nn.Conv(
                x.shape[-1], (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.with_conv:
            # torch pads (left=0, right=1, top=0, bottom=1) then VALID stride-2
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32, name="conv",
            )(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)

        h = GroupNorm(name="norm1")(x)
        h = swish(h)
        h = conv(out_ch, (3, 3), padding="SAME", name="conv1")(h)

        if temb is not None:
            # DDPM timestep conditioning (vqgan_arch.py:602-603); only the
            # dead-code DDPM Model passes temb — the VQGAN stacks call with
            # None and create no temb_proj parameter
            h = h + nn.Dense(
                out_ch, dtype=self.dtype, param_dtype=jnp.float32,
                name="temb_proj",
            )(swish(temb))[:, None, None, :]

        h = GroupNorm(name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv(out_ch, (3, 3), padding="SAME", name="conv2")(h)

        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv(out_ch, (3, 3), padding="SAME", name="conv_shortcut")(x)
            else:
                x = conv(out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full spatial self-attention over H*W positions.
    Softmax/logits accumulate in float32 regardless of activation dtype."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        hid = GroupNorm(name="norm")(x)
        q = conv(c, (1, 1), name="q")(hid).reshape(b, h * w, c)
        k = conv(c, (1, 1), name="k")(hid).reshape(b, h * w, c)
        v = conv(c, (1, 1), name="v")(hid).reshape(b, h * w, c)

        scale = c ** -0.5
        attn = jnp.einsum(
            "bic,bjc->bij", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v, preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, c).astype(x.dtype)
        out = conv(c, (1, 1), name="proj_out")(out)
        return x + out
