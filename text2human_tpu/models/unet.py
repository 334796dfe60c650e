"""mmcv-free UNet backbones (NHWC flax.linen).

Parity targets (reference models/archs/unet_arch.py):
  BasicConvBlock :110-180  num_convs x (Conv3x3 + BN + ReLU)
  InterpConv     :243-314  bilinear 2x upsample + Conv1x1 + BN + ReLU
  UpConvBlock    :12-107   upsample high-level, concat skip, conv block
  UNet           :317-500  5 stages, MaxPool downsampling, returns ALL decoder
                           outputs (:470-481)
  ShapeUNet      :503-693  UNet whose every encoder stage input is concatenated
                           with a broadcast 128-d attribute embedding (:657-668)

BatchNorm running statistics live in the ``batch_stats`` collection; pass
``train=True`` and make it mutable during training.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.config import UNetConfig
from text2human_tpu.ops.nn import bilinear_resize


class ConvModule(nn.Module):
    """Conv3x3(or kxk) + BatchNorm + ReLU (mmcv ConvModule with default cfg).

    ``dtype`` is the compute dtype for the whole conv+BN+ReLU unit.  Params
    (and BatchNorm running statistics) stay float32.  Unlike the VQGAN
    stacks' GroupNorm — which computes statistics from the data and therefore
    stays f32 — inference BatchNorm is a pure per-channel affine from the
    running stats, so bf16 is safe and keeps the inter-op HBM traffic halved
    (these UNet stages are bandwidth-bound at 512x256, not FLOP-bound).
    Training configs keep compute_dtype float32, where BN computes its batch
    statistics in f32 as before."""

    out_channels: int
    kernel_size: int = 3
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        x = nn.Conv(
            self.out_channels,
            (k, k),
            padding="SAME" if k > 1 else "VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class BasicConvBlock(nn.Module):
    out_channels: int
    num_convs: int = 2
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_convs):
            x = ConvModule(
                self.out_channels, train=self.train, dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
        return x


class InterpConv(nn.Module):
    """Bilinear 2x upsample followed by 1x1 ConvModule (unet_arch.py:243-314)."""

    out_channels: int
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = bilinear_resize(x, (h * 2, w * 2), align_corners=False)
        return ConvModule(
            self.out_channels, kernel_size=1, train=self.train,
            dtype=self.dtype, name="conv",
        )(x)


class DeconvModule(nn.Module):
    """Transposed-conv 2x upsample + BN + ReLU (unet_arch.py:183-240).

    The mmcv alternative upsample layer (registered but unused by every
    shipped config — InterpConv is the configured choice); kernel/scale
    constraints mirror the reference assert (kernel >= scale, even
    difference -> padding (k - s) / 2)."""

    out_channels: int
    kernel_size: int = 4
    scale_factor: int = 2
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.scale_factor
        if k < s or (k - s) % 2 != 0:
            raise ValueError(
                f"kernel_size {k} must be >= scale_factor {s} with an even "
                "difference (unet_arch.py:212-218)"
            )
        pad = (k - s) // 2
        # torch ConvTranspose2d(padding=p) crops p from each side of the
        # full (dilated) output
        x = nn.ConvTranspose(
            self.out_channels,
            (k, k),
            strides=(s, s),
            padding=[(k - 1 - pad, k - 1 - pad)] * 2,
            transpose_kernel=True,
            name="deconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


class UpConvBlock(nn.Module):
    out_channels: int
    num_convs: int = 2
    train: bool = False
    upsample: str = "interp"  # 'interp' (all configs) | 'deconv'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skip: jax.Array, x: jax.Array) -> jax.Array:
        if self.upsample == "deconv":
            x = DeconvModule(
                self.out_channels, train=self.train, name="upsample"
            )(x)
        elif self.upsample == "interp":
            x = InterpConv(
                self.out_channels, train=self.train, dtype=self.dtype,
                name="upsample",
            )(x)
        else:
            # the mmcv upsample registry raises on unknown layer types; a
            # silent fallback would train the wrong architecture
            raise ValueError(
                f"unknown upsample {self.upsample!r} (expected 'interp' or 'deconv')"
            )
        x = jnp.concatenate([skip, x], axis=-1)
        return BasicConvBlock(
            self.out_channels, self.num_convs, train=self.train,
            dtype=self.dtype, name="conv_block",
        )(x)


class UNet(nn.Module):
    cfg: UNetConfig
    train: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, attr_embedding: Optional[jax.Array] = None
    ) -> List[jax.Array]:
        """Returns all decoder outputs [bottleneck, ..., full-res] like the
        reference (unet_arch.py:470-481).  If ``attr_embedding`` [N, E] is
        given, it is broadcast-concatenated at every encoder stage input
        (ShapeUNet behaviour, unet_arch.py:657-668)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        enc_outs = []
        for i in range(cfg.num_stages):
            if attr_embedding is not None:
                n, h, w, _ = x.shape
                emb = jnp.broadcast_to(
                    attr_embedding[:, None, None, :],
                    (n, h, w, attr_embedding.shape[-1]),
                )
                x = jnp.concatenate([x, emb], axis=-1)
            if i != 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = BasicConvBlock(
                cfg.base_channels * 2 ** i,
                cfg.enc_num_convs[i],
                train=self.train,
                dtype=dtype,
                name=f"enc_{i}",
            )(x)
            enc_outs.append(x)

        dec_outs = [x]
        for i in reversed(range(cfg.num_stages - 1)):
            x = UpConvBlock(
                cfg.base_channels * 2 ** i,
                cfg.dec_num_convs[i],
                train=self.train,
                dtype=dtype,
                name=f"dec_{i}",
            )(enc_outs[i], x)
            dec_outs.append(x)
        return dec_outs


class ShapeUNet(nn.Module):
    """UNet with attribute-embedding conditioning at every encoder stage."""

    cfg: UNetConfig
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, attr_embedding: jax.Array) -> List[jax.Array]:
        return UNet(self.cfg, train=self.train, name="unet")(x, attr_embedding)
