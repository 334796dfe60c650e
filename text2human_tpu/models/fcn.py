"""FCN decode heads (NHWC flax.linen).

Parity targets (reference models/archs/fcn_arch.py):
  FCNHead          :159-225  convs -> optional concat -> dropout2d -> 1x1 cls
  MultiHeadFCNHead :228-418  18 independent branches; here one nn.vmap'd
                             branch with stacked [18, ...] params so the 18
                             branch convs run as a single batched conv.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.config import FCNHeadConfig
from text2human_tpu.models.unet import ConvModule
from text2human_tpu.ops.nn import bilinear_resize


def transform_inputs(cfg: FCNHeadConfig, inputs):
    """BaseDecodeHead._transform_inputs (reference fcn_arch.py:120-145).

    'resize_concat': pick cfg.in_index levels, bilinear-resize all to the
    first's spatial size (align_corners per config) and concat on channels;
    'multiple_select': pick the levels; default: single index pick.  Every
    shipped reference config uses the default int-index mode."""
    if cfg.input_transform is not None and not isinstance(
        cfg.in_index, (tuple, list)
    ):
        # mmseg asserts list-typed in_index whenever input_transform is set
        # (fcn_arch.py:104-105); fail at config time, not with an opaque
        # TypeError mid-trace
        raise ValueError(
            f"input_transform={cfg.input_transform!r} needs a tuple in_index "
            f"(got {cfg.in_index!r})"
        )
    if cfg.input_transform == "resize_concat":
        xs = [inputs[i] for i in cfg.in_index]
        target = xs[0].shape[1:3]
        xs = [bilinear_resize(x, target, cfg.align_corners) for x in xs]
        return jnp.concatenate(xs, axis=-1)
    if cfg.input_transform == "multiple_select":
        return [inputs[i] for i in cfg.in_index]
    return inputs[cfg.in_index] if isinstance(inputs, (list, tuple)) else inputs


class FCNHead(nn.Module):
    cfg: FCNHeadConfig
    train: bool = False

    @nn.compact
    def __call__(self, inputs: Union[jax.Array, Sequence[jax.Array]]) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = transform_inputs(cfg, inputs)
        if isinstance(x, list):
            raise ValueError(
                "FCNHead consumes one tensor; 'multiple_select' is only for "
                "heads that accept multi-level lists (use 'resize_concat')"
            )
        out = x
        for i in range(cfg.num_convs):
            out = ConvModule(
                cfg.channels, cfg.kernel_size, train=self.train, dtype=dtype,
                name=f"conv_{i}",
            )(out)
        if cfg.num_convs == 0:
            out = x
        if cfg.concat_input:
            out = ConvModule(
                cfg.channels, cfg.kernel_size, train=self.train, dtype=dtype,
                name="conv_cat",
            )(jnp.concatenate([x, out], axis=-1))
        if cfg.dropout_ratio > 0:
            # torch Dropout2d zeroes whole channels -> broadcast over H, W
            out = nn.Dropout(
                cfg.dropout_ratio,
                broadcast_dims=(1, 2),
                deterministic=not self.train,
            )(out)
        out = nn.Conv(
            cfg.num_classes,
            (1, 1),
            kernel_init=nn.initializers.normal(stddev=0.01),
            dtype=dtype,
            param_dtype=jnp.float32,
            name="conv_seg",
        )(out)
        # logits leave in f32 regardless of the conv compute dtype (same
        # convention as the VQGAN Encoder's conv_out)
        return out.astype(jnp.float32)


class MultiHeadFCNHead(nn.Module):
    """18-branch FCN head, vectorized over the head axis with nn.vmap.

    Returns logits [N, H, W, K, num_classes] — the stacked equivalent of the
    reference's list of 18 [N, C, H, W] tensors (fcn_arch.py:333-348).
    """

    cfg: FCNHeadConfig
    train: bool = False

    @nn.compact
    def __call__(self, inputs: Union[jax.Array, Sequence[jax.Array]]) -> jax.Array:
        cfg = self.cfg
        x = transform_inputs(cfg, inputs)
        if isinstance(x, list):
            raise ValueError(
                "MultiHeadFCNHead consumes one tensor; 'multiple_select' is "
                "only for heads that accept multi-level lists (use "
                "'resize_concat')"
            )

        VmapHead = nn.vmap(
            FCNHead,
            in_axes=None,
            out_axes=0,
            axis_size=cfg.num_heads,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
        )
        # x is already transformed; the inner per-branch head must not
        # re-apply the multi-level selection to the plain tensor
        inner = dataclasses.replace(cfg, input_transform=None)
        out = VmapHead(inner, train=self.train, name="heads")(x)  # [K, N, H, W, C]
        return jnp.moveaxis(out, 0, 3)  # [N, H, W, K, C]
