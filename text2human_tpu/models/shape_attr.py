"""Shape-attribute embedder.

Parity target: reference models/archs/shape_attr_embedding_arch.py:6-35 —
15 per-attribute (one-hot -> dim -> dim) MLPs with LeakyReLU, concatenated and
fused through (15*dim -> out_dim -> out_dim).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.config import ShapeAttrConfig


class ShapeAttrEmbedding(nn.Module):
    cfg: ShapeAttrConfig

    @nn.compact
    def __call__(self, attr: jax.Array) -> jax.Array:
        """attr: [N, num_attrs] int -> [N, out_dim] float."""
        cfg = self.cfg
        embeds = []
        for idx, cls_num in enumerate(cfg.cls_num_list):
            one_hot = jax.nn.one_hot(attr[:, idx], cls_num, dtype=jnp.float32)
            h = nn.Dense(cfg.dim, name=f"attr_{idx}_fc1")(one_hot)
            h = nn.leaky_relu(h, negative_slope=0.01)
            h = nn.Dense(cfg.dim, name=f"attr_{idx}_fc2")(h)
            embeds.append(h)
        h = jnp.concatenate(embeds, axis=-1)
        h = nn.Dense(cfg.out_dim, name="fusion_fc1")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Dense(cfg.out_dim, name="fusion_fc2")(h)
        return h
