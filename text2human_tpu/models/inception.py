"""InceptionV3 pool3 feature extractor for standard FID (flax, NHWC).

The reference repo reports FID only in the paper (BASELINE.md); the standard
evaluator uses InceptionV3's 2048-d pool3 features.  This is the torchvision
``inception_v3`` architecture (eval mode, aux logits unused) with module
names chosen to mirror the torchvision state-dict layout so
:func:`inception_params_from_torch` is a mechanical rename.

Notes
- Weights: convert torchvision's ``inception_v3`` checkpoint (or the
  pt_inception-2015-12-05 FID weights — same layout; that variant differs
  only in using count_exclude-pad average pools in A/C blocks and a max pool
  in the final E block, a sub-0.1-FID-scale difference).
- Inputs to :func:`pool3_features`: NHWC float images in [0, 1]; they are
  bilinear-resized to 299x299 and scaled to [-1, 1] like pytorch-fid.
- Without converted weights, ``utils/fid.py`` keeps the VGG fallback.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from text2human_tpu.ops.nn import bilinear_resize


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.out_ch,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


def _avg3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(self.c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(self.c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(self.c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(self.c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(self.c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(self.c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Trunk up to the global average pool: NHWC [N,299,299,3] -> [N, 2048]."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _max3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # [N, 2048]


def inception_feature_extractor(variables: Dict[str, Any]):
    """FID-standard extractor: images [0,1] NHWC -> 2048-d pool3 features."""
    net = InceptionV3Pool3()

    @jax.jit
    def extract(images01: jax.Array) -> jax.Array:
        x = bilinear_resize(images01.astype(jnp.float32), (299, 299))
        x = x * 2.0 - 1.0
        return net.apply(variables, x)

    return extract


def inception_params_from_torch(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision ``inception_v3`` state dict -> flax variables.

    Keys look like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}``; AuxLogits/fc entries are
    ignored.  Conv kernels transpose OIHW -> HWIO.
    """

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path: List[str], leaf_name: str, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] in ("AuxLogits", "fc"):
            continue
        *path, unit, leaf = parts  # e.g. ['Mixed_5b','branch1x1'],'conv','weight'
        module_path = path + [unit]
        if unit == "conv" and leaf == "weight":
            put(params, module_path, "kernel", np_(value).transpose(2, 3, 1, 0))
        elif unit == "bn" and leaf in ("weight", "bias"):
            put(params, module_path, "scale" if leaf == "weight" else "bias", np_(value))
        elif unit == "bn" and leaf in ("running_mean", "running_var"):
            put(stats, module_path, leaf[len("running_"):], np_(value))
        elif leaf == "num_batches_tracked":
            continue
    return {"params": params, "batch_stats": stats}
