"""LPIPS perceptual loss (VGG16 backbone) in flax, NHWC.

The reference uses the ``lpips`` pip package (models/vqgan_model.py:6,252:
``lpips.LPIPS(net='vgg')``).  Here the VGG16 feature tower and the learned
linear calibration layers are implemented natively; pretrained torch weights
(torchvision VGG16 + lpips lin heads) can be imported with
``lpips_params_from_torch``.  Without pretrained weights the module still
works as a (randomly-projected) deep feature distance — quality-gated tests
and training configs should load real weights for parity runs.

Inputs are expected in [-1, 1] like the reference training images.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (out_channels, layers) per block; maxpool between blocks.
_VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# Channel-wise input normalization of the lpips ScalingLayer.
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class VGG16Features(nn.Module):
    """VGG16 tower returning post-ReLU features at the end of each block
    (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        x = x.astype(self.dtype)
        for b, (ch, n_layers) in enumerate(_VGG_PLAN):
            for i in range(n_layers):
                x = nn.Conv(
                    ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{b}_{i}",
                )(x)
                x = nn.relu(x)
            feats.append(x)
            if b < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Learned perceptual distance: sum_l mean_hw( lin_l( (f_l(x)-f_l(y))^2 ) ).

    ``dtype`` runs the VGG tower in reduced precision; normalization and the
    distance accumulation stay float32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(x)
        fy = vgg(y)

        total = 0.0
        for l, (a, b) in enumerate(zip(fx, fy)):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            lin = self.param(
                "lin_%d" % l,
                nn.initializers.ones,
                (diff.shape[-1],),
            )
            # lpips lin layers are 1x1 convs with non-negative weights
            w = jnp.abs(lin)
            dist = jnp.sum(diff * w[None, None, None, :], axis=-1, keepdims=True)
            total = total + jnp.mean(dist, axis=(1, 2), keepdims=True)
        return total  # [N,1,1,1], matches torch lpips output shape semantics


def save_lpips_npz(variables: Dict[str, Any], path: str) -> None:
    """Save converted LPIPS variables as a flat .npz ('vgg/conv0_0/kernel'...)."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(variables["params"], "")
    np.savez(path, **flat)


def load_lpips_vars(path: str) -> Dict[str, Any]:
    """Load pretrained LPIPS variables for parity training runs.

    Accepts:
      * ``.npz`` written by :func:`save_lpips_npz` (flat 'a/b/c' keys);
      * a torch ``.pth``/``.pt`` state dict in either torchvision layout
        ('features.{i}.weight') or lpips-package layout
        ('net.slice{k}.{i}.weight' — the slice wrappers keep the original
        torchvision feature indices), plus 'lin{l}.model.1.weight' heads
        (reference models/vqgan_model.py:252, lpips.LPIPS(net='vgg')).
    """
    if path.endswith(".npz"):
        flat = np.load(path)
        params: Dict[str, Any] = {}
        for key in flat.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(flat[key])
        return {"params": params}

    import re

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    vgg_state: Dict[str, Any] = {}
    lin_state: Dict[str, Any] = {}
    for k, v in sd.items():
        m = re.match(r"^(?:net\.slice\d+|features)\.(\d+)\.(weight|bias)$", k)
        if m:
            vgg_state[f"features.{m.group(1)}.{m.group(2)}"] = v
            continue
        m = re.match(r"^lin(\d+)\.model\.1\.weight$", k)
        if m:
            lin_state[k] = v
    if not vgg_state or not lin_state:
        raise ValueError(
            f"{path}: expected torchvision VGG16 'features.*' (or lpips "
            f"'net.slice*') keys plus 'lin*.model.1.weight' heads; got "
            f"{len(vgg_state)} conv / {len(lin_state)} lin tensors"
        )
    return lpips_params_from_torch(vgg_state, lin_state)


def lpips_params_from_torch(
    vgg_state: Dict[str, Any], lin_state: Dict[str, Any]
) -> Dict[str, Any]:
    """Convert torchvision VGG16 ``features`` state-dict + lpips lin weights.

    vgg_state keys: 'features.{idx}.weight'/'bias' with idx the sequential
    position of each conv; lin_state keys: 'lin{l}.model.1.weight' of shape
    [1, C, 1, 1].
    """
    params: Dict[str, Any] = {"vgg": {}}
    conv_indices = []
    idx = 0
    for ch, n_layers in _VGG_PLAN:
        for _ in range(n_layers):
            conv_indices.append(idx)
            idx += 2  # conv + relu
        idx += 1  # maxpool

    flat = 0
    for b, (ch, n_layers) in enumerate(_VGG_PLAN):
        for i in range(n_layers):
            seq = conv_indices[flat]
            flat += 1
            w = np.asarray(vgg_state[f"features.{seq}.weight"])  # [O,I,kh,kw]
            bias = np.asarray(vgg_state[f"features.{seq}.bias"])
            params["vgg"][f"conv{b}_{i}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
                "bias": jnp.asarray(bias),
            }

    for l in range(len(_VGG_PLAN)):
        w = np.asarray(lin_state[f"lin{l}.model.1.weight"])  # [1,C,1,1]
        params[f"lin_{l}"] = jnp.asarray(w.reshape(-1))
    return {"params": params}
