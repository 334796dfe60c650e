"""Minimal mmcv/mmseg stand-ins so the reference ``unet_arch.py`` /
``fcn_arch.py`` import for golden parity tests (mmcv is not in this image).

Implements exactly the API surface those two files touch, with mmcv's
semantics (the golden comparison is only as faithful as this stub):
  ConvModule        conv -> BN -> ReLU; bias='auto' disables the conv bias
                    when a norm layer is present; norm module registered
                    under the name from build_norm_layer ('bn')
  build_norm_layer  BN -> ('bn', nn.BatchNorm2d(ch))  (eps 1e-5 default)
  build_activation_layer  ReLU(inplace)
  UPSAMPLE_LAYERS / build_upsample_layer   registry + type-keyed construction
  kaiming_init / constant_init / normal_init
  mmcv.runner.load_checkpoint (unused at construction; raises)
  mmcv.utils.parrots_wrapper._BatchNorm
  mmseg.utils.get_root_logger, mmseg.ops.resize (F.interpolate)
"""

from __future__ import annotations

import logging
import sys
import types

import torch.nn as nn
import torch.nn.functional as F


def build_norm_layer(cfg, num_features):
    assert cfg["type"] == "BN", cfg
    return "bn", nn.BatchNorm2d(num_features)


def build_activation_layer(cfg):
    if cfg["type"] == "ReLU":
        return nn.ReLU(inplace=True)
    if cfg["type"] == "LeakyReLU":
        return nn.LeakyReLU(cfg.get("negative_slope", 0.01), inplace=True)
    raise KeyError(cfg)


class ConvModule(nn.Module):
    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups=1,
        bias="auto",
        conv_cfg=None,
        norm_cfg=None,
        act_cfg=dict(type="ReLU"),
        inplace=True,
        order=("conv", "norm", "act"),
        **kwargs,
    ):
        super().__init__()
        assert conv_cfg is None, "only plain Conv2d is used by the reference"
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.order = order
        self.conv = nn.Conv2d(
            in_channels, out_channels, kernel_size,
            stride=stride, padding=padding, dilation=dilation,
            groups=groups, bias=bias,
        )
        if self.with_norm:
            self.norm_name, norm = build_norm_layer(norm_cfg, out_channels)
            self.add_module(self.norm_name, norm)
        if self.with_activation:
            self.activate = build_activation_layer(act_cfg)

    def forward(self, x):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and self.with_norm:
                x = getattr(self, self.norm_name)(x)
            elif layer == "act" and self.with_activation:
                x = self.activate(x)
        return x


class _Registry:
    def __init__(self):
        self._map = {}

    def register_module(self, name=None):
        def deco(cls):
            self._map[name or cls.__name__] = cls
            return cls

        return deco

    def get(self, name):
        return self._map[name]


UPSAMPLE_LAYERS = _Registry()


def build_upsample_layer(cfg, *args, **kwargs):
    cfg = dict(cfg)
    cls = UPSAMPLE_LAYERS.get(cfg.pop("type"))
    return cls(*args, **kwargs, **cfg)


def kaiming_init(module, **kw):
    nn.init.kaiming_normal_(module.weight, nonlinearity="relu")
    if getattr(module, "bias", None) is not None:
        nn.init.zeros_(module.bias)


def constant_init(module, val, bias=0):
    if getattr(module, "weight", None) is not None:
        nn.init.constant_(module.weight, val)
    if getattr(module, "bias", None) is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    nn.init.normal_(module.weight, mean, std)
    if getattr(module, "bias", None) is not None:
        nn.init.constant_(module.bias, bias)


def load_checkpoint(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("stub: pretrained loading is not exercised")


def resize(input, size=None, scale_factor=None, mode="nearest", align_corners=None, warning=True):
    return F.interpolate(
        input, size=size, scale_factor=scale_factor, mode=mode,
        align_corners=align_corners,
    )


def install():
    """Register the fake mmcv/mmseg modules in sys.modules (idempotent)."""
    if "mmcv" in sys.modules and not getattr(sys.modules["mmcv"], "_t2h_stub", False):
        return  # a real mmcv is present; leave it alone
    mmcv = types.ModuleType("mmcv")
    mmcv._t2h_stub = True
    cnn = types.ModuleType("mmcv.cnn")
    runner = types.ModuleType("mmcv.runner")
    utils = types.ModuleType("mmcv.utils")
    pw = types.ModuleType("mmcv.utils.parrots_wrapper")
    mmseg = types.ModuleType("mmseg")
    mutils = types.ModuleType("mmseg.utils")
    mops = types.ModuleType("mmseg.ops")

    cnn.ConvModule = ConvModule
    cnn.build_norm_layer = build_norm_layer
    cnn.build_activation_layer = build_activation_layer
    cnn.build_upsample_layer = build_upsample_layer
    cnn.UPSAMPLE_LAYERS = UPSAMPLE_LAYERS
    cnn.kaiming_init = kaiming_init
    cnn.constant_init = constant_init
    cnn.normal_init = normal_init
    runner.load_checkpoint = load_checkpoint
    pw._BatchNorm = nn.modules.batchnorm._BatchNorm
    mutils.get_root_logger = lambda *a, **k: logging.getLogger("mmseg")
    mops.resize = resize

    mmcv.cnn = cnn
    mmcv.runner = runner
    mmcv.utils = utils
    utils.parrots_wrapper = pw
    mmseg.utils = mutils
    mmseg.ops = mops
    for name, mod in [
        ("mmcv", mmcv), ("mmcv.cnn", cnn), ("mmcv.runner", runner),
        ("mmcv.utils", utils), ("mmcv.utils.parrots_wrapper", pw),
        ("mmseg", mmseg), ("mmseg.utils", mutils), ("mmseg.ops", mops),
    ]:
        sys.modules[name] = mod
