"""Numeric parity of core ops vs torch — these semantics gate checkpoint
compatibility with the reference's weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.ops.blocks import AttnBlock, Downsample, GroupNorm, Upsample
from text2human_tpu.ops.nn import (
    bilinear_resize,
    nearest_downsample_mask,
    nearest_resize,
    nearest_upsample2x,
    swish,
)

torch = pytest.importorskip("torch")


def to_torch(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def from_torch(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_groupnorm_matches_torch(rng):
    c = 64
    x = rng.standard_normal((2, 8, 4, c)).astype(np.float32)
    scale = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)

    gn = GroupNorm()
    params = {"params": {"GroupNorm_0": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}}
    got = np.asarray(gn.apply(params, jnp.asarray(x)))

    tgn = torch.nn.GroupNorm(32, c, eps=1e-6)
    tgn.weight.data = torch.from_numpy(scale)
    tgn.bias.data = torch.from_numpy(bias)
    want = from_torch(tgn(to_torch(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_swish_matches_torch(rng):
    x = rng.standard_normal((4, 5)).astype(np.float32)
    got = np.asarray(swish(jnp.asarray(x)))
    want = (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_downsample_asymmetric_pad_matches_torch(rng):
    c = 8
    x = rng.standard_normal((1, 9, 7, c)).astype(np.float32)
    w = rng.standard_normal((c, c, 3, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal(c).astype(np.float32)

    down = Downsample()
    params = {
        "params": {
            "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
        }
    }
    got = np.asarray(down.apply(params, jnp.asarray(x)))

    xt = to_torch(x)
    xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
    conv = torch.nn.Conv2d(c, c, 3, stride=2, padding=0)
    conv.weight.data = torch.from_numpy(w)
    conv.bias.data = torch.from_numpy(b)
    want = from_torch(conv(xt))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((1, 4, 3, 2)).astype(np.float32)
    got = np.asarray(nearest_upsample2x(jnp.asarray(x)))
    want = from_torch(
        torch.nn.functional.interpolate(to_torch(x), scale_factor=2.0, mode="nearest")
    )
    np.testing.assert_allclose(got, want)


def test_nearest_resize_matches_torch(rng):
    x = rng.standard_normal((1, 12, 10, 3)).astype(np.float32)
    for size in [(6, 5), (4, 2), (24, 20), (3, 7)]:
        got = np.asarray(nearest_resize(jnp.asarray(x), size))
        want = from_torch(
            torch.nn.functional.interpolate(to_torch(x), size=size, mode="nearest")
        )
        np.testing.assert_allclose(got, want, err_msg=str(size))


def test_nearest_downsample_mask_matches_torch(rng):
    """texture mask downsampling to latent (vqgan_arch.py:222)."""
    mask = rng.integers(0, 18, (2, 32, 16)).astype(np.float32)
    got = np.asarray(nearest_downsample_mask(jnp.asarray(mask), (8, 4)))
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(mask)[:, None], size=(8, 4), mode="nearest"
        )[:, 0]
        .numpy()
    )
    np.testing.assert_allclose(got, want)


def test_bilinear_resize_matches_torch(rng):
    x = rng.standard_normal((1, 8, 6, 3)).astype(np.float32)
    # odd, non-integer ratios exercise the two-tap interpolation matrices
    # away from the exact-2x fast paths
    # odd ratios exercise the two-tap matrices away from exact-2x paths;
    # (1, 12) hits the out_size==1 align_corners scale-0 convention
    for size, align in [((16, 12), False), ((4, 3), False), ((16, 12), True),
                        ((11, 7), False), ((5, 9), False), ((11, 7), True),
                        ((1, 12), True), ((1, 3), False)]:
        got = np.asarray(bilinear_resize(jnp.asarray(x), size, align_corners=align))
        want = from_torch(
            torch.nn.functional.interpolate(
                to_torch(x), size=size, mode="bilinear", align_corners=align
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"{size},{align}")


def test_attn_block_matches_reference_math(rng):
    """Single-head full HWxHW attention (vqgan_arch.py:636-661)."""
    c, h, w = 8, 4, 3
    x = rng.standard_normal((1, h, w, c)).astype(np.float32)

    attn = AttnBlock()
    variables = attn.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(attn.apply(variables, jnp.asarray(x)))

    # torch-side reference using the same params
    p = variables["params"]

    def conv1x1(t, name):
        k = np.asarray(p[name]["kernel"])[0, 0]  # [I, O]
        bias = np.asarray(p[name]["bias"])
        return torch.einsum("nchw,co->nohw", t, torch.from_numpy(k)) + torch.from_numpy(
            bias
        ).view(1, -1, 1, 1)

    gn = torch.nn.GroupNorm(8, c, eps=1e-6)
    gn.weight.data = torch.from_numpy(np.asarray(p["norm"]["GroupNorm_0"]["scale"]))
    gn.bias.data = torch.from_numpy(np.asarray(p["norm"]["GroupNorm_0"]["bias"]))

    xt = to_torch(x)
    hn = gn(xt)
    q = conv1x1(hn, "q").reshape(1, c, h * w).permute(0, 2, 1)
    k = conv1x1(hn, "k").reshape(1, c, h * w)
    v = conv1x1(hn, "v").reshape(1, c, h * w)
    att = torch.bmm(q, k) * (c ** -0.5)
    att = torch.softmax(att, dim=2)
    out = torch.bmm(v, att.permute(0, 2, 1)).reshape(1, c, h, w)
    out = conv1x1(out, "proj_out")
    want = from_torch(xt + out)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fcn_transform_inputs_matches_torch(rng):
    """BaseDecodeHead._transform_inputs (fcn_arch.py:120-145): resize_concat
    bilinear-resizes every selected level to the first's size (both
    align_corners settings) and concatenates; multiple_select picks levels.
    Verified against the torch F.interpolate replica."""
    import dataclasses

    import torch
    import torch.nn.functional as F

    from text2human_tpu.config import FCNHeadConfig
    from text2human_tpu.models.fcn import transform_inputs

    levels = [
        rng.standard_normal((2, 16, 12, 3)).astype(np.float32),
        rng.standard_normal((2, 8, 6, 4)).astype(np.float32),
        rng.standard_normal((2, 4, 3, 5)).astype(np.float32),
    ]
    for ac in (False, True):
        cfg = FCNHeadConfig(
            in_index=(0, 1, 2), input_transform="resize_concat", align_corners=ac
        )
        got = np.asarray(transform_inputs(cfg, [jnp.asarray(v) for v in levels]))

        resized = [
            F.interpolate(
                torch.from_numpy(v).permute(0, 3, 1, 2),
                size=(16, 12),
                mode="bilinear",
                align_corners=ac,
            )
            for v in levels
        ]
        want = torch.cat(resized, dim=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"ac={ac}")

    ms = FCNHeadConfig(in_index=(2, 0), input_transform="multiple_select")
    picked = transform_inputs(ms, [jnp.asarray(v) for v in levels])
    assert len(picked) == 2
    np.testing.assert_array_equal(np.asarray(picked[0]), levels[2])
    np.testing.assert_array_equal(np.asarray(picked[1]), levels[0])

    # resize_concat through the full FCNHead (inner heads must not re-apply
    # the multi-level selection)
    from text2human_tpu.models.fcn import FCNHead, MultiHeadFCNHead

    head_cfg = dataclasses.replace(
        FCNHeadConfig(
            in_index=(0, 1), input_transform="resize_concat",
            channels=4, num_classes=5, num_convs=1, num_heads=2,
        ),
    )
    xs = [jnp.asarray(v) for v in levels[:2]]
    out, _ = FCNHead(head_cfg).init_with_output(jax.random.key(0), xs)
    assert out.shape == (2, 16, 12, 5)
    mh, _ = MultiHeadFCNHead(head_cfg).init_with_output(jax.random.key(0), xs)
    assert mh.shape == (2, 16, 12, 2, 5)


def test_deconv_module_matches_torch(rng):
    """DeconvModule (unet_arch.py:183-240): ConvTranspose2d(k=4,s=2,p=1) +
    BN + ReLU; kernel imported in the torch [in,out,kh,kw] layout."""
    import torch

    from text2human_tpu.models.unet import DeconvModule

    x = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(3, 7, 4, stride=2, padding=1)
    tbn = torch.nn.BatchNorm2d(7).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(7) + 0.5)
        tbn.bias.copy_(torch.rand(7) - 0.5)
        want = (
            torch.relu(tbn(tconv(torch.from_numpy(x).permute(0, 3, 1, 2))))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    mod = DeconvModule(7)
    vars_ = mod.init(jax.random.key(0), jnp.asarray(x))
    params = {
        "deconv": {
            "kernel": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        },
        "bn": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
    }
    got = mod.apply(
        {"params": params, "batch_stats": vars_["batch_stats"]}, jnp.asarray(x)
    )
    assert got.shape == (2, 12, 10, 7)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="kernel_size"):
        DeconvModule(7, kernel_size=3, scale_factor=2).init(
            jax.random.key(0), jnp.asarray(x)
        )

    # UpConvBlock can select it in place of InterpConv
    from text2human_tpu.models.unet import UpConvBlock

    skip = jnp.asarray(rng.standard_normal((2, 12, 10, 7)).astype(np.float32))
    blk = UpConvBlock(7, upsample="deconv")
    out, _ = blk.init_with_output(jax.random.key(1), skip, jnp.asarray(x))
    assert out.shape == (2, 12, 10, 7)


def test_timestep_embedding_matches_torch(rng):
    """get_timestep_embedding (vqgan_arch.py:489-507): DDPM sinusoidal
    embedding, exact vs the torch reference formula (odd dims zero-pad)."""
    import math

    import torch

    from text2human_tpu.ops.blocks import get_timestep_embedding

    t_np = rng.integers(0, 1000, (7,)).astype(np.int64)
    for dim in (16, 17):
        got = np.asarray(get_timestep_embedding(jnp.asarray(t_np), dim))

        half = dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        emb = torch.from_numpy(t_np).float()[:, None] * emb[None, :]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
        if dim % 2 == 1:
            emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
        np.testing.assert_allclose(got, emb.numpy(), atol=1e-6)
