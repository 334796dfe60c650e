"""DDPM UNet (reference models/archs/vqgan_arch.py:664-815 ``Model``).

Dead code in the reference (never imported by any entry point or config) —
implemented for complete drop-in parity: a taming-style symmetric UNet with
timestep conditioning (sinusoidal embedding -> 2-layer MLP -> per-ResnetBlock
projection), skip connections from every down block, and attention at
``attn_resolutions``.  Converter: ``utils/torch_import.py:ddpm_model_params``;
golden forward parity vs the reference class is tested in
tests/test_golden_parity.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.config import VQGANConfig
from text2human_tpu.models.vqgan import _block_types, _conv
from text2human_tpu.ops.blocks import (
    Downsample,
    GroupNorm,
    Upsample,
    get_timestep_embedding,
)
from text2human_tpu.ops.nn import swish


class DDPMUNet(nn.Module):
    """≙ reference ``Model``: forward(x, t) -> out_ch map at input resolution."""

    cfg: VQGANConfig
    use_timestep: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        num_res = cfg.num_resolutions
        Res, Attn = _block_types(cfg)
        Conv = _conv(cfg)
        dtype = jnp.dtype(cfg.compute_dtype)

        temb = None
        if self.use_timestep:
            assert t is not None, "use_timestep=True needs t (vqgan_arch.py:777)"
            temb = get_timestep_embedding(t, cfg.ch)
            dense = lambda n, name: nn.Dense(  # noqa: E731
                n, dtype=dtype, param_dtype=jnp.float32, name=name
            )
            temb = dense(cfg.ch * 4, "temb_dense_0")(temb)
            temb = dense(cfg.ch * 4, "temb_dense_1")(swish(temb))

        # downsampling with skip stack (vqgan_arch.py:784-795)
        hs = [Conv(cfg.ch, (3, 3), padding="SAME", name="conv_in")(x)]
        curr_res = cfg.resolution
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = Res(
                    out_channels=block_out,
                    dropout=cfg.dropout,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = Attn(name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(
                    Downsample(dtype=dtype, name=f"down_{i_level}_downsample")(
                        hs[-1]
                    )
                )
                curr_res //= 2

        h = hs[-1]
        h = Res(dropout=cfg.dropout, name="mid_block_1")(
            h, temb, deterministic=deterministic
        )
        h = Attn(name="mid_attn_1")(h)
        h = Res(dropout=cfg.dropout, name="mid_block_2")(
            h, temb, deterministic=deterministic
        )

        # upsampling, popping the skip stack (vqgan_arch.py:803-811)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = Res(
                    out_channels=block_out,
                    dropout=cfg.dropout,
                    name=f"up_{i_level}_block_{i_block}",
                )(
                    jnp.concatenate([h, hs.pop()], axis=-1),
                    temb,
                    deterministic=deterministic,
                )
                if curr_res in cfg.attn_resolutions:
                    h = Attn(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm(name="norm_out")(h)
        h = swish(h)
        return Conv(cfg.out_ch, (3, 3), padding="SAME", name="conv_out")(h)
