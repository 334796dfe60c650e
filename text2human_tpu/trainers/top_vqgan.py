"""Top-level texture-aware VQGAN trainer.

Parity target: reference VQImageSegmTextureModel (models/vqgan_model.py:389-551)
— full AE + PatchGAN + LPIPS + DiffAugment + adaptive disc weight, Adam lr 1e-4.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from text2human_tpu.config import QuantizerConfig, VQGANConfig
from text2human_tpu.losses.perceptual import LPIPS
from text2human_tpu.models.composites import TextureVQGAN
from text2human_tpu.models.vqgan import Discriminator
from text2human_tpu.trainers.gan import GANTrainConfig, GANTrainer


class TopVQGANTrainer(GANTrainer):
    def __init__(
        self,
        model_cfg: VQGANConfig,
        quant_cfg: QuantizerConfig,
        gan_cfg: GANTrainConfig = GANTrainConfig(),
        lpips_vars: Optional[Any] = None,
        disc: Optional[Discriminator] = None,
    ):
        self.model = TextureVQGAN(model_cfg, quant_cfg)
        import jax.numpy as jnp

        lpips = LPIPS(dtype=jnp.dtype(model_cfg.compute_dtype))
        if lpips_vars is None:
            # untrained perceptual tower (random projection); load converted
            # torchvision/lpips weights for parity runs.
            lpips_vars = lpips.init(
                jax.random.key(0),
                jax.numpy.zeros((1, 32, 32, 3)),
                jax.numpy.zeros((1, 32, 32, 3)),
            )

        def ae_apply(params, x, mask):
            return self.model.apply({"params": params}, x, mask, return_pre_out=True)

        super().__init__(
            ae_apply,
            lpips,
            lpips_vars,
            gan_cfg,
            decoder_path=("decoder", "conv_out"),
            disc=disc,
        )

    def init_gen_params(self, key, sample_image, sample_mask):
        return self.model.init(key, sample_image, sample_mask)["params"]
