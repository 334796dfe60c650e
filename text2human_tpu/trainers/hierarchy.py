"""Bottom hierarchy VQGAN trainer.

Parity target: reference HierarchyVQSpatialTextureAwareModel
(models/hierarchy_vqgan_model.py:19-291): trains the bottom stack (+ the shared
decoder's up-blocks unless fix_decoder) against a frozen top VQGAN, GAN loss
identical to the top trainer (disc warm-started from the top checkpoint,
disc_start_step=1).

The reference's requires_grad param selection (:127-156) becomes an optax mask
over the gen param tree; the frozen top path is additionally stop_gradient'ed
inside HierarchyVQ.top_encode.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from text2human_tpu.config import QuantizerConfig, VQGANConfig
from text2human_tpu.losses.perceptual import LPIPS
from text2human_tpu.models.composites import HierarchyVQ
from text2human_tpu.models.vqgan import Discriminator
from text2human_tpu.trainers.gan import GANTrainConfig, GANTrainer

_BOT_PREFIXES = (
    "bot_encoder",
    "bot_decoder_res",
    "bot_quantize",
    "bot_quant_conv",
    "bot_post_quant_conv",
)


def hierarchy_trainable_mask(params: Any, fix_decoder: bool) -> Any:
    """True for params the reference optimizer updates
    (hierarchy_vqgan_model.py:127-156): all bot_* components, plus decoder
    up-blocks EXCEPT the deepest level — the reference enumerates only
    'up.0'..'up.3', deliberately freezing up.4 (before the fusion point)."""
    deepest = -1
    for name in params.get("decoder", {}):
        if name.startswith("up_"):
            deepest = max(deepest, int(name.split("_")[1]))

    def mark(path, leaf):
        top = path[0].key
        if top in _BOT_PREFIXES:
            return True
        if top == "decoder" and not fix_decoder:
            name = path[1].key
            return name.startswith("up_") and int(name.split("_")[1]) != deepest
        return False

    return jax.tree_util.tree_map_with_path(mark, params)


class HierarchyVQGANTrainer(GANTrainer):
    # hybrid token-cache batches (data/token_cache.py HybridTokenDataset)
    # carry the frozen top path's cached integer indices alongside the pixels
    ae_extra_keys = ("top_local", "top_cb")

    def __init__(
        self,
        top_cfg: VQGANConfig,
        top_quant: QuantizerConfig,
        bot_cfg: VQGANConfig,
        bot_quant: QuantizerConfig,
        gan_cfg: GANTrainConfig = GANTrainConfig(disc_start_step=1),
        fix_decoder: bool = False,
        lpips_vars: Optional[Any] = None,
        disc: Optional[Discriminator] = None,
        init_params: Optional[Any] = None,
        sample_shape=(1, 32, 16, 3),
    ):
        self.model = HierarchyVQ(top_cfg, top_quant, bot_cfg, bot_quant)
        lpips = LPIPS(dtype=jnp.dtype(top_cfg.compute_dtype))
        if lpips_vars is None:
            lpips_vars = lpips.init(
                jax.random.key(0),
                jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 32, 32, 3)),
            )

        def ae_apply(params, x, mask, top_local=None, top_cb=None):
            if top_local is None:
                return self.model.apply(
                    {"params": params}, x, mask, return_pre_out=True
                )
            # hybrid token-cache path: the frozen full-res top encoder is
            # replaced by an exact codebook gather of the cached indices
            return self.model.apply(
                {"params": params}, x, mask, top_local, top_cb,
                return_pre_out=True, method=HierarchyVQ.forward_with_top,
            )

        if init_params is None:
            x = jnp.zeros(sample_shape)
            m = jnp.zeros(sample_shape[:3])
            init_params = self.model.init(jax.random.key(0), x, m)["params"]
        mask = hierarchy_trainable_mask(init_params, fix_decoder)

        super().__init__(
            ae_apply,
            lpips,
            lpips_vars,
            gan_cfg,
            decoder_path=("decoder", "conv_out"),
            gen_mask=mask,
            disc=disc,
        )

    def init_gen_params(self, key, sample_image, sample_mask):
        return self.model.init(key, sample_image, sample_mask)["params"]

    def _tokenize_impl(self, top_params, batch):
        """Frozen top path -> integer indices for hybrid cache builds
        (cli/tokenize.py).  ``top_params`` needs only the top_encoder /
        top_quant_conv / top_quantize subtrees (flax pulls params lazily
        per method)."""
        out = self.model.apply(
            {"params": top_params}, batch["image"], batch["texture_mask"],
            method=HierarchyVQ.top_indices,
        )
        return {
            "top_local": out.indices.astype(jnp.int32),
            "top_cb": out.cb_ids.astype(jnp.int32),
        }

    def tokenize(self, top_params, batch):
        if not hasattr(self, "_tokenize"):
            self._tokenize = jax.jit(self._tokenize_impl)
        return self._tokenize(top_params, batch)
