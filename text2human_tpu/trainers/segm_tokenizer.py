"""Parsing-tokenizer trainer (VQVAE over one-hot segmentation maps).

Parity target: reference VQSegmentationModel (models/vqgan_model.py:169-242):
Adam betas (0.5, 0.9) over all AE params, BCE-with-quant loss, val losses
(total, bce, quant).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.config import QuantizerConfig, VQGANConfig
from text2human_tpu.losses.ce import bce_with_quant
from text2human_tpu.models.composites import SegmVQVAE
from text2human_tpu.ops.nn import one_hot_segm
from text2human_tpu.trainers.base import TrainState, make_optimizer


@dataclass(frozen=True)
class SegmTokenizerConfig:
    lr: float = 4.5e-5
    num_segm_classes: int = 24


class SegmTokenizerTrainer:
    # reference train_parsing_token.py:100-112 tracks the lowest total loss
    val_metric = ("val/total_loss", "min")

    def __init__(
        self,
        model_cfg: VQGANConfig,
        quant_cfg: QuantizerConfig,
        train_cfg: SegmTokenizerConfig = SegmTokenizerConfig(),
    ):
        self.model = SegmVQVAE(model_cfg, quant_cfg)
        self.cfg = train_cfg
        self.tx = make_optimizer(lr=train_cfg.lr, betas=(0.5, 0.9))
        self._step = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval = jax.jit(self._eval_step)

    def init_state(self, key, sample_segm: jax.Array) -> TrainState:
        x = one_hot_segm(sample_segm, self.cfg.num_segm_classes)
        params = self.model.init(key, x)["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    def _loss(self, params, segm, split):
        x = one_hot_segm(segm, self.cfg.num_segm_classes)
        rec, qloss = self.model.apply({"params": params}, x)
        return bce_with_quant(qloss, x, rec, split=split)

    def _train_step(self, state: TrainState, batch: Dict[str, jax.Array]):
        def loss_fn(params):
            loss, log = self._loss(params, batch["segm"], "train")
            return loss, log

        (_, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(self.tx, grads)
        return state, log

    def _eval_step(self, params, batch):
        _, log = self._loss(params, batch["segm"], "val")
        return log

    def train_step(self, state, batch):
        return self._step(state, batch)

    def eval_step(self, params, batch):
        return self._eval(params, batch)

    def reconstruct(self, params, segm: jax.Array) -> jax.Array:
        """Parsing map -> reconstructed parsing map (argmax over 24 logits)."""
        x = one_hot_segm(segm, self.cfg.num_segm_classes)
        rec, _ = self.model.apply({"params": params}, x)
        return jnp.argmax(rec, axis=-1)

    def to_rgb(self, x: jax.Array) -> jax.Array:
        """Random-projection colorize for visualization (reference
        models/vqgan_model.py:173-174,194-197): a fixed random [C]->[3]
        projection of the one-hot/logit map, min-max normalized to [-1, 1].

        x: [N, H, W, C] -> [N, H, W, 3].
        """
        proj = jax.random.normal(
            jax.random.key(0), (self.cfg.num_segm_classes, 3)
        )
        rgb = jnp.einsum("nhwc,cd->nhwd", x.astype(jnp.float32), proj)
        lo, hi = jnp.min(rgb), jnp.max(rgb)
        return 2.0 * (rgb - lo) / jnp.maximum(hi - lo, 1e-8) - 1.0
