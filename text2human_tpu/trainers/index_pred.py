"""Index-prediction trainer (top features -> bottom codebook indices).

Parity target: reference VQGANTextureAwareSpatialHierarchyInferenceModel
(models/hierarchy_inference_model.py:20-298): gt bottom indices from the
frozen bottom quantizer, trainable guidance UNet + 18-head FCN with per-head
CE (ignore -1), eval = per-codebook argmax accuracy inside texture regions.

Vectorized: the 18-head CE with -1-ignore collapses to CE of the texture-
selected head (exactly one head is supervised per position); accuracy is a
masked mean over the dense index map.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.config import FCNHeadConfig, QuantizerConfig, UNetConfig, VQGANConfig
from text2human_tpu.losses.ce import cross_entropy
from text2human_tpu.models.composites import HierarchyVQ, IndexPredictionNet
from text2human_tpu.ops.nn import nearest_downsample_mask
from text2human_tpu.trainers.base import TrainState, make_optimizer


@dataclass(frozen=True)
class IndexPredTrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    optimizer: str = "Adam"
    momentum: float = 0.9


class IndexPredTrainer:
    # reference train_index_prediction.py:107-125 tracks the best accuracy
    val_metric = ("accuracy", "max")

    def __init__(
        self,
        unet_cfg: UNetConfig,
        fcn_cfg: FCNHeadConfig,
        top_cfg: VQGANConfig,
        top_quant: QuantizerConfig,
        bot_cfg: VQGANConfig,
        bot_quant: QuantizerConfig,
        train_cfg: IndexPredTrainConfig = IndexPredTrainConfig(),
    ):
        self.cfg = train_cfg
        self.net = IndexPredictionNet(unet_cfg, fcn_cfg, train=True)
        self.net_eval = IndexPredictionNet(unet_cfg, fcn_cfg, train=False)
        self.hierarchy = HierarchyVQ(top_cfg, top_quant, bot_cfg, bot_quant)
        self.tx = make_optimizer(
            lr=train_cfg.lr,
            weight_decay=train_cfg.weight_decay,
            optimizer=train_cfg.optimizer,
            momentum=train_cfg.momentum,
        )
        self._prepare = jax.jit(self._prepare_impl)
        self._tokenize = jax.jit(self._tokenize_impl)
        self._prepare_tokens = jax.jit(self._prepare_tokens_impl)
        self._step = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval = jax.jit(self._eval_step)

    def _prepare_impl(self, vq_params, batch) -> Dict[str, jax.Array]:
        """Frozen feature/GT extraction (hierarchy_inference_model.py:178-197)."""
        x, mask = batch["image"], batch["texture_mask"]
        feature_top = self.hierarchy.apply(
            {"params": vq_params}, x, mask, method=HierarchyVQ.top_encode
        )
        bot = self.hierarchy.apply(
            {"params": vq_params}, x, mask, method=HierarchyVQ.bot_indices
        )
        return {
            "feature_top": feature_top,
            "gt_indices": bot.indices,  # [N, 32, 16] local ids
            "cb_ids": bot.cb_ids,  # [N, 32, 16]
        }

    def prepare(self, vq_params, batch):
        return self._prepare(vq_params, batch)

    # -- token-cache path: the frozen encoders run once per dataset, not once
    # per step (data/token_cache.py); training rebuilds feature_top from the
    # cached integer indices with a codebook gather + 1x1 conv

    def _tokenize_impl(self, vq_params, batch) -> Dict[str, jax.Array]:
        """Integer form of ``prepare`` for cache builds: top indices replace
        the [N,32,16,256] float feature (2 KB vs 512 KB per sample)."""
        x, mask = batch["image"], batch["texture_mask"]
        top = self.hierarchy.apply(
            {"params": vq_params}, x, mask, method=HierarchyVQ.top_indices
        )
        bot = self.hierarchy.apply(
            {"params": vq_params}, x, mask, method=HierarchyVQ.bot_indices
        )
        return {
            "top_local": top.indices.astype(jnp.int32),
            "top_cb": top.cb_ids.astype(jnp.int32),
            "gt_indices": bot.indices.astype(jnp.int32),
            "cb_ids": bot.cb_ids.astype(jnp.int32),
        }

    def tokenize(self, vq_params, batch):
        return self._tokenize(vq_params, batch)

    def _prepare_tokens_impl(self, vq_params, tokens) -> Dict[str, jax.Array]:
        """Cached tokens -> the same data dict ``prepare`` produces.  The
        reconstruction is exact up to the straight-through estimator's float
        form: forward z_q values ARE codebook entries, so gather + the 1x1
        post-quant conv reproduces feature_top (allclose-tested)."""
        feature_top = self.hierarchy.apply(
            {"params": vq_params},
            tokens["top_local"],
            tokens["top_cb"].astype(jnp.float32),
            method=HierarchyVQ.top_feature_from_indices,
        )
        return {
            "feature_top": jax.lax.stop_gradient(feature_top),
            "gt_indices": tokens["gt_indices"],
            "cb_ids": tokens["cb_ids"],
        }

    def prepare_from_tokens(self, vq_params, tokens):
        return self._prepare_tokens(vq_params, tokens)

    def init_state(self, key, sample_feature) -> TrainState:
        variables = self.net.init(key, sample_feature)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
        )

    @staticmethod
    def _select_head(logits: jax.Array, cb_ids: jax.Array) -> jax.Array:
        """[N,H,W,K,C], [N,H,W] -> [N,H,W,C]: the supervised head per pixel."""
        idx = jnp.clip(cb_ids[..., None, None].astype(jnp.int32), 0, logits.shape[3] - 1)
        return jnp.take_along_axis(logits, idx, axis=3)[:, :, :, 0, :]

    def _train_step(self, state: TrainState, data: Dict[str, jax.Array], key):
        def loss_fn(params):
            logits, updates = self.net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                data["feature_top"],
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            sel = self._select_head(logits, data["cb_ids"])
            loss = cross_entropy(sel, data["gt_indices"], ignore_index=-1)
            return loss, (updates["batch_stats"], {"loss_total": loss})

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(self.tx, grads, batch_stats=new_stats)
        return state, metrics

    def train_step(self, state, data, key):
        return self._step(state, data, key)

    def _eval_step(self, params, batch_stats, data):
        logits = self.net_eval.apply(
            {"params": params, "batch_stats": batch_stats}, data["feature_top"]
        )
        sel = self._select_head(logits, data["cb_ids"])
        pred = jnp.argmax(sel, axis=-1)
        valid = data["gt_indices"] >= 0
        correct = (pred == data["gt_indices"]) & valid
        # reference accuracy normalizes by the full token count per image
        # (hierarchy_inference_model.py:289-290)
        acc = jnp.sum(correct) / data["gt_indices"][0].size / data["gt_indices"].shape[0]
        return {"accuracy": acc, "pred": pred}

    def eval_step(self, params, batch_stats, data):
        return self._eval(params, batch_stats, data)

    def predict_bot_indices(
        self, params, batch_stats, feature_top: jax.Array, texture_mask: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Inference path (reference sample_model.py:183-213): argmax of the
        texture-selected head; returns (local indices, cb ids) at 32x16."""
        logits = self.net_eval.apply(
            {"params": params, "batch_stats": batch_stats}, feature_top
        )
        n, h, w, k, c = logits.shape
        cb = nearest_downsample_mask(texture_mask, (h, w)).astype(jnp.int32)
        sel = self._select_head(logits, cb)
        return jnp.argmax(sel, axis=-1).astype(jnp.int32), cb
