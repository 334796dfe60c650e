"""Stage-I parsing-generator trainer.

Parity target: reference ParsingGenModel (models/parsing_gen_model.py:19-143):
attr embedder + ShapeUNet + FCNHead, pixel CE, Adam, pixel-accuracy eval.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.config import FCNHeadConfig, ShapeAttrConfig, UNetConfig
from text2human_tpu.losses.ce import accuracy, cross_entropy
from text2human_tpu.models.composites import ParsingGenerator
from text2human_tpu.trainers.base import TrainState, make_optimizer


@dataclass(frozen=True)
class ParsingGenTrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0


class ParsingGenTrainer:
    # reference train_parsing_gen.py:110-128 tracks the best accuracy
    val_metric = ("accuracy", "max")

    def __init__(
        self,
        attr_cfg: ShapeAttrConfig,
        unet_cfg: UNetConfig,
        fcn_cfg: FCNHeadConfig,
        train_cfg: ParsingGenTrainConfig = ParsingGenTrainConfig(),
    ):
        self.cfg = train_cfg
        self.net = ParsingGenerator(attr_cfg, unet_cfg, fcn_cfg, train=True)
        self.net_eval = ParsingGenerator(attr_cfg, unet_cfg, fcn_cfg, train=False)
        self.tx = make_optimizer(lr=train_cfg.lr, weight_decay=train_cfg.weight_decay)
        self._step = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval = jax.jit(self._eval_step)

    def init_state(self, key, sample_pose, sample_attr) -> TrainState:
        variables = self.net.init(key, sample_pose, sample_attr)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
        )

    def _train_step(self, state: TrainState, batch: Dict[str, jax.Array], key):
        def loss_fn(params):
            logits, updates = self.net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["densepose"],
                batch["attr"],
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            loss = cross_entropy(logits, batch["segm"].astype(jnp.int32))
            return loss, (updates["batch_stats"], {"loss_total": loss})

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(self.tx, grads, batch_stats=new_stats)
        return state, metrics

    def train_step(self, state, batch, key):
        return self._step(state, batch, key)

    def _eval_step(self, params, batch_stats, batch):
        logits = self.net_eval.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["densepose"],
            batch["attr"],
        )
        pred = jnp.argmax(logits, axis=-1)
        acc = accuracy(logits, batch["segm"].astype(jnp.int32))
        return {"accuracy": acc, "pred": pred}

    def eval_step(self, params, batch_stats, batch):
        return self._eval(params, batch_stats, batch)

    def generate(self, params, batch_stats, pose, attr) -> jax.Array:
        """Inference (reference sample_model.py:431-437): argmax parsing map."""
        logits = self.net_eval.apply(
            {"params": params, "batch_stats": batch_stats}, pose, attr
        )
        return jnp.argmax(logits, axis=-1)
