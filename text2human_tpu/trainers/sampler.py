"""Absorbing-diffusion sampler trainer.

Parity target: reference TransformerTextureAwareModel
(models/transformer_model.py:18-303): every step tokenizes the batch through
the frozen top VQGAN and parsing tokenizer (:153-170, :305-315), builds
texture tokens by nearest-downsampling the texture mask to the 32x16 latent
(:283-285), and optimizes only the transformer under the reweighted-ELBO
masked-CE loss (:232-274).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.config import (
    QuantizerConfig,
    TransformerConfig,
    VQGANConfig,
)
from text2human_tpu.diffusion.absorbing import (
    AbsorbingDiffusion,
    ar_train_loss,
    init_importance_state,
    sample_autoregressive,
    sample_loop,
    train_loss,
)
from text2human_tpu.models.composites import SegmVQVAE, TextureVQGAN
from text2human_tpu.models.transformer import TransformerMultiHead
from text2human_tpu.ops.nn import nearest_downsample_mask
from text2human_tpu.trainers.base import TrainState, make_optimizer


@dataclass(frozen=True)
class SamplerTrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    loss_type: str = "reweighted_elbo"
    mask_schedule: str = "random"
    sample_steps: int = 256
    num_timesteps: int = 1000
    # 'uniform' (reference default) or 'importance' (Lt-history reweighted
    # time sampling, reference transformer_model.py:188-199)
    time_sampling: str = "uniform"


class SamplerTrainer:
    # reference train_sampler.py:107-118 tracks the lowest validation loss
    val_metric = ("loss", "min")

    def __init__(
        self,
        tf_cfg: TransformerConfig,
        img_cfg: VQGANConfig = None,
        img_quant: QuantizerConfig = None,
        segm_cfg: VQGANConfig = None,
        segm_quant: QuantizerConfig = None,
        train_cfg: SamplerTrainConfig = SamplerTrainConfig(),
        dtype=jnp.float32,
    ):
        self.tf_cfg = tf_cfg
        self.cfg = train_cfg
        # optional causal mode (reference transformer_arch.py:30-35,125-127 —
        # defined but never enabled by a reference config): next-token CE
        # training + left-to-right decode instead of the diffusion objective
        self.autoregressive = tf_cfg.sampler == "autoregressive"
        if self.autoregressive and train_cfg.time_sampling == "importance":
            raise ValueError(
                "time_sampling='importance' applies to the diffusion "
                "objective only; the autoregressive mode has no timesteps"
            )
        if train_cfg.time_sampling == "importance" and train_cfg.loss_type != "elbo":
            # only the ELBO objective divides by pt; importance-sampling t
            # under mlm/reweighted_elbo would silently bias the gradient
            # toward high-loss timesteps
            raise ValueError(
                "time_sampling='importance' requires loss_type='elbo' "
                f"(got {train_cfg.loss_type!r}); the other objectives carry "
                "no 1/pt importance correction"
            )
        self.denoiser = TransformerMultiHead(tf_cfg, dtype=dtype)
        # frozen tokenizers are optional: callers may feed pre-tokenized data
        self.img_vq = TextureVQGAN(img_cfg, img_quant) if img_cfg else None
        self.segm_vq = SegmVQVAE(segm_cfg, segm_quant) if segm_cfg else None
        self.diffusion = AbsorbingDiffusion(
            num_timesteps=train_cfg.num_timesteps,
            mask_id=tf_cfg.codebook_size,
            num_tokens=tf_cfg.block_size,
            n_embed_per_head=tf_cfg.head_class_num,
            loss_type=train_cfg.loss_type,
            mask_schedule=train_cfg.mask_schedule,
        )
        self.tx = make_optimizer(lr=train_cfg.lr, weight_decay=train_cfg.weight_decay)
        # fused whole-sequence attention (ops/attn_pallas.py, custom VJP for
        # the backward): auto on TPU when attention dropout is off (the
        # kernel has no dropout support; reference configs use 0)
        self.fused_attn = (
            jax.default_backend() == "tpu"
            and tf_cfg.attn_pdrop == 0.0
            # the fused whole-sequence kernel is non-causal by construction
            and not self.autoregressive
        )
        self._tokenize = jax.jit(self._tokenize_impl)
        self._step = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval = jax.jit(self._eval_step)

    # -- frozen tokenization (reference feed_data, transformer_model.py:276-288)

    def _tokenize_impl(
        self, img_params, segm_params, batch: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        h, w = self.tf_cfg.latent_shape
        out = self.img_vq.apply(
            {"params": img_params},
            batch["image"],
            batch["texture_mask"],
            method=TextureVQGAN.encode,
        )
        b = batch["image"].shape[0]
        segm_tokens = self.segm_vq.apply(
            {"params": segm_params}, batch["segm"], method=SegmVQVAE.tokenize
        )
        texture_tokens = nearest_downsample_mask(
            batch["texture_mask"], (h, w)
        ).astype(jnp.int32)
        return {
            "x0_cont": out.indices_cont.reshape(b, -1),
            "gt_local": out.indices.reshape(b, -1),
            "segm_tokens": segm_tokens.reshape(b, -1),
            "texture_tokens": texture_tokens.reshape(b, -1),
        }

    def tokenize(self, img_params, segm_params, batch):
        return self._tokenize(img_params, segm_params, batch)

    # -- transformer optimization

    def init_state(self, key) -> TrainState:
        t = self.tf_cfg.block_size
        dummy = jnp.zeros((1, t), jnp.int32)
        params = self.denoiser.init(key, dummy, dummy, dummy)["params"]
        extra = (
            init_importance_state(self.cfg.num_timesteps)
            if self.cfg.time_sampling == "importance"
            else None
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            extra=extra,
        )

    def _train_step(self, state: TrainState, tokens: Dict[str, jax.Array], key):
        drop_key, diff_key = jax.random.split(key)

        def loss_fn(params):
            def denoise(x_t):
                return self.denoiser.apply(
                    {"params": params},
                    x_t,
                    tokens["segm_tokens"],
                    tokens["texture_tokens"],
                    deterministic=False,
                    select_heads=True,
                    flash=self.fused_attn,
                    rngs={"dropout": drop_key},
                )

            if self.autoregressive:
                loss, aux = ar_train_loss(
                    denoise,
                    tokens["x0_cont"],
                    tokens["gt_local"],
                    tokens["texture_tokens"],
                )
                return loss, {"loss": loss, "vb_loss": loss, **aux}
            loss, vb, aux = train_loss(
                diff_key,
                self.diffusion,
                denoise,
                tokens["x0_cont"],
                tokens["gt_local"],
                tokens["texture_tokens"],
                imp_state=state.extra,
            )
            return loss, {"loss": loss, "vb_loss": vb, **aux}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_extra = metrics.pop("imp_state", state.extra)
        state = state.apply_gradients(self.tx, grads, extra=new_extra)
        return state, metrics

    def train_step(self, state, tokens, key):
        return self._step(state, tokens, key)

    def _eval_step(self, params, tokens: Dict[str, jax.Array], key):
        """Loss without dropout/updates (train_step donates its state, so it
        must never be used for validation)."""

        def denoise(x_t):
            return self.denoiser.apply(
                {"params": params},
                x_t,
                tokens["segm_tokens"],
                tokens["texture_tokens"],
                select_heads=True,
                flash=self.fused_attn,
            )

        if self.autoregressive:
            loss, _ = ar_train_loss(
                denoise,
                tokens["x0_cont"],
                tokens["gt_local"],
                tokens["texture_tokens"],
            )
            return {"loss": loss, "vb_loss": loss}
        loss, vb, _ = train_loss(
            key,
            self.diffusion,
            denoise,
            tokens["x0_cont"],
            tokens["gt_local"],
            tokens["texture_tokens"],
        )
        return {"loss": loss, "vb_loss": vb}

    def eval_step(self, params, tokens, key):
        return self._eval(params, tokens, key)

    # -- sampling (reference sample_fn, transformer_model.py:317-384)

    def sample(
        self,
        params,
        segm_tokens: jax.Array,
        texture_tokens: jax.Array,
        key,
        sample_steps: int = 0,
        temp: float = 1.0,
    ) -> Tuple[jax.Array, jax.Array]:
        steps = sample_steps or self.cfg.sample_steps

        def denoise(x_t):
            return self.denoiser.apply(
                {"params": params}, x_t, segm_tokens, texture_tokens,
                select_heads=True,
                flash=self.fused_attn,
            )

        if self.autoregressive:
            return sample_autoregressive(
                key, self.diffusion, denoise, texture_tokens, temp
            )
        return sample_loop(key, self.diffusion, denoise, texture_tokens, steps, temp)
