"""Generic VQGAN adversarial trainer (used by the top texture VQGAN and the
bottom hierarchy VQGAN).

Replicates the reference training step (models/vqgan_model.py:283-344,
models/hierarchy_vqgan_model.py:196-291) as one jitted function:

  * generator loss = L1 + perceptual + d_weight * hinge-G + codebook loss,
    with the adaptive d_weight = ||∂nll/∂W_last|| / ||∂g/∂W_last|| computed
    via two VJPs through the loss heads and the final conv only (the torch
    version runs two full retain_graph backwards, vqgan_loss.py:5-12);
  * discriminator hinge loss, gated by ``disc_start_step`` — before the gate
    the disc grads are zeroed, which with zero-initialized Adam moments is a
    no-op update, so the whole step stays branch-free under jit;
  * DiffAugment("color,translation") on disc inputs, with the same draw used
    for the generator pass and the fake side of the disc pass (the reference
    reuses the augmented tensor, vqgan_model.py:455-483).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from text2human_tpu.losses.perceptual import LPIPS
from text2human_tpu.losses.vqgan_loss import (
    adopt_weight,
    calculate_adaptive_weight,
    diff_augment,
    hinge_d_loss,
)
from text2human_tpu.models.vqgan import Discriminator
from text2human_tpu.trainers.base import TrainState, make_optimizer


def conv2d_same(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 SAME conv in NHWC/HWIO — re-applies the decoder's conv_out."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


@dataclass(frozen=True)
class GANTrainConfig:
    lr: float = 1e-4
    perceptual_weight: float = 1.0
    disc_start_step: int = 30001
    disc_weight_max: float = 1.0
    diff_aug: bool = True
    policy: str = "color,translation"
    # grad-norm-ratio adaptive disc weight (reference default). False uses a
    # constant weight of disc_weight_max — cheaper (skips the extra VJPs).
    adaptive_weight: bool = True


class GANTrainer:
    """Functional adversarial trainer around an autoencoder module.

    ae_apply(params, x, mask) must return (xrec, codebook_loss, pre_conv_act).
    ``decoder_path`` locates the final conv params inside the gen param tree.
    ``gen_mask`` optionally restricts which gen params receive updates
    (implements the reference's requires_grad selections).
    """
    # best-checkpoint selection metric (reference train_vqvae.py:107-125
    # tracks the lowest validation loss)
    val_metric = ("nll_loss", "min")

    # batch keys forwarded positionally to ae_apply when present (subclasses
    # set this to consume cached auxiliary inputs, e.g. the hierarchy job's
    # pre-tokenized frozen-top indices); a pixel-only batch simply omits them
    ae_extra_keys: Tuple[str, ...] = ()

    def __init__(
        self,
        ae_apply: Callable,
        lpips_module: LPIPS,
        lpips_vars: Any,
        cfg: GANTrainConfig,
        decoder_path: Tuple[str, ...] = ("decoder", "conv_out"),
        gen_mask: Optional[Any] = None,
        disc: Optional[Discriminator] = None,
    ):
        self.ae_apply = ae_apply
        self.lpips = lpips_module
        self.lpips_vars = lpips_vars
        # validation runs the full AE + VGG tower: compile it like the train
        # step instead of dispatching ~100 conv layers eagerly per val batch
        self.eval_loss = jax.jit(self._eval_loss_impl)
        self.cfg = cfg
        self.decoder_path = decoder_path
        self.disc = disc or Discriminator()
        self.gen_tx = make_optimizer(lr=cfg.lr, mask=gen_mask)
        self.disc_tx = make_optimizer(lr=cfg.lr)
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def init_state(self, key, gen_params, sample_image) -> TrainState:
        dkey, _ = jax.random.split(key)
        disc_vars = self.disc.init(dkey, sample_image)
        params = {"gen": gen_params, "disc": disc_vars["params"]}
        opt_state = {
            "gen": self.gen_tx.init(gen_params),
            "disc": self.disc_tx.init(disc_vars["params"]),
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            batch_stats={"disc": disc_vars.get("batch_stats", {})},
        )

    def _get_conv_out(self, gen_params):
        node = gen_params
        for k in self.decoder_path:
            node = node[k]
        return node

    def _ae_extras(self, batch) -> Tuple:
        """Extra ae_apply inputs from the batch — all of ``ae_extra_keys``
        or none (a partial set would mis-bind positionally and crash with an
        opaque error deep inside the jitted step)."""
        present = [k for k in self.ae_extra_keys if k in batch]
        if present and len(present) != len(self.ae_extra_keys):
            raise ValueError(
                f"cache fields incomplete: batch has {present} but the "
                f"trainer needs all of {list(self.ae_extra_keys)}"
            )
        return tuple(batch[k] for k in self.ae_extra_keys) if present else ()

    def gen_grads_and_metrics(
        self, gen_params, disc_params, disc_stats, step, x, mask, aug_key,
        extras=(),
    ):
        """Generator gradients + metrics for one batch.

        Structured as explicit VJPs so the expensive forwards run exactly
        once: one autoencoder forward, one loss-head forward (LPIPS + disc),
        then head backwards whose cotangents are reused both for the
        adaptive weight and for the parameter gradient.  The naive
        value_and_grad formulation re-ran the LPIPS tower ~3x per step
        (29% of the b=8 GAN step, BENCHMARKS.md); the reference's two
        retain_graph backwards (vqgan_loss.py:5-12) never re-run the VGG
        forward either.  Gradient equality with the naive form is tested in
        tests/test_trainers.py.
        """
        cfg = self.cfg
        xrec_tuple, ae_vjp = jax.vjp(
            lambda p: self.ae_apply(p, x, mask, *extras), gen_params
        )
        xrec, qloss, a_pre = xrec_tuple

        # separate VJPs for the two loss heads so each backward traverses
        # only its own branch (one joint head would run the LPIPS *and* disc
        # backwards per cotangent — zero cotangents don't DCE at runtime)
        def nll_head(xr):
            recon = jnp.abs(x - xr)
            p = self.lpips.apply(self.lpips_vars, x, xr)
            nll = jnp.mean(recon + cfg.perceptual_weight * p)
            return nll, {"l1": jnp.mean(recon), "perceptual": jnp.mean(p)}

        def g_head(xr):
            xr_in = (
                diff_augment(aug_key, xr, cfg.policy) if cfg.diff_aug else xr
            )
            logits_fake, _ = self.disc.apply(
                {"params": disc_params, "batch_stats": disc_stats},
                xr_in,
                train=True,
                mutable=["batch_stats"],
            )
            return -jnp.mean(logits_fake)

        nll, nll_vjp, aux = jax.vjp(nll_head, xrec, has_aux=True)
        g_loss, g_vjp = jax.vjp(g_head, xrec)
        (d_nll_dx,) = nll_vjp(jnp.ones(()))
        (d_g_dx,) = g_vjp(jnp.ones(()))

        if cfg.adaptive_weight:
            w = self._get_conv_out(gen_params)
            a_sg = jax.lax.stop_gradient(a_pre)
            _, conv_vjp = jax.vjp(
                lambda wv: conv2d_same(a_sg, wv["kernel"], wv["bias"]), w
            )
            (nll_gw,) = conv_vjp(d_nll_dx)
            (g_gw,) = conv_vjp(d_g_dx)
            d_weight = calculate_adaptive_weight(
                nll_gw["kernel"], g_gw["kernel"], cfg.disc_weight_max
            )
            d_weight = d_weight * adopt_weight(1.0, step, cfg.disc_start_step)
            # VJPs are linear in the cotangent: d loss/d xrec is the same
            # combination that value_and_grad would produce.
            d_loss_dxrec = jax.tree.map(
                lambda a, b: a + d_weight * b, d_nll_dx, d_g_dx
            )
        else:
            d_weight = jnp.asarray(cfg.disc_weight_max, jnp.float32)
            d_weight = d_weight * adopt_weight(1.0, step, cfg.disc_start_step)
            d_loss_dxrec = jax.tree.map(
                lambda a, b: a + d_weight * b, d_nll_dx, d_g_dx
            )

        loss = nll + d_weight * g_loss + qloss
        (gen_grads,) = ae_vjp(
            (d_loss_dxrec, jnp.ones_like(qloss), jnp.zeros_like(a_pre))
        )
        metrics = {
            "loss": loss,
            "nll_loss": nll,
            "g_loss": g_loss,
            "d_weight": d_weight,
            "codebook_loss": qloss,
            **aux,
        }
        return gen_grads, metrics, xrec

    def _train_step(self, state: TrainState, batch: Dict[str, jax.Array], key):
        cfg = self.cfg
        x = batch["image"]
        mask = batch.get("texture_mask")
        aug_key, real_key = jax.random.split(key)
        disc_params = state.params["disc"]
        disc_stats = state.batch_stats["disc"]

        def disc_fwd(p, img):
            out, updates = self.disc.apply(
                {"params": p, "batch_stats": disc_stats},
                img,
                train=True,
                mutable=["batch_stats"],
            )
            return out, updates["batch_stats"]

        # ----- generator step -----
        extras = self._ae_extras(batch)
        gen_grads, metrics, xrec = self.gen_grads_and_metrics(
            state.params["gen"], disc_params, disc_stats, state.step, x, mask,
            aug_key, extras,
        )

        # ----- discriminator step (branch-free gate) -----
        xrec_sg = jax.lax.stop_gradient(xrec)
        fake_in = (
            diff_augment(aug_key, xrec_sg, cfg.policy) if cfg.diff_aug else xrec_sg
        )
        real_in = diff_augment(real_key, x, cfg.policy) if cfg.diff_aug else x

        def disc_loss_fn(p):
            # thread BN running stats through both passes (torch updates them
            # on every train-mode forward: real then fake)
            logits_real, stats1 = disc_fwd(p, real_in)
            logits_fake, stats2 = self.disc.apply(
                {"params": p, "batch_stats": stats1},
                fake_in,
                train=True,
                mutable=["batch_stats"],
            )
            return hinge_d_loss(logits_real, logits_fake), stats2["batch_stats"]

        (d_loss, new_disc_stats), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(disc_params)
        # same `<` gate as the generator side (reference zeroes both via
        # adopt_weight's `global_step < threshold`, vqgan_loss.py:15-18 used
        # at vqgan_model.py:475-484) — a `>` here would start the disc one
        # step later than the reference
        gate = adopt_weight(1.0, state.step, cfg.disc_start_step)
        disc_grads = jax.tree.map(lambda g: g * gate, disc_grads)
        metrics["d_loss"] = d_loss

        gen_updates, gen_opt = self.gen_tx.update(
            gen_grads, state.opt_state["gen"], state.params["gen"]
        )
        disc_updates, disc_opt = self.disc_tx.update(
            disc_grads, state.opt_state["disc"], disc_params
        )
        new_state = state.replace(
            step=state.step + 1,
            params={
                "gen": optax.apply_updates(state.params["gen"], gen_updates),
                "disc": optax.apply_updates(disc_params, disc_updates),
            },
            opt_state={"gen": gen_opt, "disc": disc_opt},
            batch_stats={"disc": new_disc_stats},
        )
        return new_state, metrics

    def train_step(self, state, batch, key):
        return self._step(state, batch, key)

    def _eval_loss_impl(self, gen_params, batch) -> Dict[str, jax.Array]:
        x = batch["image"]
        mask = batch.get("texture_mask")
        extras = self._ae_extras(batch)
        xrec, _, _ = self.ae_apply(gen_params, x, mask, *extras)
        recon = jnp.abs(x - xrec)
        p = self.lpips.apply(self.lpips_vars, x, xrec)
        nll = jnp.mean(recon + self.cfg.perceptual_weight * p)
        return {"nll_loss": nll, "l1": jnp.mean(recon), "perceptual": jnp.mean(p)}
