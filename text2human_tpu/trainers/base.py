"""Shared training harness: learning-rate schedules, train state, optimizers.

The reference mutates optimizer lr per-epoch through five decay modes
(models/vqgan_model.py:131-166, transformer_model.py:426-466 adds 'warm_up');
here the schedule is a pure function of (epoch, iter) fed to
``optax.inject_hyperparams`` so the whole step stays jittable.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + optimizer + BN stats)."""

    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None
    extra: Any = None

    def apply_gradients(self, tx: optax.GradientTransformation, grads, **changes):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **changes,
        )


def lr_for_epoch(
    cfg: Dict[str, Any], epoch: int, iters: Optional[int] = None, prev_lr: Optional[float] = None
) -> float:
    """Epoch-indexed lr schedules: step/cos/linear/linear2exp/schedule/warm_up
    (reference models/vqgan_model.py:131-166, models/transformer_model.py:426-466).

    ``schedule`` and the post-turning-point branch of ``linear2exp`` are
    stateful in the reference (multiply current lr); pass ``prev_lr`` for those.
    """
    base = cfg["lr"]
    mode = cfg.get("lr_decay", "step")
    if mode == "step":
        return base * cfg.get("gamma", 1.0) ** (epoch // cfg.get("step", 50))
    if mode == "cos":
        return base * (1 + math.cos(math.pi * epoch / cfg["num_epochs"])) / 2
    if mode == "linear":
        return base * (1 - epoch / cfg["num_epochs"])
    if mode == "linear2exp":
        tp = cfg["turning_point"]
        if epoch < tp + 1:
            return base * (1 - epoch / int(tp * 1.0526))
        return (prev_lr if prev_lr is not None else base) * cfg["gamma"]
    if mode == "schedule":
        lr = prev_lr if prev_lr is not None else base
        if epoch in cfg["schedule"]:
            lr *= cfg["gamma"]
        return lr
    if mode == "warm_up":
        if iters is not None and iters <= cfg["warmup_iters"]:
            return base * float(iters) / cfg["warmup_iters"]
        return base
    raise ValueError(f"Unknown lr mode {mode}")


def make_optimizer(
    lr: float = 1e-4,
    betas: Tuple[float, float] = (0.9, 0.999),
    weight_decay: float = 0.0,
    optimizer: str = "Adam",
    momentum: float = 0.9,
    mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Adam / SGD factory with injectable lr and optional param-tree mask
    (the mask implements the reference's requires_grad selections, e.g.
    hierarchy_vqgan_model.py:127-156)."""

    def build(learning_rate):
        # COUPLED L2 weight decay: torch.optim.Adam/SGD add wd*param to the
        # gradient BEFORE the moment/momentum accumulation — so the decay
        # term must precede scale_by_adam/trace.  (Decoupled AdamW-style
        # decay after the moments would silently diverge from the reference
        # optimizer whenever a config sets weight_decay > 0.)
        decay = (
            optax.add_decayed_weights(weight_decay)
            if weight_decay
            else optax.identity()
        )
        if optimizer == "Adam":
            tx = optax.chain(
                decay,
                optax.scale_by_adam(b1=betas[0], b2=betas[1]),
                optax.scale(-learning_rate),
            )
        elif optimizer == "SGD":
            tx = optax.chain(
                decay,
                optax.trace(decay=momentum) if momentum else optax.identity(),
                optax.scale(-learning_rate),
            )
        else:
            raise ValueError(optimizer)
        return tx

    tx = optax.inject_hyperparams(build)(learning_rate=lr)
    if mask is not None:
        # optax.masked passes the RAW gradient through as the update for
        # mask=False leaves (it only skips the inner transform) — frozen
        # params would get `param += grad` every step. Explicitly zero the
        # frozen leaves' updates.
        if callable(mask):
            inverted = lambda params: jax.tree.map(  # noqa: E731
                lambda m: not m, mask(params)
            )
        else:
            inverted = jax.tree.map(lambda m: not m, mask)
        tx = optax.chain(
            optax.masked(tx, mask),
            optax.masked(optax.set_to_zero(), inverted),
        )
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr hyperparameter, walking through optax.masked /
    optax.chain wrappers to find the inject_hyperparams state."""

    def find(state):
        if hasattr(state, "hyperparams"):
            return state
        if hasattr(state, "inner_state"):
            return find(state.inner_state)
        if isinstance(state, (tuple, list)):
            for sub in state:
                found = find(sub)
                if found is not None:
                    return found
        return None

    target = find(opt_state)
    if target is None:
        raise ValueError("no inject_hyperparams state found in opt_state")
    target.hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
