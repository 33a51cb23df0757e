"""Optimizer — torch-Adam-equivalent with StepLR schedule.

The reference uses torch Adam(lr=1e-4, weight_decay=1e-4) (ref train.py:50-54)
whose weight decay is L2-added-to-the-gradient *before* the Adam moments (not
AdamW), and StepLR(step_size=15, gamma=0.1) stepped per epoch (ref train.py:59).

BatchNorm running stats live inside our param tree (torch keeps them as
buffers outside the optimizer); they are masked out of the decay and updated
from batch statistics in the train step instead.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import optax


def _decay_mask(params: Any) -> Any:
    """True for every leaf except BN running stats (paths .../bns/i/{mean,var})."""

    def mask_leaf(path, _leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        return not ("bns" in keys and keys[-1] in ("mean", "var"))

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def step_lr(base_lr: float, step_size: int = 15, gamma: float = 0.1) -> Callable[[int], float]:
    """torch StepLR as a function of epoch."""

    def lr(epoch: int) -> float:
        return base_lr * (gamma ** (epoch // step_size))

    return lr


def make_optimizer(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """Returns a transformation whose scale hyperparameter is injected so the
    per-epoch StepLR value can be set on opt_state (see set_lr)."""

    @optax.inject_hyperparams
    def build(lr):
        return optax.chain(
            optax.masked(optax.add_decayed_weights(weight_decay), _decay_mask),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )

    return build(lr=learning_rate)


def set_lr(opt_state, lr: float):
    """Update the injected lr hyperparameter (per-epoch StepLR application)."""
    opt_state.hyperparams["lr"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    return opt_state
