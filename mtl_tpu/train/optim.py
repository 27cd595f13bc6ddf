"""Optimizers and LR schedules (optax).

Parity: utils/optimizer.py —
* ``NoamOpt`` (:3-32): lr = max(min_lr, factor * d^-0.5 * min(s^-0.5,
  s * warmup^-1.5)) wrapping Adam(betas=(0.9,0.98), eps=1e-9)
  (utils/functions.py:298);
* ``AnnealingOpt`` (:34-45): divide lr by an anneal factor on demand, wrapping
  SGD(momentum, nesterov) (utils/functions.py:300);
* meta loops build raw SGD(lr) inner / Adam(meta_lr) outer inline
  (transient_trainer.py:105-109);
* joint/finetune use raw Adam(lr) or SGD(lr) (joint_trainer.py:123-132).
"""

from __future__ import annotations

import optax

from ..config import Config


def noam_schedule(model_size: int, factor: float, warmup: int, min_lr: float):
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0  # NoamOpt steps are 1-indexed
        rate = factor * (model_size ** -0.5) * jnp.minimum(
            s ** -0.5, s * (warmup ** -1.5)
        )
        return jnp.maximum(rate, min_lr)

    return schedule


def noam_adam(model_size: int, factor: float, warmup: int, min_lr: float):
    """NoamOpt parity: schedule-wrapped Adam(0.9, 0.98, eps=1e-9)."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9),
        optax.scale_by_schedule(
            noam_schedule(model_size, factor, warmup, min_lr)
        ),
        optax.scale(-1.0),
    )


def sgd(lr: float, momentum: float = 0.0, nesterov: bool = False):
    return optax.sgd(lr, momentum=momentum if momentum else None,
                     nesterov=nesterov)


def adam(lr: float):
    return optax.adam(lr)


def make_joint_optimizer(cfg: Config):
    """joint_trainer.py:123-132: Adam(lr) or SGD(lr, momentum, nesterov)."""
    if cfg.train.opt_name == "sgd":
        return sgd(cfg.train.lr, cfg.train.momentum, nesterov=True)
    return adam(cfg.train.lr)


def make_meta_optimizers(cfg: Config):
    """(inner SGD lr, outer Adam meta_lr) — transient_trainer.py:105-109.

    The inner SGD is applied manually inside the meta step (it must be pure
    per-task); only the outer optimizer carries optax state.
    """
    return cfg.train.lr, adam(cfg.train.meta_lr)


def make_epoch_optimizer(cfg: Config):
    """train.py path: Noam(Adam) for CE, annealing SGD for CTC
    (utils/functions.py:292-305)."""
    if cfg.train.loss == "ce":
        return noam_adam(cfg.model.dim_input, cfg.train.k_lr,
                         cfg.train.warmup, cfg.train.min_lr)
    return sgd(cfg.train.lr, cfg.train.momentum, nesterov=True)


def global_norm_clip(max_norm: float):
    return optax.clip_by_global_norm(max_norm)
