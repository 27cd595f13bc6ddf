"""Joint-training step with the adversarial / multitask discriminator head.

Parity: trainer/asr/joint_trainer.py:196-271 + utils/metrics.py:164-199 —
per task k (accent_id = k): encoder output summed over time feeds the
discriminator; the differentiable loss is

    adversarial: ce_k + (beta_or_0.5 * disc_ce_k)/K + mse_to_uniform_k/K
    multitask:   ce_k + disc_ce_k/K

accumulated over tasks (no gradient reversal in the reference — disc CE
gradients DO flow into the encoder; replicated). Model and discriminator are
updated by separate optimizers from the same backward pass
(joint_trainer.py:246,254,269-271).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..data.vocab import PAD_ID
from ..ops.targets import make_teacher_forcing
from .losses import adversarial_losses, ce_loss, masked_loss_guard
from .optim import adam, sgd
from .steps import TrainState, _clip_tree, prepare_features


class DiscTrainState(struct.PyTreeNode):
    base: TrainState
    disc_params: Any
    disc_opt_state: Any


def init_disc_state(model, discriminator, cfg: Config, base: TrainState,
                    example_batch) -> DiscTrainState:
    feats, input_lengths = prepare_features(example_batch, cfg)
    seq_in, _ = make_teacher_forcing(example_batch["targets"])
    _, enc = model.apply(base.params, feats, input_lengths, seq_in,
                         method="forward_with_encoder")
    pooled = jnp.sum(enc.astype(jnp.float32), axis=1)
    disc_params = discriminator.init(jax.random.PRNGKey(cfg.train.seed + 1),
                                     pooled)
    disc_opt = _disc_optimizer(cfg)
    return DiscTrainState(base=base, disc_params=disc_params,
                          disc_opt_state=disc_opt.init(disc_params))


def _disc_optimizer(cfg: Config):
    if cfg.train.opt_name == "sgd":
        return sgd(cfg.train.lr_disc)
    return adam(cfg.train.lr_disc)


def make_joint_step_disc(model, discriminator, cfg: Config,
                         optimizer) -> Callable:
    smoothing = cfg.train.label_smoothing
    adversarial = cfg.train.adversarial
    disc_opt = _disc_optimizer(cfg)

    def task_loss(params, disc_params, batch, accent_id, rng):
        feats, input_lengths = prepare_features(batch, cfg)
        seq_in, seq_out = make_teacher_forcing(batch["targets"])
        logits, enc = model.apply(
            params, feats, input_lengths, seq_in, deterministic=False,
            rngs={"dropout": rng}, method="forward_with_encoder",
        )
        pooled = jnp.sum(enc.astype(jnp.float32), axis=1)
        disc_logits = discriminator.apply(disc_params, pooled)
        ce, _ = ce_loss(logits, seq_out, PAD_ID, smoothing)
        ce = masked_loss_guard(ce)
        disc_l, enc_l = adversarial_losses(disc_logits, accent_id)
        aux = {"hyp": jnp.argmax(logits, -1), "gold": seq_out}
        return ce, disc_l, enc_l, aux

    def total_loss(params, disc_params, batches, rng, beta):
        k = jax.tree.leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, k)
        accents = jnp.arange(k)
        ce, disc_l, enc_l, aux = jax.vmap(
            task_loss, in_axes=(None, None, 0, 0, 0)
        )(params, disc_params, batches, accents, rngs)
        if adversarial:
            # (beta*disc)/K + enc/K per task, summed == mean(beta*disc + enc)
            loss = jnp.mean(ce) + jnp.mean(beta * disc_l) + jnp.mean(enc_l)
        else:
            loss = jnp.mean(ce) + jnp.mean(disc_l)
        return loss, (jnp.mean(ce), jnp.mean(disc_l), jnp.mean(enc_l), aux)

    @jax.jit
    def step(state: DiscTrainState, batches, rng, beta):
        (loss, (ce, disc_l, enc_l, aux)), grads = jax.value_and_grad(
            total_loss, argnums=(0, 1), has_aux=True
        )(state.base.params, state.disc_params, batches, rng, beta)
        g_model, g_disc = grads
        if cfg.train.clip:
            g_model = _clip_tree(g_model, cfg.train.max_norm)
        updates, opt_state = optimizer.update(g_model, state.base.opt_state,
                                              state.base.params)
        params = optax.apply_updates(state.base.params, updates)
        d_updates, d_opt_state = disc_opt.update(g_disc, state.disc_opt_state,
                                                 state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        base = state.base.replace(step=state.base.step + 1, params=params,
                                  opt_state=opt_state)
        new_state = state.replace(base=base, disc_params=disc_params,
                                  disc_opt_state=d_opt_state)
        aux = dict(aux, ce=ce, disc_loss=disc_l, enc_loss=enc_l)
        return new_state, ce, aux

    return step
