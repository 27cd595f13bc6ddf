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
from .steps import TrainState, _clip_tree, _merge_batch_stats, prepare_features


def _apply_with_encoder(model, params, feats, input_lengths, seq_in, rng):
    """Training-mode forward_with_encoder that threads emb_cnn's BatchNorm
    ``batch_stats`` mutation (steps.make_forward_fn does the same for the
    plain forward). Returns (logits, enc, new_batch_stats_or_None)."""
    if "batch_stats" in params:
        (logits, enc), mutated = model.apply(
            params, feats, input_lengths, seq_in, deterministic=False,
            rngs={"dropout": rng}, method="forward_with_encoder",
            mutable=["batch_stats"],
        )
        return logits, enc, mutated["batch_stats"]
    logits, enc = model.apply(
        params, feats, input_lengths, seq_in, deterministic=False,
        rngs={"dropout": rng}, method="forward_with_encoder",
    )
    return logits, enc, None


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


def make_meta_step_disc(model, discriminator, cfg: Config, outer_optimizer,
                        per_task_query: bool = False) -> Callable:
    """Meta step with the adversarial/multitask head inside meta-validation.

    Parity: trainer/asr/meta_trainer.py:243-263 — the inner adaptation is
    plain CE; each task's QUERY loss adds the discriminator terms
    (``val_loss + enc_loss + beta*disc_loss`` adversarial, ``+ disc_loss``
    multitask) with accent_id = the query batch's manifest id (the task id
    under MAML per-task queries; the target task under the shared
    meta-transfer query). Outer grads flow through the augmented query loss;
    the discriminator trains from the same backward via its own optimizer.
    """
    from .steps import make_forward_fn

    if cfg.train.second_order:
        # The reference's copy-grad meta path is first-order too
        # (trainer/asr/meta_trainer.py never differentiates through
        # inner_opt.step); refuse rather than silently train a different
        # algorithm than the flags claim.
        raise ValueError(
            "--second-order is not implemented for the adversarial/multitask"
            " meta step; drop --second-order or the discriminator flags")

    forward = make_forward_fn(model, cfg)
    inner_lr = cfg.train.lr
    clip = cfg.train.clip
    max_norm = cfg.train.max_norm
    adversarial = cfg.train.adversarial
    smoothing = cfg.train.label_smoothing
    disc_opt = _disc_optimizer(cfg)

    def query_loss(params, disc_params, batch, accent_id, rng, beta):
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
        if adversarial:
            total = ce + beta * disc_l + enc_l
        else:
            total = ce + disc_l
        aux = {"hyp": jnp.argmax(logits, -1), "gold": seq_out}
        return total, (ce, disc_l, enc_l, aux)

    def task_grads_fo(params, disc_params, support_batch, query_batch,
                      accent_id, rng, beta):
        """First-order flat form (steps.py:task_outer_grad_fo) with the
        disc-augmented query objective."""
        rng_s, rng_q = jax.random.split(rng)
        (s_loss, s_aux), g = jax.value_and_grad(forward, has_aux=True)(
            params, support_batch, rng_s, False
        )
        if clip:
            g = _clip_tree(g, max_norm)
        adapted = jax.tree.map(lambda w, gw: w - inner_lr * gw, params, g)
        (q_total, (ce_q, disc_l, enc_l, q_aux)), grads = jax.value_and_grad(
            query_loss, argnums=(0, 1), has_aux=True
        )(adapted, disc_params, query_batch, accent_id, rng_q, beta)
        return (q_total, grads[0], grads[1],
                (s_loss, s_aux, ce_q, disc_l, enc_l, q_aux))

    @jax.jit
    def step(state: DiscTrainState, support, query, dropout_rng, beta):
        k = jax.tree.leaves(support)[0].shape[0]
        rngs = jax.random.split(dropout_rng, k)
        q_axes = 0 if per_task_query else None
        # MAML: accent = the task's own manifest id; meta-transfer shared
        # query: always the code-switched target (last manifest)
        accents = (jnp.arange(k) if per_task_query
                   else jnp.full((k,), k - 1, jnp.int32))
        losses, g_model, g_disc, (s_losses, s_aux, ce_q, disc_l, enc_l,
                                  q_aux) = jax.vmap(
            task_grads_fo, in_axes=(None, None, 0, q_axes, 0, 0, None)
        )(state.base.params, state.disc_params, support, query, accents,
          rngs, beta)
        loss = jnp.mean(losses)
        grads = jax.tree.map(lambda t: jnp.mean(t, axis=0), g_model)
        d_grads = jax.tree.map(lambda t: jnp.mean(t, axis=0), g_disc)
        if clip:
            grads = _clip_tree(grads, max_norm)
        updates, opt_state = outer_optimizer.update(
            grads, state.base.opt_state, state.base.params)
        params = optax.apply_updates(state.base.params, updates)
        d_updates, d_opt_state = disc_opt.update(
            d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        base = state.base.replace(step=state.base.step + 1, params=params,
                                  opt_state=opt_state)
        new_state = state.replace(base=base, disc_params=disc_params,
                                  disc_opt_state=d_opt_state)
        metrics = {
            "outer_loss": loss,
            "support_losses": s_losses,
            "support_hyp": s_aux["hyp"],
            "support_gold": s_aux["gold"],
            "query_hyp": q_aux["hyp"],
            "query_gold": q_aux["gold"],
            "query_ce": jnp.mean(ce_q),
            "disc_loss": jnp.mean(disc_l),
            "enc_loss": jnp.mean(enc_l),
        }
        return new_state, metrics

    return step


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
