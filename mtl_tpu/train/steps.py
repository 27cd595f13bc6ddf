"""Jitted training steps.

This is the TPU-native re-expression of the reference control loops:

* ``joint``: trainer/asr/joint_trainer.py:195-271 — per-iteration loop over K
  task batches accumulating ``grad(loss_k / K)`` then one Adam/SGD step.
  Here: ``jax.vmap`` the forward over the stacked task axis, take
  ``grad(mean_k loss_k)`` — algebraically identical — in ONE compiled program.

* ``meta_transfer``: trainer/asr/transient_trainer.py:155-255 — the paper's
  algorithm. Reference (sequential, per task): snapshot weights -> forward on
  task support batch -> inner SGD step -> forward the SHARED query batch
  (always drawn from the last manifest = code-switched target,
  transient_trainer.py:168) at the adapted weights -> accumulate outer grad
  (copy-grad = first-order) -> restore snapshot; finally Adam outer step.
  Here this is the pure function

      outer_grad = (1/K) * sum_k  d/dp  L_query( p - lr_inner * clip(dL_k/dp) )

  with ``stop_gradient`` on the inner gradient for first-order (copy-grad
  parity — the torch autograd graph never flows through ``inner_opt.step``
  either, so the reference is always first-order) and full grad-through-inner
  when ``second_order=True`` (the stretch config). Tasks run under ``vmap``
  (the snapshot/restore dance is free: params are immutable pytrees), and
  outer grads are ``psum``-reduced by pjit when the step runs sharded over a
  mesh.

* ``maml``: trainer/asr/meta_trainer.py — identical skeleton but each task's
  outer loss is evaluated on the task's OWN query batch.

Batches are dicts of stacked, statically-shaped arrays. Audio can enter raw
(``audio``/``audio_lengths``) — the fused device front-end then runs inside
the same XLA program as the model — or as precomputed ``features``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..data.vocab import PAD_ID
from ..ops.frontend import log_spectrogram
from ..ops.targets import make_teacher_forcing, target_lengths
from .losses import ce_loss, ce_row_losses, ctc_loss, masked_loss_guard


class TrainState(struct.PyTreeNode):
    """``params`` is the FULL flax variables dict — for emb_cnn it carries a
    ``batch_stats`` collection (BatchNorm running stats) alongside ``params``;
    the train steps thread its updates via ``mutable=`` (see
    ``_apply_batch_stats`` below) so eval/decode read fresh averages."""

    step: jnp.ndarray
    params: Any
    opt_state: Any


def prepare_features(batch: Dict[str, jnp.ndarray], cfg: Config):
    """Return (features [B,T,F], input_lengths [B]) from either raw audio or
    precomputed features."""
    if "features" in batch:
        return batch["features"], batch["input_lengths"]
    if cfg.audio.feat == "logfbank":
        from ..ops.frontend import log_fbank

        # collate_audio reflect-pads n_fft//2 per side for the STFT path;
        # the psf logfbank front-end is uncentered -> slice the pad off.
        pad = cfg.audio.n_fft // 2
        raw = batch["audio"][:, pad:batch["audio"].shape[1] - pad]
        return log_fbank(
            raw, batch["audio_lengths"], sample_rate=cfg.audio.sample_rate,
            nfilt=80, normalize=cfg.audio.normalize,
        )
    feats, frame_lengths = log_spectrogram(
        batch["audio"], batch["audio_lengths"],
        n_fft=cfg.audio.n_fft, hop=cfg.audio.hop_length,
        window=cfg.audio.window, normalize=cfg.audio.normalize,
        use_pallas=cfg.audio.use_pallas,
        prepadded=True,  # collate_audio reflect-pads per utterance
    )
    return feats, frame_lengths


def make_forward_fn(model, cfg: Config) -> Callable:
    """Teacher-forced forward + loss. Returns (loss, aux) where aux carries
    argmax hyps / gold for host-side CER (transient_trainer.py:25-73)."""

    smoothing = cfg.train.label_smoothing
    loss_type = cfg.train.loss

    def forward(params, batch, dropout_rng=None, deterministic=True):
        feats, input_lengths = prepare_features(batch, cfg)
        targets = batch["targets"]
        seq_in, seq_out = make_teacher_forcing(targets)
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        new_bs = None
        if not deterministic and "batch_stats" in params:
            # emb_cnn: BatchNorm running stats mutate in train mode
            # (models/asr/transformer.py:38-46 trains them implicitly);
            # thread the updated collection out through aux.
            logits, mutated = model.apply(
                params, feats, input_lengths, seq_in,
                deterministic=deterministic, rngs=rngs,
                mutable=["batch_stats"],
            )
            new_bs = mutated["batch_stats"]
        else:
            logits = model.apply(
                params, feats, input_lengths, seq_in,
                deterministic=deterministic, rngs=rngs,
            )
        if loss_type == "ctc":
            # Reference quirk: CTC consumes the *decoder* outputs with input
            # lengths rebuilt from src percentages (utils/metrics.py:127-148,
            # transient_trainer.py:38-39). seq lengths here are exact.
            t = logits.shape[1]
            in_lens = jnp.minimum(
                (batch.get("src_percentages",
                           jnp.ones(targets.shape[0])) * t).astype(jnp.int32),
                t,
            )
            loss = ctc_loss(jax.nn.log_softmax(logits, -1), in_lens, targets,
                            target_lengths(targets))
            num_correct = jnp.zeros((), jnp.int32)
        else:
            loss, num_correct = ce_loss(logits, seq_out, PAD_ID, smoothing)
        loss = masked_loss_guard(loss)
        aux = {
            "hyp": jnp.argmax(logits, axis=-1),  # B x L
            "gold": seq_out,
            "num_correct": num_correct,
        }
        if new_bs is not None:
            aux["batch_stats"] = new_bs
        return loss, aux

    return forward


def _merge_batch_stats(params, aux) -> Any:
    """Fold the task-stacked ``batch_stats`` a vmapped forward emitted (see
    make_forward_fn) back into the variables dict: mean over the task axis.
    The reference updates BN running stats sequentially task-by-task
    (order-dependent momentum chain); the order-free mean has the same fixed
    point and is exact for K=1."""
    if not isinstance(aux, dict) or "batch_stats" not in aux:
        return params
    new_bs = jax.tree.map(lambda t: jnp.mean(t, axis=0),
                          aux.pop("batch_stats"))
    merged = dict(params)
    merged["batch_stats"] = new_bs
    return merged


def _clip_tree(grads, max_norm: float):
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


# ---------------------------------------------------------------------------
# Joint / plain step
# ---------------------------------------------------------------------------

def make_joint_step(model, cfg: Config, optimizer,
                    donate: bool = False,
                    space_id: Optional[int] = None) -> Callable:
    """One jitted joint-training iteration over stacked task batches.

    ``batches``: pytree whose leaves have a leading task axis K (K=1 for the
    plain epoch trainer). Gradient = grad of mean-over-tasks loss — identical
    to the reference's accumulate-(loss/K)-then-step (joint_trainer.py:226-266).

    ``donate``: donate the input TrainState buffers to the output (saves a
    params+opt-state double-buffer in HBM). The trainers enable it (they
    never reuse the old state); default off so callers may inspect the
    pre-step state.

    With ``cfg.train.device_cer`` the training CER is computed ON DEVICE
    (wavefront edit-distance DP) and returned as ``aux["cer_dist"]``/
    ``aux["cer_chars"]`` — no per-step host string decode.
    """
    forward = make_forward_fn(model, cfg)

    def joint_loss(params, batches, dropout_rng):
        k = jax.tree.leaves(batches)[0].shape[0]
        rngs = jax.random.split(dropout_rng, k)

        def one(batch, rng):
            return forward(params, batch, rng, deterministic=False)

        losses, aux = jax.vmap(one, in_axes=(0, 0))(batches, rngs)
        return jnp.mean(losses), aux

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batches, dropout_rng):
        (loss, aux), grads = jax.value_and_grad(joint_loss, has_aux=True)(
            state.params, batches, dropout_rng
        )
        if cfg.train.clip:
            grads = _clip_tree(grads, cfg.train.max_norm)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        params = _merge_batch_stats(params, aux)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        if cfg.train.device_cer:
            from ..ops.edit_distance_jax import device_cer

            k, b, l = aux["hyp"].shape
            d, c = device_cer(aux["hyp"].reshape(k * b, l),
                              aux["gold"].reshape(k * b, l),
                              space_id=space_id)
            aux["cer_dist"] = d
            aux["cer_chars"] = c
        return new_state, loss, aux

    return step


# ---------------------------------------------------------------------------
# Meta steps (meta-transfer and MAML)
# ---------------------------------------------------------------------------

def make_meta_step(
    model,
    cfg: Config,
    outer_optimizer,
    per_task_query: bool = False,
    space_id: Optional[int] = None,
    donate: bool = False,
    scan_tasks: bool = False,
) -> Callable:
    """One jitted meta iteration.

    ``support``: pytree with leading task axis K.
    ``query``: single batch (meta-transfer: the code-switched target task,
    transient_trainer.py:168) or, when ``per_task_query``, a pytree with
    leading task axis K (MAML, meta_trainer.py:244).

    ``scan_tasks``: run the task loop under ``lax.scan`` instead of ``vmap``
    — for both the first-order and the second-order (grad-through-inner)
    step. Identical math (exactness pinned by tests); on a data-sharded mesh
    it is the difference between ICI-bound and compute-bound — see
    ``outer_grads_fo_scan``.
    """
    forward = make_forward_fn(model, cfg)
    inner_lr = cfg.train.lr
    second_order = cfg.train.second_order
    clip = cfg.train.clip
    max_norm = cfg.train.max_norm
    if cfg.train.copy_grad and second_order:
        raise ValueError("--copy-grad (first-order) contradicts "
                         "--second-order; pass one or the other")
    if not second_order:
        import logging

        # --copy-grad is a no-op by design: the reference's meta path is
        # ALWAYS first-order (torch autograd never flows through
        # inner_opt.step, transient_trainer.py:155-255), so the flat
        # first-order form below is exact with or without the flag.
        logging.getLogger(__name__).info(
            "meta step: flat first-order outer gradients (reference parity;"
            " --copy-grad names this and changes nothing)")

    def task_outer_loss(params, support_batch, query_batch, rng):
        rng_s, rng_q = jax.random.split(rng)
        (s_loss, s_aux), g = jax.value_and_grad(forward, has_aux=True)(
            params, support_batch, rng_s, False
        )
        if clip:
            g = _clip_tree(g, max_norm)
        if not second_order:
            g = jax.lax.stop_gradient(g)
        adapted = jax.tree.map(lambda w, gw: w - inner_lr * gw, params, g)
        q_loss, q_aux = forward(adapted, query_batch, rng_q, False)
        return q_loss, (s_loss, s_aux, q_aux)

    def task_outer_grad_fo(params, support_batch, query_batch, rng):
        """First-order task step as two FLAT grad calls: with the inner
        gradient stop_gradient'ed,  d/dp L_q(p - lr*g)  ==  dL_q/dp evaluated
        at the adapted weights — no grad-through-grad needed. Identical math
        to the nested form, but never differentiates the inner vjp (which
        custom_vjp ops like the fused Pallas VGG stack do not support)."""
        rng_s, rng_q = jax.random.split(rng)
        (s_loss, s_aux), g = jax.value_and_grad(forward, has_aux=True)(
            params, support_batch, rng_s, False
        )
        if clip:
            g = _clip_tree(g, max_norm)
        adapted = jax.tree.map(lambda w, gw: w - inner_lr * gw, params, g)
        (q_loss, q_aux), gq = jax.value_and_grad(forward, has_aux=True)(
            adapted, query_batch, rng_q, False
        )
        return q_loss, gq, (s_loss, s_aux, q_aux)

    def outer_loss(params, support, query, dropout_rng):
        k = jax.tree.leaves(support)[0].shape[0]
        rngs = jax.random.split(dropout_rng, k)
        q_axes = 0 if per_task_query else None
        losses, (s_losses, s_aux, q_aux) = jax.vmap(
            task_outer_loss, in_axes=(None, 0, q_axes, 0)
        )(params, support, query, rngs)
        # mean == reference's sum of (loss / K) across tasks
        return jnp.mean(losses), (s_losses, s_aux, q_aux)

    def outer_grads_fo(params, support, query, dropout_rng):
        k = jax.tree.leaves(support)[0].shape[0]
        rngs = jax.random.split(dropout_rng, k)
        q_axes = 0 if per_task_query else None
        losses, gq, (s_losses, s_aux, q_aux) = jax.vmap(
            task_outer_grad_fo, in_axes=(None, 0, q_axes, 0)
        )(params, support, query, rngs)
        grads = jax.tree.map(lambda t: jnp.mean(t, axis=0), gq)
        return (jnp.mean(losses), (s_losses, s_aux, q_aux)), grads

    def outer_grads_fo_scan(params, support, query, dropout_rng):
        """outer_grads_fo's math with the task loop under ``lax.scan``.

        Why it exists: under ``vmap`` the query forward runs at PER-TASK
        adapted kernels, so XLA batches its convs as feature groups; the
        reshapes that lowering inserts defeat SPMD sharding propagation
        ("involuntary full rematerialization", XLA issue b/433785288), and a
        data-sharded mesh gets multi-GB conv-activation all-gathers per step
        (measured by bench_scaling_projection.py: 6.7 GB/step at flagship
        shapes). ``scan`` keeps every conv's kernel unmapped, leaving only
        the algorithmic gradient all-reduces on the wire; single-chip FLOPs
        are identical."""
        k = jax.tree.leaves(support)[0].shape[0]
        rngs = jax.random.split(dropout_rng, k)
        zero = jax.tree.map(jnp.zeros_like, params)

        def body(gsum, xs):
            if per_task_query:
                sup, q, rng = xs
            else:
                (sup, rng), q = xs, query
            q_loss, gq, aux = task_outer_grad_fo(params, sup, q, rng)
            return jax.tree.map(jnp.add, gsum, gq), (q_loss, aux)

        xs = (support, query, rngs) if per_task_query else (support, rngs)
        gsum, (losses, (s_losses, s_aux, q_aux)) = jax.lax.scan(
            body, zero, xs)
        grads = jax.tree.map(lambda t: t / k, gsum)
        return (jnp.mean(losses), (s_losses, s_aux, q_aux)), grads

    def outer_grads_so_scan(params, support, query, dropout_rng):
        """Second-order outer gradients with the task loop under ``lax.scan``.

        Same rationale as ``outer_grads_fo_scan`` (the vmapped query forward's
        feature-group convs defeat SPMD sharding propagation and all-gather
        conv activations on a data mesh); the body differentiates THROUGH the
        inner SGD step (``task_outer_loss`` with ``second_order=True`` keeps
        the inner grad live). By linearity, the per-task grad sum / K equals
        ``grad(mean_k task_outer_loss_k)`` — the vmap form — exactly."""
        k = jax.tree.leaves(support)[0].shape[0]
        rngs = jax.random.split(dropout_rng, k)
        zero = jax.tree.map(jnp.zeros_like, params)
        grad_fn = jax.value_and_grad(task_outer_loss, has_aux=True)

        def body(gsum, xs):
            if per_task_query:
                sup, q, rng = xs
            else:
                (sup, rng), q = xs, query
            (q_loss, aux), gq = grad_fn(params, sup, q, rng)
            return jax.tree.map(jnp.add, gsum, gq), (q_loss, aux)

        xs = (support, query, rngs) if per_task_query else (support, rngs)
        gsum, (losses, (s_losses, s_aux, q_aux)) = jax.lax.scan(
            body, zero, xs)
        grads = jax.tree.map(lambda t: t / k, gsum)
        return (jnp.mean(losses), (s_losses, s_aux, q_aux)), grads

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, support, query, dropout_rng):
        if second_order and scan_tasks:
            (loss, (s_losses, s_aux, q_aux)), grads = outer_grads_so_scan(
                state.params, support, query, dropout_rng)
        elif second_order:
            (loss, (s_losses, s_aux, q_aux)), grads = jax.value_and_grad(
                outer_loss, has_aux=True
            )(state.params, support, query, dropout_rng)
        elif scan_tasks:
            (loss, (s_losses, s_aux, q_aux)), grads = outer_grads_fo_scan(
                state.params, support, query, dropout_rng)
        else:
            (loss, (s_losses, s_aux, q_aux)), grads = outer_grads_fo(
                state.params, support, query, dropout_rng)
        if clip:
            grads = _clip_tree(grads, max_norm)
        updates, opt_state = outer_optimizer.update(grads, state.opt_state,
                                                    state.params)
        params = optax.apply_updates(state.params, updates)
        # emb_cnn BN running stats: adopt the query-forward (adapted-params)
        # stats, like the reference's final forward of the iteration.
        s_aux.pop("batch_stats", None)
        params = _merge_batch_stats(params, q_aux)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = {
            "outer_loss": loss,
            "support_losses": s_losses,
            "support_hyp": s_aux["hyp"],  # K x B x L
            "support_gold": s_aux["gold"],
            "query_hyp": q_aux["hyp"],
            "query_gold": q_aux["gold"],
        }
        if cfg.train.device_cer:
            from ..ops.edit_distance_jax import device_cer

            k, b, l = s_aux["hyp"].shape
            d, c = device_cer(s_aux["hyp"].reshape(k * b, l),
                              s_aux["gold"].reshape(k * b, l),
                              space_id=space_id)
            metrics["cer_dist"] = d
            metrics["cer_chars"] = c
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# Evaluation step
# ---------------------------------------------------------------------------

def make_eval_step(model, cfg: Config) -> Callable:
    """Eval step; aux additionally carries per-row loss sums / token counts
    so ragged final batches (padded with duplicate rows by iter_batches) can
    be scored over valid rows only — matching the reference, whose loaders
    emit a smaller final batch (utils/data_loader.py:401-477)."""
    forward = make_forward_fn(model, cfg)
    smoothing = cfg.train.label_smoothing
    loss_type = cfg.train.loss

    @jax.jit
    def step(params, batch):
        feats, input_lengths = prepare_features(batch, cfg)
        targets = batch["targets"]
        seq_in, seq_out = make_teacher_forcing(targets)
        logits = model.apply(params, feats, input_lengths, seq_in,
                             deterministic=True)
        if loss_type == "ctc":
            t = logits.shape[1]
            in_lens = jnp.minimum(
                (batch.get("src_percentages",
                           jnp.ones(targets.shape[0])) * t).astype(jnp.int32),
                t,
            )
            tlens = target_lengths(targets)
            log_probs = jax.nn.log_softmax(logits, -1)
            logit_pad = (jnp.arange(t)[None, :] >= in_lens[:, None]).astype(
                jnp.float32)
            label_pad = (jnp.arange(targets.shape[1])[None, :]
                         >= tlens[:, None]).astype(jnp.float32)
            per_seq = optax.ctc_loss(log_probs, logit_pad, targets, label_pad,
                                     blank_id=PAD_ID)
            # torch reduction="mean" parity: per-seq loss / target length
            row_loss = per_seq / jnp.maximum(tlens, 1)
            row_tokens = jnp.ones_like(tlens)
        else:
            row_loss, row_tokens = ce_row_losses(logits, seq_out, PAD_ID,
                                                 smoothing)
        loss = masked_loss_guard(
            jnp.sum(row_loss) / jnp.maximum(jnp.sum(row_tokens), 1)
        )
        aux = {
            "hyp": jnp.argmax(logits, axis=-1),
            "gold": seq_out,
            "row_loss": row_loss,
            "row_tokens": row_tokens,
        }
        return loss, aux

    return step


def init_train_state(model, cfg: Config, optimizer, rng,
                     example_batch) -> TrainState:
    feats, input_lengths = prepare_features(example_batch, cfg)
    seq_in, _ = make_teacher_forcing(example_batch["targets"])
    params = model.init(rng, feats, input_lengths, seq_in)
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state)
