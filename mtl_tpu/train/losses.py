"""Loss functions.

Parity: utils/metrics.py:68-199 —
* CE: ``F.cross_entropy(ignore_index=pad, reduction=mean)`` — token-mean over
  non-pad positions (:126);
* label smoothing: scatter one-hot, ``one_hot*(1-eps) + (1-one_hot)*eps/C``,
  mean over non-pad tokens (:113-124);
* num_correct: argmax matches over non-pad positions (:84-89);
* CTC: log_softmax + ctc_loss with input lengths rebuilt from
  ``src_percentages * pred_T`` at the call sites (:127-148);
* adversarial: discriminator CE against the task id + encoder MSE toward the
  uniform distribution (:164-183); multitask: CE only (:185-199).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.vocab import PAD_ID


def ce_row_losses(
    logits: jnp.ndarray,  # B x L x C float32
    gold: jnp.ndarray,  # B x L int ids (PAD-padded)
    pad_id: int = PAD_ID,
    smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (loss sum over non-pad tokens, non-pad token count).

    The batch-mean CE is sum(row_loss)/sum(row_tokens); exposing the per-row
    decomposition lets eval trim padded duplicate rows from ragged final
    batches (reference AudioDataLoader emits a smaller final batch instead,
    utils/data_loader.py:401-477)."""
    mask = gold != pad_id  # B x L
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    if smoothing > 0.0:
        c = logits.shape[-1]
        gold_safe = jnp.where(mask, gold, 0)
        one_hot = jax.nn.one_hot(gold_safe, c, dtype=log_probs.dtype)
        one_hot = one_hot * (1.0 - smoothing) + (1.0 - one_hot) * smoothing / c
        tok_loss = -jnp.sum(one_hot * log_probs, axis=-1)
    else:
        tok_loss = -jnp.take_along_axis(
            log_probs, gold[..., None], axis=-1
        )[..., 0]

    row_loss = jnp.sum(jnp.where(mask, tok_loss, 0.0), axis=-1)  # B
    row_tokens = jnp.sum(mask, axis=-1)  # B
    return row_loss, row_tokens


def ce_loss(
    logits: jnp.ndarray,  # B x L x C float32
    gold: jnp.ndarray,  # B x L int ids (PAD-padded)
    pad_id: int = PAD_ID,
    smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (scalar mean loss over non-pad tokens, num_correct)."""
    mask = gold != pad_id  # B x L
    row_loss, row_tokens = ce_row_losses(logits, gold, pad_id, smoothing)
    loss = jnp.sum(row_loss) / jnp.maximum(jnp.sum(row_tokens), 1)

    hyp = jnp.argmax(logits, axis=-1)
    num_correct = jnp.sum((hyp == gold) & mask)
    return loss, num_correct


def masked_loss_guard(loss: jnp.ndarray) -> jnp.ndarray:
    """Zero out non-finite losses (reference Inf/NaN guard,
    transient_trainer.py:46-49 — which checks Inf but masks NaN; we guard
    both, the strictly-safer superset)."""
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def ctc_loss(
    logits: jnp.ndarray,  # B x T x C (decoder outputs — reference quirk)
    input_lengths: jnp.ndarray,  # B
    targets: jnp.ndarray,  # B x L
    target_lengths: jnp.ndarray,  # B
    pad_id: int = PAD_ID,
) -> jnp.ndarray:
    """CTC loss; blank id = PAD (reference passes no blank => 0).

    torch ``F.ctc_loss(reduction="mean")`` parity: each sequence's loss is
    divided by its target length before the batch mean
    (utils/metrics.py:141 — verified in tests/test_torch_parity.py)."""
    t = logits.shape[1]
    l = targets.shape[1]
    logit_paddings = (jnp.arange(t)[None, :] >= input_lengths[:, None]).astype(
        jnp.float32
    )
    label_paddings = (jnp.arange(l)[None, :] >= target_lengths[:, None]).astype(
        jnp.float32
    )
    per_seq = optax.ctc_loss(
        logits, logit_paddings, targets, label_paddings, blank_id=pad_id
    )
    return jnp.mean(per_seq / jnp.maximum(target_lengths, 1))


def adversarial_losses(
    disc_logits: jnp.ndarray,  # B x num_class
    accent_id,  # scalar int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(discriminator CE, encoder MSE-to-uniform)."""
    b, c = disc_logits.shape
    gold = jnp.full((b,), accent_id, dtype=jnp.int32)
    log_probs = jax.nn.log_softmax(disc_logits, axis=-1)
    disc_loss = -jnp.mean(jnp.take_along_axis(log_probs, gold[:, None], 1))
    enc_loss = jnp.mean((disc_logits - 1.0 / c) ** 2)
    return disc_loss, enc_loss


def multitask_loss(disc_logits: jnp.ndarray, accent_id) -> jnp.ndarray:
    return adversarial_losses(disc_logits, accent_id)[0]
