"""Golden-value tests for losses and optimizer schedules."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtl_tpu.train.losses import adversarial_losses, ce_loss, ctc_loss, masked_loss_guard
from mtl_tpu.train.optim import noam_schedule


def test_ce_loss_golden():
    # 2 tokens, one padded; uniform logits over 4 classes -> loss = log(4)
    logits = jnp.zeros((1, 3, 4))
    gold = jnp.array([[1, 2, 0]])  # PAD=0 at position 2
    loss, num_correct = ce_loss(logits, gold, pad_id=0, smoothing=0.0)
    np.testing.assert_allclose(float(loss), math.log(4), rtol=1e-5)

    # peaked logits: correct class gets ~all mass -> loss ~0, num_correct 2
    logits = jnp.full((1, 3, 4), -20.0)
    logits = logits.at[0, 0, 1].set(20.0).at[0, 1, 2].set(20.0)
    loss, num_correct = ce_loss(logits, gold, pad_id=0)
    assert float(loss) < 1e-3
    assert int(num_correct) == 2


def test_ce_label_smoothing_formula():
    """Reference smoothing (utils/metrics.py:113-124): one_hot*(1-eps) +
    (1-one_hot)*eps/C, mean over non-pad tokens."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 5).astype(np.float32))
    gold = jnp.asarray([[1, 2, 0], [3, 0, 0]])
    eps = 0.1
    loss, _ = ce_loss(logits, gold, pad_id=0, smoothing=eps)

    lp = jax.nn.log_softmax(logits, -1)
    total, n = 0.0, 0
    for b in range(2):
        for t in range(3):
            g = int(gold[b, t])
            if g == 0:
                continue
            # reference: one_hot*(1-eps) + (1-one_hot)*eps/C
            one_hot = np.full(5, eps / 5)
            one_hot[g] = 1 - eps
            total += -np.sum(one_hot * np.asarray(lp[b, t]))
            n += 1
    np.testing.assert_allclose(float(loss), total / n, rtol=1e-5)


def test_masked_loss_guard():
    assert float(masked_loss_guard(jnp.asarray(float("inf")))) == 0.0
    assert float(masked_loss_guard(jnp.asarray(float("nan")))) == 0.0
    assert float(masked_loss_guard(jnp.asarray(3.5))) == 3.5


def test_ctc_loss_runs():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 10, 6).astype(np.float32))
    targets = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]])
    loss = ctc_loss(jax.nn.log_softmax(logits, -1), jnp.array([10, 8]),
                    targets, jnp.array([3, 2]))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_adversarial_losses_golden():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    disc, enc = adversarial_losses(logits, 0)
    # CE for row0 (correct, margin 2) + row1 (wrong, margin -2), mean
    expected = float(np.mean([
        -np.log(np.exp(2) / (np.exp(2) + 1)),
        -np.log(1 / (np.exp(2) + 1)),
    ]))
    np.testing.assert_allclose(float(disc), expected, rtol=1e-5)
    # MSE toward uniform 1/2
    np.testing.assert_allclose(float(enc),
                               np.mean((np.asarray(logits) - 0.5) ** 2),
                               rtol=1e-5)


def test_noam_schedule_values():
    """NoamOpt parity (utils/optimizer.py:27-32): rate = max(min_lr,
    factor * d^-0.5 * min(s^-0.5, s*warmup^-1.5)), 1-indexed steps."""
    sched = noam_schedule(model_size=512, factor=2.0, warmup=4000,
                          min_lr=1e-6)
    for step in (0, 99, 3999, 10000):
        s = step + 1
        expected = max(1e-6, 2.0 * 512 ** -0.5 * min(s ** -0.5,
                                                     s * 4000 ** -1.5))
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-5)
    # floor engages for tiny factor
    sched2 = noam_schedule(512, 1e-9, 4000, min_lr=1e-6)
    assert float(sched2(0)) == pytest.approx(1e-6)
