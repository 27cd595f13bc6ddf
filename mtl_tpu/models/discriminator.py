"""Accent/language discriminator for adversarial & multitask training.

Parity: modules/discriminator.py:5-24 — one linear layer over the
time-summed encoder output. The copy-grad buffers (:26-62) have no JAX
analogue (functional gradients)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import KERNEL_INIT


class Discriminator(nn.Module):
    num_class: int

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """pooled: B x H (sum of encoder output over time) -> B x C logits."""
        return nn.Dense(self.num_class, kernel_init=KERNEL_INIT,
                        dtype=jnp.float32)(pooled)
