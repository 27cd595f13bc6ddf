"""Teacher-forcing target construction (static-shape).

Parity: Decoder.preprocess (modules/decoder.py:55-69) — strip PAD, prepend
SOS, append EOS, pad the input sequence with EOS and the output sequence with
PAD. The reference does this with Python list surgery per utterance; here it
is a pure, jit-safe array transform assuming targets are "compact" (non-pad
tokens form a prefix of each row — true of every loader in both codebases).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..data.vocab import EOS_ID, PAD_ID, SOS_ID


def target_lengths(targets: jnp.ndarray, pad_id: int = PAD_ID) -> jnp.ndarray:
    return jnp.sum(targets != pad_id, axis=-1)


def make_teacher_forcing(
    targets: jnp.ndarray,  # B x L int ids, PAD-padded
    pad_id: int = PAD_ID,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """targets -> (seq_in B x (L+1) EOS-padded, seq_out B x (L+1) PAD-padded)."""
    B, L = targets.shape
    lengths = target_lengths(targets, pad_id)  # B

    sos_col = jnp.full((B, 1), sos_id, dtype=targets.dtype)
    body = jnp.where(targets == pad_id, eos_id, targets)
    seq_in = jnp.concatenate([sos_col, body], axis=1)  # B x (L+1)

    pad_col = jnp.full((B, 1), pad_id, dtype=targets.dtype)
    out = jnp.concatenate([targets, pad_col], axis=1)  # B x (L+1)
    pos = jnp.arange(L + 1)[None, :]
    seq_out = jnp.where(pos == lengths[:, None], eos_id, out)
    return seq_in, seq_out
