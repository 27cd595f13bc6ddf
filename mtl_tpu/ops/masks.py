"""Attention / padding mask builders.

Length- and id-based, static-shape equivalents of the reference mask helpers
(modules/common_layers.py:38-84). All masks follow the reference convention:

* ``non_pad_mask``: 1.0 at valid positions, 0.0 at pad — multiplied into layer
  outputs (B x T x 1).
* ``attn mask``: True at positions that must NOT be attended (filled with -inf
  before softmax), shape B x T_q x T_k.

The reference builds encoder masks from the *un-downsampled* input lengths
while the encoder runs on conv-downsampled time (SURVEY.md §3.3); callers
replicate that quirk by simply passing the raw lengths — positions beyond T
behave as "all valid" because the comparison saturates.
"""

from __future__ import annotations

import jax.numpy as jnp


def non_pad_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """B -> B x T x 1 float mask; 1.0 where position < length.

    Parity: get_non_pad_mask(..., input_lengths=...) at common_layers.py:38-48.
    """
    pos = jnp.arange(max_len)[None, :]  # 1 x T
    mask = (pos < lengths[:, None]).astype(jnp.float32)  # B x T
    return mask[:, :, None]


def non_pad_mask_from_ids(seq: jnp.ndarray, pad_idx: int) -> jnp.ndarray:
    """B x T int ids -> B x T x 1 float mask; 1.0 where id != pad_idx.

    Parity: get_non_pad_mask(..., pad_idx=...) at common_layers.py:49-52.
    """
    return (seq != pad_idx).astype(jnp.float32)[:, :, None]


def attn_pad_mask_from_lengths(
    lengths: jnp.ndarray, key_len: int, query_len: int
) -> jnp.ndarray:
    """B -> B x T_q x T_k bool mask; True where the KEY position is padding.

    Parity: get_attn_pad_mask at common_layers.py:67-74.
    """
    pos = jnp.arange(key_len)[None, :]
    pad = pos >= lengths[:, None]  # B x T_k, True at pad
    return jnp.broadcast_to(pad[:, None, :], (lengths.shape[0], query_len, key_len))


def attn_key_pad_mask(
    seq_k: jnp.ndarray, query_len: int, pad_idx: int
) -> jnp.ndarray:
    """B x T_k ids -> B x T_q x T_k bool mask; True where key id == pad_idx.

    Parity: get_attn_key_pad_mask at common_layers.py:56-65.
    """
    pad = seq_k == pad_idx  # B x T_k
    return jnp.broadcast_to(
        pad[:, None, :], (seq_k.shape[0], query_len, seq_k.shape[1])
    )


def subsequent_mask(seq_len: int) -> jnp.ndarray:
    """T -> T x T bool mask; True strictly above the diagonal (future).

    Parity: get_subsequent_mask at common_layers.py:76-84 (batch dim is added
    by broadcasting at the call site).
    """
    return jnp.triu(jnp.ones((seq_len, seq_len), dtype=bool), k=1)
