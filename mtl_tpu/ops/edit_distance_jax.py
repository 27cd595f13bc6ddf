"""On-device Levenshtein distance (jit/vmap-able).

TPU-native alternative to the host CER path (utils/metrics.py CER via the
C++ edit-distance core): the per-iteration train CER can be computed inside
the jitted step, shipping two scalars to the host instead of decoding token
matrices into strings every iteration.

Row recurrence vectorized with an associative prefix-min:
    cur[j] = min(prev[j]+1, prev[j-1]+sub_j, cur[j-1]+1)
The cur[j-1] chain is  cur[j] = j + min_{k<=j} (c[k] - k)  with
c[j] = min(prev[j]+1, prev[j-1]+sub_j), i.e. one `associative_scan(min)` per
row — no sequential inner loop.

CER parity: with a character vocab, the reference's post-processing (strip
special tokens, "▁"->" ", drop spaces — transient_trainer.py:55-64) equals
dropping {PAD, SOS, EOS, OOV, space} ids and comparing the remaining id
sequences.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.vocab import EOS_ID, OOV_ID, PAD_ID, SOS_ID

BIG = jnp.int32(1 << 20)


def _one_pair(hyp, hyp_len, gold, gold_len):
    l1, l2 = hyp.shape[0], gold.shape[0]
    j = jnp.arange(l2 + 1)

    def row(prev, i):
        sub = (hyp[i - 1] != gold).astype(jnp.int32)  # [l2]
        c = jnp.concatenate(
            [jnp.array([0], jnp.int32), jnp.minimum(prev[1:] + 1,
                                                    prev[:-1] + sub)]
        )
        c = c.at[0].set(prev[0] + 1)
        # cur[j] = j + min_{k<=j}(c[k] - k)
        cur = j + jax.lax.associative_scan(jnp.minimum, c - j)
        return cur.astype(jnp.int32), cur[gold_len]

    prev0 = j.astype(jnp.int32)
    _, finals = jax.lax.scan(row, prev0, jnp.arange(1, l1 + 1))
    # distance = D[hyp_len][gold_len]; hyp_len==0 -> gold_len
    finals = jnp.concatenate([jnp.array([gold_len], jnp.int32), finals])
    return finals[hyp_len]


@jax.jit
def edit_distance_device(
    hyp: jnp.ndarray,  # [B, L1] int ids
    hyp_len: jnp.ndarray,  # [B]
    gold: jnp.ndarray,  # [B, L2]
    gold_len: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Per-row Levenshtein distances [B] (padded, length-aware)."""
    return jax.vmap(_one_pair)(hyp, hyp_len, gold, gold_len)


def compact_ids(tokens: jnp.ndarray, drop_ids) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Remove the given ids, left-compacting each row; returns
    (compacted [B, L] PAD-filled, lengths [B])."""
    keep = jnp.ones(tokens.shape, bool)
    for d in drop_ids:
        keep &= tokens != d
    idx = jnp.cumsum(keep, axis=-1) - 1
    l = tokens.shape[-1]
    dest = jnp.where(keep, idx, l)  # dropped -> out of range
    out = jnp.full_like(tokens, PAD_ID)
    out = jax.vmap(
        lambda o, d, t: o.at[d].set(t, mode="drop")
    )(out, dest, tokens)
    return out, keep.sum(axis=-1)


def device_cer(
    hyp: jnp.ndarray,  # [B, L] raw decoder ids (argmax or search output)
    gold: jnp.ndarray,  # [B, L] gold ids (PAD-padded, EOS-terminated)
    space_id: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(total_edit_distance, total_gold_chars) scalars, reference train-CER
    semantics: specials and spaces dropped before comparison."""
    drop = [PAD_ID, SOS_ID, EOS_ID, OOV_ID]
    if space_id is not None:
        drop.append(space_id)
    h, hl = compact_ids(hyp, drop)
    g, gl = compact_ids(gold, drop)
    d = edit_distance_device(h, hl, g, gl)
    return jnp.sum(d), jnp.sum(gl)
