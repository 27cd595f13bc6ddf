"""Batched greedy decoding with a KV cache under lax.scan.

Parity: Decoder.greedy_search (modules/decoder.py:131-184) — start token,
fixed 300-step loop (:145), argmax next token, host cuts each row's string at
the first EOS. The reference re-forwards the whole prefix every step with no
KV cache and NO dec-enc attention mask (padded encoder frames are attended —
:160); we replicate the math (cache decode is exact for a causal post-LN
stack) at O(1) work per step.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from ..data.vocab import EOS_ID, Vocab
from ..models.transformer import ASRTransformer


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def greedy_decode_ids(
    model: ASRTransformer,
    params,
    features: jnp.ndarray,  # B x T x F
    input_lengths: jnp.ndarray,  # B
    max_steps: int = 300,
    start_token: int = 1,  # SOS
    early_exit: bool = True,
) -> jnp.ndarray:
    """Returns decoded token ids [B, max_steps] (EOS handling on host).

    ``early_exit`` stops the loop once every row has emitted EOS (identical
    outputs — post-EOS tokens are discarded on host anyway; the reference
    always runs the full 300 steps)."""
    enc, enc_kvs = model.apply(
        params, features, input_lengths, method=ASRTransformer.prepare_decode
    )
    return greedy_decode_from_kv(model, params, enc_kvs, max_steps,
                                 start_token, early_exit)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def greedy_decode_from_kv(
    model: ASRTransformer,
    params,
    enc_kvs,  # precomputed cross-attention K/V (prepare_decode /
    # precompute_enc_kv) — the entry the sequence-parallel long-form
    # path decodes through (parallel/sp.py)
    max_steps: int = 300,
    start_token: int = 1,
    early_exit: bool = True,
) -> jnp.ndarray:
    b = jax.tree.leaves(enc_kvs)[0].shape[0]
    caches = model.apply(params, b, max_steps + 1,
                         method=ASRTransformer.init_cache)
    y0 = jnp.full((b,), start_token, jnp.int32)

    if not early_exit:
        def step(carry, t):
            y_t, caches = carry
            logits, caches = model.apply(
                params, y_t, t, enc_kvs, caches,
                method=ASRTransformer.decode_step,
            )
            next_y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (next_y, caches), next_y

        (_, _), ys = jax.lax.scan(step, (y0, caches), jnp.arange(max_steps))
        return jnp.transpose(ys)  # B x max_steps

    ys0 = jnp.full((b, max_steps), EOS_ID, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def cond(state):
        t, _, _, _, done = state
        return (t < max_steps) & ~jnp.all(done)

    def body(state):
        t, y_t, caches, ys, done = state
        logits, caches = model.apply(
            params, y_t, t, enc_kvs, caches,
            method=ASRTransformer.decode_step,
        )
        next_y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ys = ys.at[:, t].set(next_y)
        done = done | (next_y == EOS_ID)
        return t + 1, next_y, caches, ys, done

    _, _, _, ys, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), y0, caches, ys0, done0)
    )
    return ys


def ids_to_strings(ids, vocab: Vocab) -> List[str]:
    """Cut each row at the first EOS and join labels (greedy_search
    string-building parity, modules/decoder.py:175-184)."""
    out = []
    import numpy as np

    ids = np.asarray(ids)
    for row in ids:
        chars = []
        for i in row:
            if int(i) == EOS_ID:
                break
            chars.append(vocab.id2label[int(i)])
        out.append("".join(chars))
    return out


def greedy_search(
    model: ASRTransformer, params, features, input_lengths, vocab: Vocab,
    max_steps: int = 300, start_token: int = 1,
) -> List[str]:
    ids = greedy_decode_ids(model, params, features, input_lengths,
                            max_steps, start_token)
    return ids_to_strings(ids, vocab)
