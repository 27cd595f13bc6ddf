"""Batched fixed-width beam search on device.

Parity target: Decoder.beam_search (modules/decoder.py:186-291) — per-step
log-softmax top-k expansion, cumulative scores, EOS retirement, and at the
end a length bonus ``sqrt(num_words) * c_weight`` plus optional LM
shallow-fusion rescoring (``score + lm_weight*lm_score - 2*oov``,
decoder.py:261-265).

Algorithm parity (static-shape re-expression of the reference's loop):
* each step expands every live beam by top-W tokens; expansions that end in
  EOS RETIRE to a fixed-size bank of ended hypotheses (best-kept) and their
  frontier slot dies (score -inf), exactly like the reference's shrinking
  `hyps`/`ended_hyps` lists (decoder.py:250-280);
* decoding stops when every frontier slot is dead or max_steps is reached
  (at the horizon the reference appends EOS to survivors, :253-255 — the
  bank absorbs them the same way);
* the bank ranks ended hypotheses by the reference's FINAL score — the
  length bonus ``sqrt(num_words)*c_weight`` is computed on device by
  incremental word-run counting over the generated tokens (specials
  PAD/SOS/EOS vanish from the string exactly like the reference's
  ``.replace(token, "")``, decoder.py:265) — so a bounded bank cannot evict
  a hypothesis that would win after rescoring (a raw-score bank could:
  VERDICT r2 #3);
* the final REPORTED ranking (strings + LM fusion, which needs host text)
  recomputes final_score on host over the bank, matching decoder.py:261-270;
* differences: the reference is a per-utterance Python loop re-forwarding
  the full prefix per hypothesis per step (no KV cache) and its bank is
  unbounded; here all utterances x beams advance in one jitted
  lax.while_loop with KV caches (flattened [B*W] batch) and the bank holds
  the best `bank_size` ended hypotheses per utterance;
* like the reference search paths, NO dec-enc attention mask is applied.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import (
    EOS_ID,
    EOS_TOKEN,
    PAD_ID,
    PAD_TOKEN,
    SOS_ID,
    SOS_TOKEN,
    Vocab,
    post_process,
)
from ..models.transformer import ASRTransformer

NEG_INF = -1.0e9


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def beam_decode_ids(
    model: ASRTransformer,
    params,
    features: jnp.ndarray,  # B x T x F
    input_lengths: jnp.ndarray,  # B
    beam_width: int = 3,
    max_steps: int = 300,
    start_token: int = 1,
    bank_size: int = 0,  # 0 -> max(beam_width, 5)
    space_id: int = -1,  # vocab id of " " for device word counting
    c_weight: jnp.ndarray | float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (bank_tokens [B, N, max_steps+1], bank_scores [B, N] raw
    cumulative log-probs, bank_words [B, N] reference num_words,
    bank_lengths [B, N]) — the best N ended hypotheses per utterance ranked
    by final score (raw + sqrt(num_words)*c_weight), EOS included at
    position length-1; empty slots have score <= NEG_INF/2."""
    b = features.shape[0]
    w = beam_width
    n_bank = bank_size or max(beam_width, 5)
    c_weight = jnp.asarray(c_weight, jnp.float32)
    enc, enc_kvs = model.apply(
        params, features, input_lengths, method=ASRTransformer.prepare_decode
    )
    # Tile encoder KV to B*W along batch.
    enc_kvs = jax.tree.map(
        lambda x: jnp.repeat(x, w, axis=0), enc_kvs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    caches0 = model.apply(params, b * w, max_steps + 1,
                          method=ASRTransformer.init_cache)

    y0 = jnp.full((b * w,), start_token, jnp.int32)
    # only beam 0 alive initially (others at -inf so duplicates don't win)
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((w - 1,), NEG_INF)]), (b,)
    ).reshape(b, w)
    tokens0 = jnp.zeros((b, w, max_steps + 1), jnp.int32)
    words0 = jnp.zeros((b, w), jnp.int32)
    in_word0 = jnp.zeros((b, w), bool)
    bank_keys0 = jnp.full((b, n_bank), 2 * NEG_INF)  # rank: final score
    bank_scores0 = jnp.full((b, n_bank), 2 * NEG_INF)  # raw score
    bank_words0 = jnp.zeros((b, n_bank), jnp.int32)
    bank_tokens0 = jnp.full((b, n_bank, max_steps + 1), EOS_ID, jnp.int32)
    bank_len0 = jnp.zeros((b, n_bank), jnp.int32)

    def final_key(raw, words):
        return raw + jnp.sqrt(jnp.maximum(words, 0).astype(jnp.float32)) \
            * c_weight

    def bank_insert(bank, cand):
        """Merge retirement candidates into the bank, ranked by final key."""
        (bank_keys, bank_scores, bank_words, bank_tokens, bank_len) = bank
        (keys, raw, wds, toks, lens) = cand
        all_keys = jnp.concatenate([bank_keys, keys], axis=1)
        all_raw = jnp.concatenate([bank_scores, raw], axis=1)
        all_words = jnp.concatenate([bank_words, wds], axis=1)
        all_tokens = jnp.concatenate([bank_tokens, toks], axis=1)
        all_len = jnp.concatenate([bank_len, lens], axis=1)
        top_keys, idx = jax.lax.top_k(all_keys, n_bank)
        take = lambda x: jnp.take_along_axis(x, idx, axis=1)
        return (top_keys, take(all_raw), take(all_words),
                jnp.take_along_axis(all_tokens, idx[:, :, None], axis=1),
                take(all_len))

    def body(state):
        (t, y_t, caches, scores, tokens, words, in_word, bank) = state
        logits, caches = model.apply(
            params, y_t, t, enc_kvs, caches,
            method=ASRTransformer.decode_step,
        )  # [B*W, V]
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, w, v)
        alive = scores > NEG_INF / 2
        cand = jnp.where(alive[..., None], scores[..., None] + logp,
                         2 * NEG_INF)  # B x W x V

        # top-W over ALL expansions (incl. EOS) — the reference's
        # hyps_best_kept (decoder.py:239-250)
        flat = cand.reshape(b, w * v)
        top_scores, top_idx = jax.lax.top_k(flat, w)  # B x W
        src_beam = top_idx // v
        next_tok = (top_idx % v).astype(jnp.int32)

        def gather_bw(x):  # [B, W, ...] select along W
            return jnp.take_along_axis(
                x, src_beam.reshape(src_beam.shape + (1,) * (x.ndim - 2)),
                axis=1,
            )

        tokens = gather_bw(tokens).at[:, :, t].set(next_tok)

        # incremental reference num_words: specials (PAD/SOS/EOS) vanish
        # from the joined string (joining their neighbours), a space ends
        # the current word-run, any other token extends/starts one
        # (decoder.py:265: strip specials -> collapse spaces -> split())
        words = gather_bw(words)
        in_word = gather_bw(in_word)
        is_special = ((next_tok == PAD_ID) | (next_tok == SOS_ID)
                      | (next_tok == EOS_ID))
        is_space = next_tok == space_id
        is_char = ~is_special & ~is_space
        words = words + (is_char & ~in_word).astype(jnp.int32)
        in_word = jnp.where(is_char, True, jnp.where(is_space, False,
                                                     in_word))

        # EOS selections retire into the bank and their slot dies — the
        # reference's shrinking hyps -> ended_hyps move (decoder.py:257-276)
        is_eos = next_tok == EOS_ID
        retire_raw = jnp.where(is_eos, top_scores, 2 * NEG_INF)
        retire_keys = jnp.where(is_eos, final_key(top_scores, words),
                                2 * NEG_INF)
        bank = bank_insert(
            bank, (retire_keys, retire_raw, words, tokens,
                   jnp.full((b, w), t + 1, jnp.int32)),
        )

        new_scores = jnp.where(is_eos, NEG_INF, top_scores)

        # reorder caches: cache leaves are [B*W, T, H, D]
        flat_src = (jnp.arange(b)[:, None] * w + src_beam).reshape(-1)
        caches = jax.tree.map(
            lambda x: x[flat_src], caches,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        return (t + 1, next_tok.reshape(-1), caches, new_scores, tokens,
                words, in_word, bank)

    def cond(state):
        t, _, _, scores, *_ = state
        return (t < max_steps) & jnp.any(scores > NEG_INF / 2)

    bank0 = (bank_keys0, bank_scores0, bank_words0, bank_tokens0, bank_len0)
    state = (jnp.int32(0), y0, caches0, scores0, tokens0, words0, in_word0,
             bank0)
    (t_end, _, _, scores, tokens, words, _, bank) = jax.lax.while_loop(
        cond, body, state)

    # horizon retirement: survivors get EOS appended (the reference's
    # force-append, decoder.py:253-255)
    live = scores > NEG_INF / 2
    retire_raw = jnp.where(live, scores, 2 * NEG_INF)
    retire_keys = jnp.where(live, final_key(scores, words), 2 * NEG_INF)
    tokens = jax.vmap(
        lambda tk, tt: tk.at[:, tt].set(EOS_ID), in_axes=(0, None)
    )(tokens, t_end)
    (_, bank_scores, bank_words, bank_tokens, bank_len) = bank_insert(
        bank, (retire_keys, retire_raw, words, tokens,
               jnp.full((b, w), 0, jnp.int32) + t_end + 1),
    )
    return bank_tokens, bank_scores, bank_words, bank_len


def beam_search(
    model: ASRTransformer,
    params,
    features,
    input_lengths,
    vocab: Vocab,
    beam_width: int = 3,
    nbest: int = 5,
    max_steps: int = 300,
    start_token: int = 1,
    c_weight: float = 0.1,
    lm=None,
    lm_rescoring: bool = False,
    lm_weight: float = 0.1,
) -> Tuple[List[List[int]], List[str]]:
    """Host-side final ranking with the reference's final_score formula;
    returns (nbest id lists, nbest strings) flattened over the batch (the
    reference appends all utterances' nbests into flat lists,
    decoder.py:286-291)."""
    grouped = beam_search_grouped(
        model, params, features, input_lengths, vocab, beam_width, nbest,
        max_steps, start_token, c_weight, lm, lm_rescoring, lm_weight,
    )
    batch_ids_nbest, batch_strs_nbest = [], []
    for hyps in grouped:
        for final, ids, s in hyps:
            batch_ids_nbest.append([start_token] + ids)
            batch_strs_nbest.append(s)
    return batch_ids_nbest, batch_strs_nbest


def _ref_num_words(ids, vocab: Vocab) -> int:
    """The reference's num_words for the length bonus (decoder.py:265):
    strip ONLY PAD/SOS/EOS token strings (OOV stays), collapse double
    spaces, split on whitespace."""
    raw = "".join(vocab.id2label[int(i)] for i in ids)
    for tok in (PAD_TOKEN, SOS_TOKEN, EOS_TOKEN):
        raw = raw.replace(tok, "")
    return len(raw.replace("  ", " ").split())


def beam_search_grouped(
    model: ASRTransformer,
    params,
    features,
    input_lengths,
    vocab: Vocab,
    beam_width: int = 3,
    nbest: int = 5,
    max_steps: int = 300,
    start_token: int = 1,
    c_weight: float = 0.1,
    lm=None,
    lm_rescoring: bool = False,
    lm_weight: float = 0.1,
) -> List[List[Tuple[float, List[int], str]]]:
    """Per-utterance n-best lists [(final_score, ids, string), ...] sorted
    best-first (the structured form of the reference's flat nbest append,
    modules/decoder.py:286-291 — test.py needs per-utterance grouping to
    align hyps with golds when nbest > 1)."""
    # under LM rescoring the device bank ranks by final-sans-LM — widen it
    # so the LM reranking sees enough candidates
    n_bank = max(nbest, beam_width) * (4 if lm_rescoring else 1)
    tokens, scores, words, lengths = beam_decode_ids(
        model, params, features, input_lengths, beam_width, max_steps,
        start_token, n_bank, vocab.label2id.get(" ", -1),
        jnp.asarray(c_weight, jnp.float32),
    )
    tokens = np.asarray(tokens)
    scores = np.asarray(scores)
    lengths = np.asarray(lengths)
    b, w, _ = tokens.shape

    grouped: List[List[Tuple[float, List[int], str]]] = []
    for x in range(b):
        hyps = []
        for j in range(w):
            if scores[x, j] <= NEG_INF / 2:
                continue  # empty bank slot
            ids = tokens[x, j, : lengths[x, j]].tolist()
            raw = "".join(vocab.id2label[int(i)] for i in ids)
            # exact post_process_hyp semantics (decoder.py:117-128): strip
            # specials + "▁"->" ", NO double-space collapse
            s = post_process(raw, vocab.special_token_list)
            if lm_rescoring and lm is not None:
                lm_score, num_words, oov = lm.score_ids(
                    [start_token] + ids, vocab
                )
                final = (scores[x, j] + lm_weight * (lm_score - 2 * oov)
                         + math.sqrt(max(num_words, 0)) * c_weight)
            else:
                num_words = _ref_num_words(ids, vocab)
                final = scores[x, j] + math.sqrt(num_words) * c_weight
            hyps.append((float(final), ids, s))
        hyps.sort(key=lambda h: h[0], reverse=True)
        grouped.append(hyps[: min(len(hyps), nbest)])
    return grouped
