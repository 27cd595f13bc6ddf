"""Decoding tests: greedy vs brute-force re-forward, beam vs greedy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtl_tpu.data.vocab import EOS_ID, SOS_ID, Vocab
from mtl_tpu.decode.beam import beam_decode_ids, beam_search
from mtl_tpu.decode.greedy import greedy_decode_ids, ids_to_strings
from mtl_tpu.models.transformer import ASRTransformer


@pytest.fixture(scope="module")
def setup():
    model = ASRTransformer(
        vocab_size=12, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    b, t, f = 2, 8, 12
    feats = jax.random.normal(jax.random.PRNGKey(2), (b, t, f)) * 0.5
    lengths = jnp.array([t, t])
    params = model.init(jax.random.PRNGKey(0), feats, lengths,
                        jnp.zeros((b, 3), jnp.int32))
    return model, params, feats, lengths


def test_greedy_matches_bruteforce_reforward(setup):
    """KV-cache greedy == the reference's full-prefix re-forward greedy."""
    model, params, feats, lengths = setup
    max_steps = 6
    ids = np.asarray(greedy_decode_ids(model, params, feats, lengths,
                                       max_steps, SOS_ID, False))
    # early-exit variant must agree after cutting at first EOS
    ids_ee = np.asarray(greedy_decode_ids(model, params, feats, lengths,
                                          max_steps, SOS_ID, True))
    from mtl_tpu.data.vocab import Vocab
    v = Vocab.from_labels(["<PAD>", "<SOS>", "<EOS>", "<OOV>"] + list("abcdefgh"))
    assert ids_to_strings(ids, v) == ids_to_strings(ids_ee, v)

    # brute force: full-prefix re-forward with the reference greedy's masks
    # (non_pad all ones, subsequent-only self mask, NO dec-enc mask —
    # modules/decoder.py:148-161)
    from mtl_tpu.ops.masks import subsequent_mask

    enc, _ = model.apply(params, feats, lengths,
                         method=ASRTransformer.prepare_decode)

    def reforward(m, seq, enc_out):
        b_, l_ = seq.shape
        npm = jnp.ones((b_, l_, 1))
        sam = jnp.broadcast_to(subsequent_mask(l_)[None], (b_, l_, l_))
        h = m.decoder._embed(seq)
        for layer in m.decoder.layers:
            h = layer(h, enc_out, npm, sam, None, True)
        return m.decoder.output_linear(h).astype(jnp.float32)

    b = feats.shape[0]
    ys = np.full((b, 1), SOS_ID, np.int32)
    for t in range(max_steps):
        logits = model.apply(params, jnp.asarray(ys), enc, method=reforward)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))[:, None]
        ys = np.concatenate([ys, nxt.astype(np.int32)], axis=1)
    np.testing.assert_array_equal(ids[:, :max_steps], ys[:, 1:])


def test_beam_width1_equals_greedy(setup):
    """Width-1 beam == greedy until the first EOS (incl. the horizon
    force-retirement when EOS never wins)."""
    model, params, feats, lengths = setup
    max_steps = 6
    g = np.asarray(greedy_decode_ids(model, params, feats, lengths,
                                     max_steps, SOS_ID, False))
    tokens, scores, _words, blen = beam_decode_ids(model, params, feats,
                                                   lengths, 1, max_steps,
                                                   SOS_ID)
    tokens = np.asarray(tokens)
    blen = np.asarray(blen)
    for x in range(g.shape[0]):
        best = tokens[x, 0, : blen[x, 0]]
        assert best[-1] == EOS_ID
        for a, b_ in zip(g[x], best):
            np.testing.assert_array_equal(a, b_)
            if a == EOS_ID:
                break


def test_beam_bank_sorted_and_finite(setup):
    model, params, feats, lengths = setup
    tokens, scores, _words, blen = beam_decode_ids(model, params, feats,
                                                   lengths, 3, 6, SOS_ID)
    s = np.asarray(scores)
    assert s.shape[0] == 2
    assert (np.diff(s, axis=1) <= 1e-5).all()  # sorted desc
    assert np.isfinite(s[:, 0]).all() and (s[:, 0] > -1e8).all()
    # every real bank entry ends with EOS at length-1
    blen = np.asarray(blen)
    tokens = np.asarray(tokens)
    for x in range(s.shape[0]):
        for j in range(s.shape[1]):
            if s[x, j] > -1e8:
                assert tokens[x, j, blen[x, j] - 1] == EOS_ID


def test_beam_search_host_ranking(setup):
    model, params, feats, lengths = setup
    labels = ["<PAD>", "<SOS>", "<EOS>", "<OOV>"] + list("abcd efg")
    vocab = Vocab.from_labels(labels)
    ids, strs = beam_search(model, params, feats, lengths, vocab,
                            beam_width=2, nbest=2, max_steps=6,
                            start_token=SOS_ID, c_weight=0.1)
    assert len(ids) == len(strs) == 4  # 2 utts x nbest 2
    assert all(row[0] == SOS_ID for row in ids)
