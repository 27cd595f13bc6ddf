"""On-device Levenshtein vs the host (C++/numpy) implementation."""

import jax.numpy as jnp
import numpy as np

from mtl_tpu.data.vocab import EOS_ID, PAD_ID, SOS_ID, Vocab, post_process
from mtl_tpu.ops.edit_distance_jax import (
    compact_ids,
    device_cer,
    edit_distance_device,
)
from mtl_tpu.utils.edit_distance import distance


def test_device_distance_matches_host():
    rng = np.random.RandomState(0)
    B, L1, L2 = 8, 12, 10
    hyp = rng.randint(4, 9, size=(B, L1)).astype(np.int32)
    gold = rng.randint(4, 9, size=(B, L2)).astype(np.int32)
    hyp_len = rng.randint(0, L1 + 1, size=B).astype(np.int32)
    gold_len = rng.randint(0, L2 + 1, size=B).astype(np.int32)
    d = np.asarray(edit_distance_device(jnp.asarray(hyp), jnp.asarray(hyp_len),
                                        jnp.asarray(gold),
                                        jnp.asarray(gold_len)))
    for b in range(B):
        s1 = "".join(chr(x) for x in hyp[b, : hyp_len[b]])
        s2 = "".join(chr(x) for x in gold[b, : gold_len[b]])
        assert d[b] == distance(s1, s2), (b, s1, s2, d[b])


def test_compact_ids():
    toks = jnp.asarray([[1, 4, 0, 5, 2, 0], [4, 4, 0, 0, 0, 0]])
    out, lens = compact_ids(toks, [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(lens), [2, 2])
    np.testing.assert_array_equal(np.asarray(out[0, :2]), [4, 5])
    np.testing.assert_array_equal(np.asarray(out[1, :2]), [4, 4])
    np.testing.assert_array_equal(np.asarray(out[:, 2:]), 0)


def test_device_cer_matches_host_train_cer():
    """device_cer == the trainers' host CER (post_process + strip spaces)."""
    labels = ["<PAD>", "<SOS>", "<EOS>", "<OOV>", "a", "b", "c", " "]
    vocab = Vocab.from_labels(labels)
    space = vocab.label2id[" "]
    rng = np.random.RandomState(1)
    B, L = 6, 9
    hyp = rng.randint(0, 8, size=(B, L)).astype(np.int32)
    gold = rng.randint(0, 8, size=(B, L)).astype(np.int32)

    total_d, total_c = device_cer(jnp.asarray(hyp), jnp.asarray(gold),
                                  space_id=space)

    host_d = host_c = 0
    for b in range(B):
        hs = post_process(vocab.decode_ids(hyp[b]), vocab.special_token_list)
        gs = post_process(vocab.decode_ids(gold[b]), vocab.special_token_list)
        host_d += distance(hs.replace(" ", ""), gs.replace(" ", ""))
        host_c += len(gs.replace(" ", ""))
    assert int(total_d) == host_d
    assert int(total_c) == host_c
