"""Model shape / mask / semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtl_tpu.data.vocab import EOS_ID, PAD_ID, SOS_ID, Vocab
from mtl_tpu.models.layers import sinusoid_table
from mtl_tpu.models.subsampler import subsampled_freq, subsampled_length
from mtl_tpu.models.transformer import ASRTransformer
from mtl_tpu.ops import masks
from mtl_tpu.ops.targets import make_teacher_forcing


def tiny_model(vocab_size=20, **kw):
    defaults = dict(
        vocab_size=vocab_size, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    defaults.update(kw)
    return ASRTransformer(**defaults)


def test_positional_encoding_matches_formula():
    pe = sinusoid_table(50, 8)[0]
    pos, i = 7, 2
    expected_sin = np.sin(pos * np.exp(2 * i * -(np.log(10000.0) / 8)))
    np.testing.assert_allclose(pe[pos, 2 * i], expected_sin, rtol=1e-5)
    expected_cos = np.cos(pos * np.exp(2 * i * -(np.log(10000.0) / 8)))
    np.testing.assert_allclose(pe[pos, 2 * i + 1], expected_cos, rtol=1e-5)


def test_masks():
    lengths = jnp.array([3, 5])
    npm = masks.non_pad_mask_from_lengths(lengths, 5)
    assert npm.shape == (2, 5, 1)
    np.testing.assert_array_equal(npm[0, :, 0], [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(npm[1, :, 0], [1, 1, 1, 1, 1])

    apm = masks.attn_pad_mask_from_lengths(lengths, 5, 4)
    assert apm.shape == (2, 4, 5)
    np.testing.assert_array_equal(apm[0, 0], [False, False, False, True, True])

    sm = masks.subsequent_mask(3)
    np.testing.assert_array_equal(
        sm, [[False, True, True], [False, False, True], [False, False, False]]
    )

    # reference quirk: lengths beyond T behave as "all valid"
    npm2 = masks.non_pad_mask_from_lengths(jnp.array([100]), 5)
    np.testing.assert_array_equal(npm2[0, :, 0], [1, 1, 1, 1, 1])


def test_teacher_forcing_construction():
    targets = jnp.array([[5, 6, 7, PAD_ID], [8, PAD_ID, PAD_ID, PAD_ID]])
    seq_in, seq_out = make_teacher_forcing(targets)
    np.testing.assert_array_equal(
        seq_in, [[SOS_ID, 5, 6, 7, EOS_ID], [SOS_ID, 8, EOS_ID, EOS_ID, EOS_ID]]
    )
    np.testing.assert_array_equal(
        seq_out, [[5, 6, 7, EOS_ID, PAD_ID], [8, EOS_ID, PAD_ID, PAD_ID, PAD_ID]]
    )


def test_subsampled_dims():
    # vgg at 16 kHz / 20 ms: 161 freq -> 40; dim_input 5120
    assert subsampled_freq("vgg_cnn", 161) == 40
    assert int(subsampled_length("vgg_cnn", jnp.array(161))) == 40
    assert subsampled_freq("large_cnn", 161) == 40
    # emb_cnn arithmetic (utils/functions.py:311-316)
    assert subsampled_freq("emb_cnn", 161) == ((161 - 41) // 2 + 1 - 21) // 2 + 1


def test_forward_shapes_and_finiteness():
    model = tiny_model()
    B, T, F, L = 2, 16, 12, 6
    feats = jnp.ones((B, T, F)) * 0.1
    lengths = jnp.array([16, 8])
    targets = jnp.array([[5, 6, 7, 0, 0, 0], [8, 9, 0, 0, 0, 0]])
    seq_in, seq_out = make_teacher_forcing(targets)
    params = model.init(jax.random.PRNGKey(0), feats, lengths, seq_in)
    logits = model.apply(params, feats, lengths, seq_in)
    assert logits.shape == (B, L + 1, 20)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_encoder_masked_positions_zeroed():
    """Encoder layers multiply by non_pad_mask: output positions at or beyond
    the (raw) length index must be exactly zero (encoder.py:101-104 parity).

    Note the reference quirk is preserved: masking uses RAW lengths against
    downsampled time, so only lengths < T' produce any masking at all.
    """
    model = tiny_model()
    B, T, F = 1, 16, 12
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    lengths = jnp.array([2])  # < downsampled T' = 4 -> positions 2,3 masked
    params = model.init(jax.random.PRNGKey(0), feats, lengths,
                        jnp.zeros((B, 3), jnp.int32))
    enc = model.apply(params, feats, lengths, deterministic=True,
                      method=ASRTransformer.encode)
    assert enc.shape[1] == 4
    np.testing.assert_array_equal(np.asarray(enc[:, 2:]), 0.0)
    assert bool(jnp.any(enc[:, :2] != 0.0))


def test_decoder_causality():
    """Changing future target tokens must not change past logits."""
    model = tiny_model()
    B, T, F = 1, 8, 12
    feats = jnp.ones((B, T, F)) * 0.3
    lengths = jnp.array([8])
    seq_in = jnp.array([[SOS_ID, 5, 6, 7]])
    params = model.init(jax.random.PRNGKey(0), feats, lengths, seq_in)
    l1 = model.apply(params, feats, lengths, seq_in)
    seq_in2 = jnp.array([[SOS_ID, 5, 9, 9]])  # change positions 2,3
    l2 = model.apply(params, feats, lengths, seq_in2)
    np.testing.assert_allclose(l1[:, :2], l2[:, :2], atol=1e-5)


def test_kv_cache_decode_matches_teacher_forcing():
    """Incremental decode_step logits == full-forward logits on same prefix
    (with no dec-enc mask, matching the reference search paths)."""
    model = tiny_model(num_dec_layers=2)
    B, T, F = 2, 8, 12
    rng = jax.random.PRNGKey(3)
    feats = jax.random.normal(rng, (B, T, F)) * 0.2
    lengths = jnp.array([8, 8])  # full length => dec-enc mask all-valid
    tokens = jnp.array([[SOS_ID, 5, 6, 7], [SOS_ID, 9, 4, 11]])
    params = model.init(jax.random.PRNGKey(0), feats, lengths, tokens)

    full_logits = model.apply(params, feats, lengths, tokens)  # B x 4 x V

    enc, enc_kvs = model.apply(params, feats, lengths,
                               method=ASRTransformer.prepare_decode)
    caches = model.apply(params, B, 4, method=ASRTransformer.init_cache)
    step_logits = []
    for t in range(4):
        logits_t, caches = model.apply(
            params, tokens[:, t], t, enc_kvs, caches,
            method=ASRTransformer.decode_step,
        )
        step_logits.append(logits_t)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, full_logits, atol=2e-4, rtol=1e-3)


def test_vocab():
    v = Vocab.from_labels(["<PAD>", "<SOS>", "<EOS>", "<OOV>", "a", "b", " "])
    assert v.PAD_ID == 0 and v.SOS_ID == 1 and v.EOS_ID == 2 and v.OOV_ID == 3
    assert len(v) == 7
    assert v.encode_transcript("ab") == [4, 5]
    assert v.encode_transcript("axb") == [4, 5]  # OOV silently dropped
    assert v.decode_ids([4, 6, 5]) == "a b"
