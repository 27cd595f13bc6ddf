"""Cross-framework numerical parity vs the actual PyTorch reference.

These tests import the reference modules from /root/reference (read-only,
torch CPU), transplant mtl_tpu Flax parameters into the reference model, and
assert that on the same inputs:

* teacher-forced logits match (models/asr/transformer.py:120-149),
* CE loss (plain + label-smoothed) and num_correct match
  (utils/metrics.py:68-126),
* greedy decode strings match (modules/decoder.py:131-184),
* the conv feature extractors match (models/asr/transformer.py:38-72),
* CTC loss matches at the loss level (utils/metrics.py:127-148).

This converts the docstring parity claims into executed evidence. The only
deliberate divergences, handled explicitly here:

* conv feature flattening order — the reference flattens channel-major
  (models/asr/transformer.py:93), mtl_tpu freq-major; a fixed permutation of
  the encoder input-projection rows absorbs it (see ``_conv_feat_perm``).
* torch ``nn.Embedding(padding_idx=0)``'s PAD row is re-randomized by the
  reference's blanket xavier re-init (models/asr/transformer.py:74-76) while
  mtl_tpu zeroes the PAD row at call time; the transplant zeroes the torch
  PAD row so both compute the same function (PAD never appears in
  teacher-forcing inputs, so this only affects pathological decode paths).
"""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference"


# --------------------------------------------------------------------------
# Reference import plumbing
# --------------------------------------------------------------------------

from mtl_tpu.parity.torch_ref import (  # noqa: E402
    _t,
    conv_feat_perm as _conv_feat_perm,
    flax_to_torch_state,
    load_reference,
)


@pytest.fixture(scope="module")
def ref():
    return load_reference(REF_PATH)


# --------------------------------------------------------------------------
# Tiny shared configuration
# --------------------------------------------------------------------------

LABELS = list("abcdefgh")  # vocab ids 4..11; V = 12
V = 4 + len(LABELS)
F_BINS = 8           # spectrogram freq bins; vgg -> F'=2, C=128, dim_input=256
T_FRAMES = 20        # vgg -> T'=5
DIMS = dict(num_enc_layers=2, num_dec_layers=2, num_heads=2, dim_model=16,
            dim_key=8, dim_value=8, dim_inner=16, dim_emb=16, r=4)
# TGT_MAX > 300: the reference greedy loop always runs 300 steps
# (modules/decoder.py:145) and indexes the PE table up to 301 positions
SRC_MAX, TGT_MAX = 64, 320


def _vocabs(ref):
    rv = ref.Vocab()
    for c in LABELS:
        rv.add_label(c)
    from mtl_tpu.data.vocab import Vocab

    mv = Vocab()
    for c in LABELS:
        mv.add_label(c)
    assert rv.id2label == mv.id2label
    return rv, mv


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(3, T_FRAMES, F_BINS).astype(np.float32)
    # raw (un-downsampled) lengths; 3 < T'=5 exercises the encoder mask quirk
    lengths = np.array([20, 15, 3], np.int32)
    targets = np.zeros((3, 6), np.int64)
    for i, n in enumerate([6, 4, 2]):
        targets[i, :n] = rng.randint(4, V, size=n)
    return feats, lengths, targets


# --------------------------------------------------------------------------
# Model pair construction
# --------------------------------------------------------------------------

def build_pair(ref, is_factorized: bool):
    import jax
    import jax.numpy as jnp

    from mtl_tpu.models.transformer import ASRTransformer

    rv, mv = _vocabs(ref)
    dim_input = (F_BINS // 4) * 128

    model = ASRTransformer(
        vocab_size=V, feat_extractor="vgg_cnn", dim_input=dim_input,
        dropout=0.0, src_max_length=SRC_MAX, trg_max_length=TGT_MAX,
        is_factorized=is_factorized, dtype=jnp.float32, **DIMS,
    )
    feats, lengths, targets = _batch()
    from mtl_tpu.ops.targets import make_teacher_forcing

    seq_in, _ = make_teacher_forcing(jnp.asarray(targets))
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(feats),
                        jnp.asarray(lengths), seq_in)

    torch_enc = ref.Encoder(
        DIMS["num_enc_layers"], DIMS["num_heads"], DIMS["dim_model"],
        DIMS["dim_key"], DIMS["dim_value"], dim_input, DIMS["dim_inner"],
        dropout=0.0, src_max_length=SRC_MAX,
        is_factorized=is_factorized, r=DIMS["r"],
    )
    torch_dec = ref.Decoder(
        rv, DIMS["num_dec_layers"], DIMS["num_heads"], DIMS["dim_emb"],
        DIMS["dim_model"], DIMS["dim_inner"], DIMS["dim_key"],
        DIMS["dim_value"], dropout=0.0, trg_max_length=TGT_MAX,
        is_factorized=is_factorized, r=DIMS["r"],
    )
    torch_model = ref.Transformer(torch_enc, torch_dec, rv,
                                  feat_extractor="vgg_cnn",
                                  is_factorized=is_factorized, r=DIMS["r"])
    sd = flax_to_torch_state(params, f_prime=F_BINS // 4, channels=128)
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    # only buffers (positional-encoding tables) may be absent from the
    # transplant; any missing *parameter* would silently break parity
    assert not unexpected, unexpected
    leftover = [k for k in missing if not k.endswith("positional_encoding.pe")]
    assert not leftover, leftover
    torch_model.eval()
    return model, params, torch_model, rv, mv


def _ref_forward(torch_model, feats, lengths, targets):
    x = torch.from_numpy(feats).permute(0, 2, 1)[:, None]  # B x 1 x F x T
    with torch.no_grad():
        pred, gold, hyp = torch_model(
            x, torch.from_numpy(lengths.astype(np.int64)),
            torch.from_numpy(targets),
        )
    return pred, gold


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pair(ref):
    return build_pair(ref, is_factorized=True)


@pytest.fixture(scope="module")
def pair_unfact(ref):
    return build_pair(ref, is_factorized=False)


@pytest.mark.parametrize("which", ["factorized", "unfactorized"])
def test_teacher_forced_logits_parity(pair, pair_unfact, which):
    import jax.numpy as jnp

    from mtl_tpu.ops.targets import make_teacher_forcing

    model, params, torch_model, rv, mv = (
        pair if which == "factorized" else pair_unfact
    )
    feats, lengths, targets = _batch()
    pred, gold = _ref_forward(torch_model, feats, lengths, targets)

    seq_in, seq_out = make_teacher_forcing(jnp.asarray(targets))
    logits = model.apply(params, jnp.asarray(feats), jnp.asarray(lengths),
                         seq_in)

    np.testing.assert_array_equal(np.asarray(seq_out), gold.numpy())
    np.testing.assert_allclose(np.asarray(logits), pred.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_ce_loss_parity(pair, ref):
    import jax.numpy as jnp

    from mtl_tpu.ops.targets import make_teacher_forcing
    from mtl_tpu.train.losses import ce_loss

    model, params, torch_model, rv, mv = pair
    feats, lengths, targets = _batch()
    pred, gold = _ref_forward(torch_model, feats, lengths, targets)

    seq_in, seq_out = make_teacher_forcing(jnp.asarray(targets))
    logits = model.apply(params, jnp.asarray(feats), jnp.asarray(lengths),
                         seq_in)

    ref_loss, ref_correct = ref.metrics.calculate_metrics(
        pred, gold.clone(), pad_id=0, smoothing=0.0, loss_type="ce"
    )
    loss, correct = ce_loss(logits, seq_out, smoothing=0.0)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    assert int(correct) == int(ref_correct)

    # Label smoothing: the reference's smoothed path has a latent shape bug
    # for B>1 (utils/metrics.py:117 multiplies a B x T mask with a flattened
    # (B*T,) gold; only broadcastable at B=1), so smoothed parity is checked
    # per-row — mtl_tpu's vectorized version must equal the reference on
    # each single-utterance batch.
    for i in range(pred.shape[0]):
        ref_loss, _ = ref.metrics.calculate_metrics(
            pred[i:i + 1], gold[i:i + 1].clone(), pad_id=0, smoothing=0.1,
            loss_type="ce",
        )
        loss, _ = ce_loss(logits[i:i + 1], seq_out[i:i + 1], smoothing=0.1)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5,
                                   err_msg=f"row {i}")


def test_greedy_decode_parity(pair):
    import jax.numpy as jnp

    from mtl_tpu.data.vocab import SOS_ID
    from mtl_tpu.decode.greedy import greedy_search

    model, params, torch_model, rv, mv = pair
    feats, lengths, targets = _batch()

    x = torch.from_numpy(feats).permute(0, 2, 1)[:, None]
    with torch.no_grad():
        enc = torch_model.encode(x, torch.from_numpy(lengths.astype(np.int64)))
        args = types.SimpleNamespace(cuda=False)
        ref_strs = torch_model.decoder.greedy_search(
            enc, args, start_token=SOS_ID
        )

    strs = greedy_search(model, params, jnp.asarray(feats),
                         jnp.asarray(lengths), mv, max_steps=300,
                         start_token=SOS_ID)
    assert strs == ref_strs


@pytest.mark.parametrize("extractor,channels,conv_indices", [
    ("vgg_cnn", 128, (0, 2, 5, 7)),
    ("large_cnn", 64, (0, 2, 5, 7)),
])
def test_conv_extractor_parity(ref, extractor, channels, conv_indices):
    import jax
    import jax.numpy as jnp

    from mtl_tpu.models.subsampler import FeatureExtractor

    rv, _ = _vocabs(ref)
    fx = FeatureExtractor(extractor, dtype=jnp.float32)
    feats = np.random.RandomState(1).randn(2, T_FRAMES, F_BINS).astype(
        np.float32
    )
    params = fx.init(jax.random.PRNGKey(3), jnp.asarray(feats))
    out = np.asarray(fx.apply(params, jnp.asarray(feats)))  # B,T',F'*C

    # tiny torch Transformer just for its conv stack
    enc = ref.Encoder(1, 1, 8, 8, 8, out.shape[-1], 8, dropout=0.0)
    dec = ref.Decoder(rv, 1, 1, 8, 8, 8, 8, 8, dropout=0.0)
    tm = ref.Transformer(enc, dec, rv, feat_extractor=extractor)
    sd = {}
    for flax_i, torch_i in enumerate(conv_indices):
        leaf = params["params"]["conv"][f"Conv_{flax_i}"]
        sd[f"conv.{torch_i}.weight"] = _t(
            np.transpose(np.asarray(leaf["kernel"], np.float32), (3, 2, 0, 1))
        )
        sd[f"conv.{torch_i}.bias"] = _t(leaf["bias"])
    tm.load_state_dict(sd, strict=False)
    tm.eval()
    with torch.no_grad():
        tx = tm.conv(torch.from_numpy(feats).permute(0, 2, 1)[:, None])
    # torch: B x C x F' x T' channel-major flatten (transformer.py:93)
    b, c, fp, tp = tx.shape
    tref = tx.reshape(b, c * fp, tp).permute(0, 2, 1).numpy()
    # ours is freq-major: apply the fixed permutation to compare
    perm = _conv_feat_perm(fp, c)
    np.testing.assert_allclose(out[..., :][:, :, perm], tref,
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Beam-search parity (VERDICT r2 #2)
# --------------------------------------------------------------------------

# a vocab WITH a space label so hypotheses have varying word counts (the
# length bonus sqrt(num_words)*c_weight must discriminate)
LABELS_SP = list("abc defg")


def build_pair_labels(ref, labels, seed=11):
    """build_pair with a custom label set (module-global LABELS elsewhere)."""
    import jax
    import jax.numpy as jnp

    from mtl_tpu.data.vocab import Vocab
    from mtl_tpu.models.transformer import ASRTransformer
    from mtl_tpu.ops.targets import make_teacher_forcing

    rv = ref.Vocab()
    mv = Vocab()
    for c in labels:
        rv.add_label(c)
        mv.add_label(c)
    v = 4 + len(labels)
    dim_input = (F_BINS // 4) * 128
    model = ASRTransformer(
        vocab_size=v, feat_extractor="vgg_cnn", dim_input=dim_input,
        dropout=0.0, src_max_length=SRC_MAX, trg_max_length=TGT_MAX,
        is_factorized=False, dtype=jnp.float32, **DIMS,
    )
    feats, lengths, _ = _batch()
    targets = np.random.RandomState(seed).randint(4, v, size=(3, 6))
    seq_in, _ = make_teacher_forcing(jnp.asarray(targets))
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(feats),
                        jnp.asarray(lengths), seq_in)

    torch_enc = ref.Encoder(
        DIMS["num_enc_layers"], DIMS["num_heads"], DIMS["dim_model"],
        DIMS["dim_key"], DIMS["dim_value"], dim_input, DIMS["dim_inner"],
        dropout=0.0, src_max_length=SRC_MAX, is_factorized=False, r=DIMS["r"],
    )
    torch_dec = ref.Decoder(
        rv, DIMS["num_dec_layers"], DIMS["num_heads"], DIMS["dim_emb"],
        DIMS["dim_model"], DIMS["dim_inner"], DIMS["dim_key"],
        DIMS["dim_value"], dropout=0.0, trg_max_length=TGT_MAX,
        is_factorized=False, r=DIMS["r"],
    )
    torch_model = ref.Transformer(torch_enc, torch_dec, rv,
                                  feat_extractor="vgg_cnn",
                                  is_factorized=False, r=DIMS["r"])
    sd = flax_to_torch_state(params, f_prime=F_BINS // 4, channels=128)
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    leftover = [k for k in missing if not k.endswith("positional_encoding.pe")]
    assert not leftover, leftover
    torch_model.eval()
    return model, params, torch_model, rv, mv


@pytest.fixture(scope="module")
def pair_space(ref):
    return build_pair_labels(ref, LABELS_SP)


def _ref_beam(torch_model, feats, lengths, beam_width, nbest, c_weight,
              lm=None, lm_weight=0.1, start_token=1):
    x = torch.from_numpy(feats).permute(0, 2, 1)[:, None]
    with torch.no_grad():
        enc = torch_model.encode(
            x, torch.from_numpy(lengths.astype(np.int64)))
        args = types.SimpleNamespace(cuda=False, tgt_max_len=300)
        ids, strs = torch_model.decoder.beam_search(
            enc, args, beam_width=beam_width, nbest=nbest,
            lm_rescoring=lm is not None, lm=lm, lm_weight=lm_weight,
            c_weight=c_weight, start_token=start_token,
        )
    return enc.shape[1], ids, strs


def _strip_specials(ids):
    """SOS/EOS/PAD off both ends for sequence comparison (the reference
    returns SOS + tokens + EOS(+EOS when forced), ours tokens + EOS)."""
    return [int(i) for i in ids if int(i) not in (0, 1, 2)]


@pytest.mark.parametrize("beam_width,nbest,c_weight", [
    (3, 3, 0.1),
    (8, 4, 0.1),
    (3, 3, 5.0),   # stress: large length bonus — final-score ranking must
                   # reorder long vs short hyps identically (bank cannot
                   # evict a post-rescoring winner; VERDICT r2 weak #3)
])
def test_beam_search_parity(pair_space, beam_width, nbest, c_weight):
    import jax.numpy as jnp

    from mtl_tpu.data.vocab import SOS_ID
    from mtl_tpu.decode.beam import beam_search_grouped

    model, params, torch_model, rv, mv = pair_space
    feats, lengths, _ = _batch()

    t_enc, ref_ids, ref_strs = _ref_beam(torch_model, feats, lengths,
                                         beam_width, nbest, c_weight,
                                         start_token=SOS_ID)

    grouped = beam_search_grouped(
        model, params, jnp.asarray(feats), jnp.asarray(lengths), mv,
        beam_width=beam_width, nbest=nbest, max_steps=t_enc,
        start_token=SOS_ID, c_weight=c_weight,
    )
    flat_strs = [s for hyps in grouped for (_, _, s) in hyps]
    flat_ids = [ids for hyps in grouped for (_, ids, _) in hyps]
    assert len(ref_strs) == len(flat_strs) == len(feats) * nbest
    assert flat_strs == ref_strs
    for ours, theirs in zip(flat_ids, ref_ids):
        assert _strip_specials(ours) == _strip_specials(theirs)


def test_beam_search_parity_with_lm_fusion(pair_space, tmp_path):
    """Beam + LM shallow-fusion parity: the same tiny LSTM LM transplanted
    to both sides (utils/lm.py:8-40 vs lm/fusion.py), identical n-best
    rankings (modules/decoder.py:261-270)."""
    import jax
    import jax.numpy as jnp

    from mtl_tpu.data.vocab import SOS_ID
    from mtl_tpu.decode.beam import beam_search_grouped
    from mtl_tpu.lm.fusion import LMScorer, save_lm_fusion
    from mtl_tpu.lm.model import RNNLM
    from mtl_tpu.parity.torch_ref import save_torch_lm_checkpoint

    model, params, torch_model, rv, mv = pair_space
    feats, lengths, _ = _batch()

    # tiny word LM over the words the beam can emit
    words = ["abc", "defg", "ab", "a", "b", "c", "<oov>", "<eos>"]
    word2idx = {w: i for i, w in enumerate(words)}
    arch = dict(rnn_type="LSTM", ntoken=len(words), ninp=6, nhid=6,
                nlayers=2, dropout=0.0, tie_weights=False)
    lm_model = RNNLM(**arch)
    lm_params = lm_model.init(jax.random.PRNGKey(3),
                              jnp.zeros((2, 1), jnp.int32))
    fusion_dir = str(tmp_path / "lm_fusion")
    save_lm_fusion(fusion_dir, lm_params, word2idx, arch)
    scorer = LMScorer.load(fusion_dir)

    ckpt = save_torch_lm_checkpoint(str(tmp_path / "lm.pt"), lm_params,
                                    word2idx, arch)
    import importlib

    ref_lm_mod = importlib.import_module("utils.lm")
    torch_lm = ref_lm_mod.LM(ckpt, types.SimpleNamespace(cuda=False))

    # sanity: both scorers agree on a raw word sequence
    s_ours = scorer.evaluate("abc defg a")[0]
    s_ref = float(torch_lm.evaluate("abc defg a")[0])
    np.testing.assert_allclose(s_ours, s_ref, rtol=1e-5)

    beam_width, nbest, c_weight, lm_weight = 4, 3, 0.5, 0.5
    t_enc, ref_ids, ref_strs = _ref_beam(
        torch_model, feats, lengths, beam_width, nbest, c_weight,
        lm=torch_lm, lm_weight=lm_weight, start_token=SOS_ID,
    )
    grouped = beam_search_grouped(
        model, params, jnp.asarray(feats), jnp.asarray(lengths), mv,
        beam_width=beam_width, nbest=nbest, max_steps=t_enc,
        start_token=SOS_ID, c_weight=c_weight,
        lm=scorer, lm_rescoring=True, lm_weight=lm_weight,
    )
    flat_strs = [s for hyps in grouped for (_, _, s) in hyps]
    assert len(ref_strs) == len(flat_strs) == len(feats) * nbest
    assert flat_strs == ref_strs
    for ours, theirs in zip(
            [ids for hyps in grouped for (_, ids, _) in hyps], ref_ids):
        assert _strip_specials(ours) == _strip_specials(theirs)


def test_ctc_loss_parity(ref):
    """Loss-level CTC parity on shared random logits
    (utils/metrics.py:127-148 vs mtl_tpu.train.losses.ctc_loss)."""
    import jax.numpy as jnp

    from mtl_tpu.train.losses import ctc_loss

    rng = np.random.RandomState(5)
    b, t, l, c = 3, 12, 5, 9
    logits = rng.randn(b, t, c).astype(np.float32)
    in_lens = np.array([12, 10, 7], np.int64)
    tgt_lens = np.array([5, 3, 2], np.int64)
    targets = np.zeros((b, l), np.int64)
    for i, n in enumerate(tgt_lens):
        targets[i, :n] = rng.randint(4, c, size=n)

    ref_loss = ref.metrics.calculate_loss(
        torch.from_numpy(logits), torch.from_numpy(targets), pad_id=0,
        input_lengths=torch.from_numpy(in_lens),
        target_lengths=torch.from_numpy(tgt_lens), loss_type="ctc",
    )
    loss = ctc_loss(jnp.asarray(logits), jnp.asarray(in_lens),
                    jnp.asarray(targets), jnp.asarray(tgt_lens))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.parametrize("beam", [False, True])
def test_e2e_test_main_report_parity(ref, tmp_path, beam):
    """The full test.py surface end-to-end: our test_main CLI and the
    reference test.py evaluate loop (test.py:112-171) score the SAME
    transplanted weights on the SAME synthetic test manifest and must report
    EQUAL total CER / WER / EN CER / ZH CER — r3 VERDICT stretch #9.
    ``beam`` exercises the beam-search branch (reference horizon =
    min(tgt_max_len, encoder length) via the forced-EOS retirement at
    modules/decoder.py:215,253-255).

    The reference data pipeline needs torchaudio/librosa (absent here), so
    its evaluate loop consumes the identical feature batches our CLI builds
    (front-end parity vs recorded librosa oracles is tested separately in
    tests/test_frontend.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mtl_tpu.cli.asr import test_main
    from mtl_tpu.config import Config
    from mtl_tpu.data.dataset import SpectrogramDataset
    from mtl_tpu.data.synthetic import make_synthetic_corpus
    from mtl_tpu.data.vocab import SOS_ID, Vocab, post_process
    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.parity.torch_ref import build_ref_model
    from mtl_tpu.train.steps import init_train_state, prepare_features
    from mtl_tpu.utils.checkpoint import save_checkpoint
    from mtl_tpu.utils.metrics import (
        calculate_cer,
        calculate_cer_en_zh,
        calculate_wer,
    )

    manifests, labels = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_tasks=1, utts_per_task=5, max_sec=0.4,
        max_chars=6, seed=21,
    )
    cfg = Config()
    cfg.name = "parity_e2e"
    cfg.save_folder = str(tmp_path / "models")
    cfg.data.train_manifest_list = manifests
    cfg.data.test_manifest_list = manifests
    cfg.data.labels_path = labels
    cfg.data.src_bucket_frames = (64,)
    cfg.data.tgt_bucket_len = (16,)
    cfg.model.num_enc_layers = 1
    cfg.model.num_dec_layers = 1
    cfg.model.num_heads = 2
    cfg.model.dim_model = 16
    cfg.model.dim_key = 8
    cfg.model.dim_value = 8
    cfg.model.dim_inner = 16
    cfg.model.dim_emb = 16
    cfg.model.dropout = 0.0
    cfg.model.r = 4
    cfg.model.dtype = "float32"
    cfg.model.src_max_len = 64
    cfg.model.tgt_max_len = 320  # > the 300-step reference greedy loop
    cfg.train.k_valid = 2
    cfg.finalize()

    vocab = Vocab.from_json(labels)
    ds = SpectrogramDataset(vocab, cfg, manifests, normalize=True)
    model = build_model(cfg, len(vocab))
    opt = optax.adam(1e-3)
    ex = next(ds.iter_batches(2))
    state = init_train_state(model, cfg, opt, jax.random.PRNGKey(5),
                             jax.tree.map(jnp.asarray, ex))
    path = save_checkpoint(cfg, vocab, state, 1)

    ours = test_main([
        "--test-manifest-list", manifests[0],
        "--labels-path", labels,
        "--continue-from", path,
        "--name", "parity_e2e_eval",
        # identical bucketing to the dataset below (test_main's data config
        # comes from the CLI, not the checkpoint)
        "--src-buckets", "64", "--tgt-buckets", "16",
    ] + (["--beam-search", "--beam-width", "2", "--beam-nbest", "1",
          "--c-weight", "0.1"] if beam else []))

    # ---- reference evaluate loop on the SAME batches/weights -------------
    rv = ref.Vocab()
    for lab in vocab.id2label[4:]:
        rv.add_label(lab)
    torch_model = build_ref_model(ref, rv, cfg, state.params,
                                  f_prime=cfg.audio.num_freq // 4,
                                  channels=128)
    torch_model.eval()
    # tgt_max_len mirrors the reference test.py CLI default (test.py:65) —
    # the beam loop bound; the encoder-length forced-EOS retirement
    # (modules/decoder.py:253) is what actually ends these decodes
    ns = types.SimpleNamespace(cuda=False, beam_search=beam,
                               beam_width=2 if beam else 0,
                               beam_nbest=1, c_weight=0.1,
                               tgt_max_len=1000,
                               lm_rescoring=False,
                               lm_weight=0.0, verbose=False)
    total_cer = total_wer = total_char = total_word = 0
    total_en = total_zh = total_en_c = total_zh_c = 0
    for batch, num_valid in ds.iter_batches(cfg.train.k_valid, shuffle=False,
                                            with_valid_count=True):
        feats, lengths = prepare_features(jax.tree.map(jnp.asarray, batch),
                                          cfg)
        x = torch.from_numpy(np.asarray(feats)).permute(0, 2, 1)[:, None]
        with torch.no_grad():
            _, strs_hyps, strs_gold = torch_model.evaluate(
                x, torch.from_numpy(np.asarray(lengths, np.int64)),
                torch.from_numpy(np.asarray(batch["targets"], np.int64)),
                ns, beam_search=beam, c_weight=0.1, start_token=SOS_ID)
        for hyp, gold in zip(strs_hyps[:num_valid], strs_gold[:num_valid]):
            hyp = post_process(hyp, vocab.special_token_list)
            gold = post_process(gold, vocab.special_token_list)
            total_cer += calculate_cer(hyp.strip(), gold.strip())
            total_wer += calculate_wer(hyp, gold)
            en_d, zh_d, en_n, zh_n = calculate_cer_en_zh(hyp, gold)
            total_en += en_d
            total_zh += zh_d
            total_en_c += en_n
            total_zh_c += zh_n
            total_char += len(gold)
            total_word += len(gold.split(" "))

    theirs = {
        "cer": total_cer * 100.0 / max(total_char, 1),
        "wer": total_wer * 100.0 / max(total_word, 1),
        "en_cer": total_en * 100.0 / max(total_en_c, 1),
        "zh_cer": total_zh * 100.0 / max(total_zh_c, 1),
    }
    for k in theirs:
        assert abs(ours[k] - theirs[k]) < 1e-9, (k, ours, theirs)


@pytest.mark.parametrize("tokenize_lang", [-1, 0, 1])
def test_word_segments_with_tokenization_parity(ref, tokenize_lang):
    """Our get_word_segments_per_language_with_tokenization reproduces the
    reference's run-segmentation state machine (utils/data.py:129-197) —
    including the final-flush quirks — with identical injected tokenizers
    standing in for the CoreNLP word_tokenize bound methods."""
    import types as _types

    import utils.data as ref_data

    from mtl_tpu.data.text import (
        get_word_segments_per_language_with_tokenization as ours_fn,
    )

    def en_tok(s):
        return s.replace("'", " '").split()

    def zh_tok(s):
        return [c for c in s if not c.isspace()]

    en_nlp = _types.SimpleNamespace(word_tokenize=en_tok)
    zh_nlp = _types.SimpleNamespace(word_tokenize=zh_tok)

    cases = [
        "we don't know 你好 世界 okay 再见",
        "你好 hello world 世界",
        "all english here don't stop",
        "你好 世界 再见",
        "single",
        "你",
        "",
        "mixed末word 你 good",
    ]
    for seq in cases:
        theirs = ref_data.get_word_segments_per_language_with_tokenization(
            seq, tokenize_lang=tokenize_lang, zh_nlp=zh_nlp, en_nlp=en_nlp)
        mine = ours_fn(seq, tokenize_lang=tokenize_lang,
                       en_tokenize=en_tok, zh_tokenize=zh_tok)
        assert mine == theirs, (seq, mine, theirs)
