"""Coverage for the remaining reference paths: CTC training, GRU LM,
beam search with LM shallow fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.test_steps import feature_batch, tiny_cfg, tiny_model


def test_ctc_training_path_decreases_loss():
    """loss=ctc end-to-end through the jitted joint step (the reference's
    --loss ctc mode, utils/metrics.py:127-148)."""
    from mtl_tpu.train.steps import init_train_state, make_joint_step

    cfg = tiny_cfg(loss="ctc", lr=1e-3)
    model = tiny_model(cfg)
    batch = feature_batch(jax.random.PRNGKey(0))
    batch["src_percentages"] = jnp.ones((2,), jnp.float32)
    opt = optax.adam(1e-3)
    state = init_train_state(model, cfg, opt, jax.random.PRNGKey(1), batch)
    step = make_joint_step(model, cfg, opt)
    batches = jax.tree.map(lambda x: x[None], batch)
    rng = jax.random.PRNGKey(2)
    first = None
    for i in range(15):
        rng, sub = jax.random.split(rng)
        state, loss, aux = step(state, batches, sub)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < first


def test_gru_lm_trains():
    from mtl_tpu.lm.model import RNNLM
    from mtl_tpu.lm.train import make_lm_loss, make_lm_sgd_step

    model = RNNLM(rnn_type="GRU", ntoken=20, ninp=8, nhid=8, nlayers=2,
                  dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 1), jnp.int32))
    rng = np.random.RandomState(0)
    data = rng.randint(0, 20, size=(6, 4)).astype(np.int32)
    target = rng.randint(0, 20, size=(24,)).astype(np.int32)
    step = make_lm_sgd_step(model, clip=0.25)
    l0 = float(make_lm_loss(model)(params, data, target)[0])
    carry = model.apply(params, 4, method="init_carry")
    key = jax.random.PRNGKey(1)
    for _ in range(20):
        key, sub = jax.random.split(key)
        params, loss, carry = step(params, data, target, 1.0, sub, carry)
    assert float(loss) < l0


def test_beam_search_with_lm_fusion(tmp_path):
    """Beam decode + LM shallow-fusion rescoring end-to-end (the reference's
    --lm-rescoring path: score + lm_weight*(lm_score-2*oov) +
    sqrt(num_words)*c_weight)."""
    from mtl_tpu.data.vocab import Vocab
    from mtl_tpu.decode.beam import beam_search
    from mtl_tpu.lm.fusion import LMScorer, save_lm_fusion
    from mtl_tpu.lm.model import RNNLM
    from mtl_tpu.models.transformer import ASRTransformer

    labels = ["<PAD>", "<SOS>", "<EOS>", "<OOV>"] + list("abcd efg")
    vocab = Vocab.from_labels(labels)

    lm_model = RNNLM(rnn_type="LSTM", ntoken=10, ninp=8, nhid=8, nlayers=1,
                     dropout=0.0)
    lm_params = lm_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, 1), jnp.int32))
    word2idx = {"<oov>": 0, "<eos>": 1, "ab": 2, "cd": 3}
    arch = {"rnn_type": "LSTM", "ntoken": 10, "ninp": 8, "nhid": 8,
            "nlayers": 1, "dropout": 0.0, "tie_weights": False}
    path = str(tmp_path / "lm")
    save_lm_fusion(path, lm_params, word2idx, arch)
    lm = LMScorer.load(path)

    model = ASRTransformer(
        vocab_size=len(vocab), feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12)) * 0.3
    lengths = jnp.array([8, 8])
    params = model.init(jax.random.PRNGKey(1), feats, lengths,
                        jnp.zeros((2, 3), jnp.int32))

    ids, strs = beam_search(model, params, feats, lengths, vocab,
                            beam_width=2, nbest=2, max_steps=6,
                            start_token=vocab.SOS_ID, c_weight=0.1,
                            lm=lm, lm_rescoring=True, lm_weight=0.1)
    assert len(strs) >= 2
    assert all(isinstance(s, str) for s in strs)


def test_fused_vgg_cli_flag_parsing():
    """--fused-vgg / --no-fused-vgg / default-None plumb into ModelConfig."""
    from mtl_tpu.config import build_parser, config_from_args

    def parse(extra):
        args = build_parser("t").parse_args(
            ["--train-manifest-list", "a.csv", "--labels-path", "l.json"]
            + extra)
        return config_from_args(args)

    assert parse([]).model.fused_vgg is None
    assert parse(["--fused-vgg"]).model.fused_vgg is True
    assert parse(["--no-fused-vgg"]).model.fused_vgg is False
