"""PyTorch-reference interop: import the actual reference implementation
(/root/reference, read-only) and transplant mtl_tpu Flax parameters into its
model, so parity claims and matched-CER benchmarks run against the real
reference code rather than a re-implementation.

Used by tests/test_torch_parity.py (logit/loss/decode parity evidence) and
bench_matched_cer.py (same-weights same-data learning-curve comparison).

Deliberate divergences handled here:

* conv feature flattening order — the reference flattens channel-major
  (models/asr/transformer.py:93), mtl_tpu freq-major; a fixed permutation of
  the encoder input-projection rows absorbs it (``conv_feat_perm``).
* torch ``nn.Embedding(padding_idx=0)``'s PAD row is re-randomized by the
  reference's blanket xavier re-init (models/asr/transformer.py:74-76) while
  mtl_tpu zeroes the PAD row at call time; the transplant zeroes the torch
  PAD row so both compute the same function.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_PATH = "/root/reference"


def stub_missing_native_deps():
    """The reference imports sox/corenlp/librosa wrappers at module scope;
    none are needed for the model math, so stub what's absent."""
    for name, attrs in {
        "stanfordcorenlp": ["StanfordCoreNLP"],
        "Levenshtein": ["distance"],
        "librosa": [],
        "torchaudio": ["load"],
        "python_speech_features": ["logfbank"],
    }.items():
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            for attr in attrs:
                setattr(mod, attr, lambda *a, **k: None)
            sys.modules[name] = mod


def load_reference(path: str = REF_PATH):
    """Import the reference modules; returns a namespace with Transformer,
    Encoder, Decoder, Vocab, metrics."""
    stub_missing_native_deps()
    if path not in sys.path:
        # append (not insert) so the reference's top-level `utils`/`models`
        # packages can never shadow anything of ours
        sys.path.append(path)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        from models.asr.transformer import Transformer as RefTransformer
        from modules.encoder import Encoder as RefEncoder
        from modules.decoder import Decoder as RefDecoder
        from utils.data import Vocab as RefVocab
        from utils import metrics as ref_metrics

    return types.SimpleNamespace(
        Transformer=RefTransformer, Encoder=RefEncoder, Decoder=RefDecoder,
        Vocab=RefVocab, metrics=ref_metrics,
    )


def conv_feat_perm(f_prime: int, channels: int) -> np.ndarray:
    """perm[j] maps the reference's channel-major feature index
    j = c*F' + f to mtl_tpu's freq-major index i = f*C + c."""
    j = np.arange(f_prime * channels)
    return (j % f_prime) * channels + (j // f_prime)


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32))


def _copy_factorized(dst: dict, prefix: str, tree: dict, in_perm=None):
    """FactorizedDense {a,b} or {full} -> torch `{prefix}_a/_b` or
    `{prefix}`."""
    if "a" in tree:
        a = np.asarray(tree["a"]["kernel"], np.float32)  # (in, r)
        if in_perm is not None:
            a = a[in_perm]
        dst[f"{prefix}_a.weight"] = _t(a.T)
        dst[f"{prefix}_b.weight"] = _t(np.asarray(tree["b"]["kernel"]).T)
        dst[f"{prefix}_b.bias"] = _t(tree["b"]["bias"])
    else:
        k = np.asarray(tree["full"]["kernel"], np.float32)  # (in, out)
        if in_perm is not None:
            k = k[in_perm]
        dst[f"{prefix}.weight"] = _t(k.T)
        dst[f"{prefix}.bias"] = _t(tree["full"]["bias"])


def _copy_mha(dst: dict, prefix: str, tree: dict):
    for name in ("query_linear", "key_linear", "value_linear",
                 "output_linear"):
        _copy_factorized(dst, f"{prefix}.{name}", tree[name])
    dst[f"{prefix}.layer_norm.weight"] = _t(tree["layer_norm"]["scale"])
    dst[f"{prefix}.layer_norm.bias"] = _t(tree["layer_norm"]["bias"])


def _copy_ffn(dst: dict, prefix: str, tree: dict):
    _copy_factorized(dst, f"{prefix}.linear_1", tree["linear_1"])
    _copy_factorized(dst, f"{prefix}.linear_2", tree["linear_2"])
    dst[f"{prefix}.layer_norm.weight"] = _t(tree["layer_norm"]["scale"])
    dst[f"{prefix}.layer_norm.bias"] = _t(tree["layer_norm"]["bias"])


def _num_layers(tree: dict) -> int:
    return sum(1 for k in tree if k.startswith("layers_"))


def flax_to_torch_state(params: dict, f_prime: int, channels: int,
                        conv_indices=(0, 2, 5, 7)) -> dict:
    """Map an mtl_tpu ASRTransformer param tree onto the reference
    Transformer's state_dict key space (layer counts inferred)."""
    p = params["params"]
    sd = {}
    # vgg/large conv stack: flax NHWC (kh,kw,in,out) -> torch (out,in,kh,kw)
    for flax_i, torch_i in enumerate(conv_indices):
        leaf = p["conv"]["conv"][f"Conv_{flax_i}"]
        sd[f"conv.{torch_i}.weight"] = _t(
            np.transpose(np.asarray(leaf["kernel"], np.float32), (3, 2, 0, 1))
        )
        sd[f"conv.{torch_i}.bias"] = _t(leaf["bias"])

    enc = p["encoder"]
    perm = conv_feat_perm(f_prime, channels)
    _copy_factorized(sd, "encoder.input_linear", enc["input_linear"],
                     in_perm=perm)
    sd["encoder.layer_norm_input.weight"] = _t(
        enc["layer_norm_input"]["scale"])
    sd["encoder.layer_norm_input.bias"] = _t(enc["layer_norm_input"]["bias"])
    for i in range(_num_layers(enc)):
        layer = enc[f"layers_{i}"]
        _copy_mha(sd, f"encoder.layers.{i}.self_attn", layer["self_attn"])
        _copy_ffn(sd, f"encoder.layers.{i}.pos_ffn", layer["pos_ffn"])

    dec = p["decoder"]
    emb = np.asarray(dec["trg_embedding"]["embedding"], np.float32).copy()
    emb[0] = 0.0  # PAD row: see module docstring
    sd["decoder.trg_embedding.weight"] = _t(emb)
    sd["decoder.output_linear.weight"] = _t(
        np.asarray(dec["output_linear"]["kernel"]).T
    )
    for i in range(_num_layers(dec)):
        layer = dec[f"layers_{i}"]
        _copy_mha(sd, f"decoder.layers.{i}.self_attn", layer["self_attn"])
        _copy_mha(sd, f"decoder.layers.{i}.encoder_attn",
                  layer["encoder_attn"])
        _copy_ffn(sd, f"decoder.layers.{i}.pos_ffn", layer["pos_ffn"])
    return sd


def rnnlm_to_torch_state(params: dict, nlayers: int, tie_weights: bool = False
                         ) -> dict:
    """Map an mtl_tpu RNNLM (LSTM) param tree onto the reference RNNModel's
    state_dict key space (lm/model/rnn_model.py:12-70 == utils/lm.py:134-197).

    Flax LSTMCell keeps one dense per gate (ii/if/ig/io input, hi/hf/hg/ho
    hidden with bias); torch nn.LSTM concatenates gates row-wise in
    (i, f, g, o) order with separate ih/hh biases — the flax bias lands in
    bias_hh, bias_ih is zeroed (their sum is what the cell adds)."""
    import torch

    p = params["params"]
    sd = {"encoder.weight": _t(p["embed"]["embedding"])}
    for layer in range(nlayers):
        cell = p[f"rnn_l{layer}"]
        w_ih = np.concatenate(
            [np.asarray(cell[g]["kernel"], np.float32).T
             for g in ("ii", "if", "ig", "io")], axis=0)
        w_hh = np.concatenate(
            [np.asarray(cell[g]["kernel"], np.float32).T
             for g in ("hi", "hf", "hg", "ho")], axis=0)
        b_hh = np.concatenate(
            [np.asarray(cell[g]["bias"], np.float32)
             for g in ("hi", "hf", "hg", "ho")], axis=0)
        sd[f"rnn.weight_ih_l{layer}"] = _t(w_ih)
        sd[f"rnn.weight_hh_l{layer}"] = _t(w_hh)
        sd[f"rnn.bias_ih_l{layer}"] = torch.zeros(len(b_hh))
        sd[f"rnn.bias_hh_l{layer}"] = _t(b_hh)
    if tie_weights:
        sd["decoder.weight"] = sd["encoder.weight"]
        sd["decoder.bias"] = _t(p["decoder_bias"])
    else:
        sd["decoder.weight"] = _t(np.asarray(p["decoder"]["kernel"]).T)
        sd["decoder.bias"] = _t(p["decoder"]["bias"])
    return sd


def save_torch_lm_checkpoint(path: str, params: dict, word2idx: dict,
                             arch: dict) -> str:
    """Write the converted-LM checkpoint format utils/lm.py:LM loads
    (lm/convert.py:433-448: word2idx/idx2word/arch/model_state_dict) from an
    mtl_tpu RNNLM param tree — the torch side of LM-fusion parity tests."""
    import torch

    sd = rnnlm_to_torch_state(params, arch["nlayers"],
                              arch.get("tie_weights", False))
    torch.save({
        "word2idx": word2idx,
        "idx2word": {v: k for k, v in word2idx.items()},
        "ntoken": arch["ntoken"],
        "ninp": arch["ninp"],
        "nhid": arch["nhid"],
        "nlayers": arch["nlayers"],
        "dropout": arch.get("dropout", 0.0),
        "tie_weights": arch.get("tie_weights", False),
        "model_state_dict": sd,
    }, path)
    return path


def build_ref_model(ref, ref_vocab, cfg, flax_params, f_prime: int,
                    channels: int):
    """Construct the reference Transformer from an mtl_tpu Config and load
    the transplanted Flax parameters. Returns the torch model (train mode
    left to the caller)."""
    m = cfg.model
    torch_enc = ref.Encoder(
        m.num_enc_layers, m.num_heads, m.dim_model, m.dim_key, m.dim_value,
        m.dim_input, m.dim_inner, dropout=m.dropout,
        src_max_length=m.src_max_len, is_factorized=m.is_factorized, r=m.r,
    )
    torch_dec = ref.Decoder(
        ref_vocab, m.num_dec_layers, m.num_heads, m.dim_emb, m.dim_model,
        m.dim_inner, m.dim_key, m.dim_value, dropout=m.dropout,
        trg_max_length=m.tgt_max_len, is_factorized=m.is_factorized, r=m.r,
    )
    torch_model = ref.Transformer(torch_enc, torch_dec, ref_vocab,
                                  feat_extractor=m.feat_extractor,
                                  is_factorized=m.is_factorized, r=m.r)
    sd = flax_to_torch_state(flax_params, f_prime=f_prime, channels=channels)
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    leftover = [k for k in missing if not k.endswith("positional_encoding.pe")]
    assert not leftover, leftover
    return torch_model
