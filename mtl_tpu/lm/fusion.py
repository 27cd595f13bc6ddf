"""LM shallow-fusion scorer for beam-search rescoring + convert format.

Parity: utils/lm.py —
* the converted-checkpoint format stores {word2idx, idx2word, arch params,
  model weights} (written by lm/convert.py:433-448, read at utils/lm.py:42-65);
* ``calculate_lm_score`` (utils/lm.py:8-40): character string -> EN words /
  ZH chars word sequence, CE sum over the word sequence (+<eos>), returns
  (-loss/num_words + 1, num_words + 1, oov_count); OOV words map to <oov>.

TPU note: scoring pads each word sequence to a fixed bucket so the jitted LM
forward compiles once per bucket instead of per length.
"""

from __future__ import annotations

import json
import math
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..utils.metrics import (
    get_word_segments_per_language,
    is_contain_chinese_word,
)
from .model import RNNLM

_BUCKETS = (16, 32, 64, 128, 256)


def save_lm_fusion(path: str, params, word2idx: dict, arch: dict) -> None:
    """lm/convert.py `model_save` parity (state-dict + metadata)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "lm_meta.json"), "w", encoding="utf-8") as f:
        json.dump({"word2idx": word2idx, "arch": arch}, f, ensure_ascii=False)
    with open(os.path.join(path, "lm_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))


class LMScorer:
    def __init__(self, model: RNNLM, params, word2idx: dict):
        self.model = model
        self.params = params
        self.word2idx = word2idx
        self._eval_cache = {}

    @classmethod
    def load(cls, path: str) -> "LMScorer":
        with open(os.path.join(path, "lm_meta.json"), encoding="utf-8") as f:
            meta = json.load(f)
        arch = meta["arch"]
        model = RNNLM(
            rnn_type=arch.get("rnn_type", "LSTM"), ntoken=arch["ntoken"],
            ninp=arch["ninp"], nhid=arch["nhid"], nlayers=arch["nlayers"],
            dropout=arch.get("dropout", 0.5),
            tie_weights=arch.get("tie_weights", False),
        )
        ex = jnp.zeros((2, 1), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ex)
        with open(os.path.join(path, "lm_params.msgpack"), "rb") as f:
            params = serialization.from_bytes(params, f.read())
        return cls(model, params, meta["word2idx"])

    def _eval_fn(self, bucket: int):
        if bucket not in self._eval_cache:
            model = self.model

            @jax.jit
            def fn(params, ids, length):
                # ids: [bucket+1] token stream; score tokens 1..length
                data = ids[:-1][:, None]  # [bucket, 1]
                target = ids[1:]
                logits, _ = model.apply(params, data, deterministic=True)
                lp = jax.nn.log_softmax(logits[:, 0], -1)
                tok = -jnp.take_along_axis(lp, target[:, None], 1)[:, 0]
                mask = jnp.arange(bucket) < length
                return jnp.sum(jnp.where(mask, tok, 0.0))

            self._eval_cache[bucket] = fn
        return self._eval_cache[bucket]

    def evaluate(self, seq: str) -> Tuple[float, int]:
        """CE sum over `seq.split() + ['<eos>']` (utils/lm.py:101-123)."""
        words = seq.split() + ["<eos>"]
        oov = 0
        ids = []
        for w in words:
            if w in self.word2idx:
                ids.append(self.word2idx[w])
            else:
                ids.append(self.word2idx["<oov>"])
                oov += 1
        n = len(ids) - 1  # transitions scored
        bucket = next((b for b in _BUCKETS if n <= b), _BUCKETS[-1])
        arr = np.zeros(bucket + 1, np.int32)
        arr[: len(ids)] = ids[: bucket + 1]
        score = float(self._eval_fn(bucket)(self.params, jnp.asarray(arr),
                                            min(n, bucket)))
        return score, oov

    def score_ids(self, ids: List[int], vocab) -> Tuple[float, int, int]:
        """calculate_lm_score parity (utils/lm.py:8-40)."""
        seq_str = "".join(
            vocab.id2label[int(i)] for i in ids
        )
        for tok in (vocab.PAD_TOKEN, vocab.SOS_TOKEN, vocab.EOS_TOKEN):
            seq_str = seq_str.replace(tok, "")
        seq_str = seq_str.replace("  ", " ")

        parts: List[str] = []
        for seg in get_word_segments_per_language(seq_str):
            if is_contain_chinese_word(seg):
                parts.extend(ch for ch in seg if ch != " ")
            else:
                if seg:
                    parts.append(seg)
        word_str = " ".join(" ".join(parts).split())
        if word_str == "":
            return -999.0, 0, 0
        score, oov = self.evaluate(word_str)
        n = len(word_str.split())
        return -1.0 * score / n + 1.0, n + 1, oov
