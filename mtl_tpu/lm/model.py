"""Word-level recurrent LM (Flax).

Parity: lm/model/rnn_model.py:12-70 (== the embedded copy at
utils/lm.py:134-197) — Embedding -> nlayers x LSTM/GRU/RNN (dropout on the
embedding, between layers, and on the top output) -> Linear, with optional
embedding/softmax weight tying. Init parity: embedding and decoder weights
uniform(-0.1, 0.1), decoder bias zero (:49-53).

TPU-first: the time recursion runs under ``nn.scan`` (one compiled scan, not
a Python loop); batch layout is the reference's column-major [T, B].
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

UNIFORM_01 = nn.initializers.uniform(scale=0.2)  # uniform(0, 0.2) shifted


def _uniform_pm(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def _cell_type(rnn_type: str):
    types = {
        "LSTM": nn.OptimizedLSTMCell,
        "GRU": nn.GRUCell,
        "RNN_TANH": nn.SimpleCell,
        "RNN_RELU": nn.SimpleCell,
    }
    if rnn_type not in types:
        raise ValueError(
            "An invalid option for `--model` was supplied, options are "
            "['LSTM', 'GRU', 'RNN_TANH' or 'RNN_RELU']"
        )
    return types[rnn_type]


class RNNLM(nn.Module):
    rnn_type: str
    ntoken: int
    ninp: int
    nhid: int
    nlayers: int
    dropout: float = 0.5
    tie_weights: bool = False

    def setup(self):
        if self.tie_weights and self.nhid != self.ninp:
            raise ValueError(
                "When using the tied flag, nhid must be equal to emsize"
            )
        self.embed = nn.Embed(self.ntoken, self.ninp,
                              embedding_init=_uniform_pm(0.1))
        cell_kwargs = {"features": self.nhid}
        if self.rnn_type == "RNN_RELU":
            cell_kwargs["activation_fn"] = nn.relu
        scan_cell = nn.scan(
            _cell_type(self.rnn_type),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )
        self.cells = [
            scan_cell(name=f"rnn_l{i}", **cell_kwargs)
            for i in range(self.nlayers)
        ]
        self.drop = nn.Dropout(self.dropout)
        if not self.tie_weights:
            self.decoder = nn.Dense(self.ntoken,
                                    kernel_init=_uniform_pm(0.1),
                                    bias_init=nn.initializers.zeros)
        else:
            self.decoder_bias = self.param(
                "decoder_bias", nn.initializers.zeros, (self.ntoken,)
            )

    def init_carry(self, batch_size: int):
        shape = (batch_size, self.nhid)
        if self.rnn_type == "LSTM":
            return [
                (jnp.zeros(shape), jnp.zeros(shape))
                for _ in range(self.nlayers)
            ]
        return [jnp.zeros(shape) for _ in range(self.nlayers)]

    def __call__(
        self,
        tokens: jnp.ndarray,  # [T, B] int ids (reference column layout)
        carry: Optional[List] = None,
        deterministic: bool = True,
    ):
        t, b = tokens.shape
        if carry is None:
            carry = self.init_carry(b)
        h = self.embed(tokens)  # [T, B, ninp]
        h = self.drop(h, deterministic=deterministic)
        new_carry = []
        for i, cell in enumerate(self.cells):
            c, h = cell(carry[i], h)
            new_carry.append(c)
            if i < self.nlayers - 1:
                # torch nn.LSTM applies dropout between layers only
                h = self.drop(h, deterministic=deterministic)
        h = self.drop(h, deterministic=deterministic)
        if self.tie_weights:
            logits = h @ self.embed.embedding.T + self.decoder_bias
        else:
            logits = self.decoder(h)
        return logits, new_carry  # [T, B, V]
