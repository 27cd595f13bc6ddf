"""Transformer character decoder.

Parity: modules/decoder.py:14-323 —
* char embedding (PAD row forced to zero, torch ``padding_idx`` semantics)
  scaled by ``x_logit_scale`` (=1.0) + sinusoidal PE + dropout;
* ``num_layers`` x [masked self-attn -> *non_pad_mask -> cross-attn ->
  *non_pad_mask -> post-LN FFN -> *non_pad_mask];
* output projection without bias (decoder.py:50).

Teacher-forcing masks (decoder.py:86-94): EOS is the pad id of ``seq_in``;
self-attention mask = key-pad | subsequent; decoder-encoder mask from *raw*
encoder input lengths (the reference downsampling quirk, SURVEY.md §3.3).

Decoding additions (no reference equivalent — the reference re-forwards the
whole prefix each step with no KV cache, decoder.py:145-161): per-layer
self-attention KV caches and precomputed cross-attention K/V for O(1) work per
generated token. ``decode_step`` with a causal cache is mathematically
identical to the full re-forward because every block is causal and post-LN.
Note greedy/beam parity detail: the reference passes ``dec_enc_attn_mask=None``
during search (attending padded encoder frames too) — we replicate that.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..data.vocab import EOS_ID, PAD_ID
from ..ops.masks import (
    attn_key_pad_mask,
    attn_pad_mask_from_lengths,
    non_pad_mask_from_ids,
    subsequent_mask,
)
from .layers import KERNEL_INIT, FeedForward, MultiHeadAttention, PositionalEncoding

# (k, v) pair per layer
LayerKV = Tuple[jnp.ndarray, jnp.ndarray]


class DecoderLayer(nn.Module):
    num_heads: int
    dim_model: int
    dim_inner: int
    dim_key: int
    dim_value: int
    dropout: float = 0.1
    is_factorized: bool = False
    r: int = 100
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        kw = dict(
            num_heads=self.num_heads, dim_model=self.dim_model,
            dim_key=self.dim_key, dim_value=self.dim_value,
            dropout=self.dropout, r=self.r, dtype=self.dtype,
        )
        self.self_attn = MultiHeadAttention(**kw)
        self.encoder_attn = MultiHeadAttention(**kw)
        self.pos_ffn = FeedForward(
            dim_model=self.dim_model, dim_ff=self.dim_inner,
            dropout=self.dropout, factorized=self.is_factorized, r=self.r,
            dtype=self.dtype,
        )

    def __call__(
        self,
        dec_input: jnp.ndarray,
        enc_output: jnp.ndarray,
        non_pad_mask: jnp.ndarray,
        self_attn_mask: Optional[jnp.ndarray],
        dec_enc_attn_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        npm = non_pad_mask
        h = self.self_attn(dec_input, dec_input, dec_input,
                           mask=self_attn_mask, deterministic=deterministic)
        h = h * npm.astype(h.dtype)
        h = self.encoder_attn(h, enc_output, enc_output,
                              mask=dec_enc_attn_mask, deterministic=deterministic)
        h = h * npm.astype(h.dtype)
        h = self.pos_ffn(h, deterministic=deterministic)
        h = h * npm.astype(h.dtype)
        return h

    def step(
        self,
        h_t: jnp.ndarray,  # B x 1 x D
        self_cache: LayerKV,
        enc_kv: LayerKV,
        t,
    ) -> Tuple[jnp.ndarray, LayerKV]:
        h, ck, cv = self.self_attn.decode_step(h_t, self_cache[0], self_cache[1], t)
        h = self.encoder_attn.cross_step(h, enc_kv[0], enc_kv[1], mask=None)
        h = self.pos_ffn(h, deterministic=True)
        return h, (ck, cv)

    def enc_kv(self, enc_output: jnp.ndarray) -> LayerKV:
        return self.encoder_attn.project_kv(enc_output, enc_output)


class Decoder(nn.Module):
    vocab_size: int
    num_layers: int
    num_heads: int
    dim_emb: int
    dim_model: int
    dim_inner: int
    dim_key: int
    dim_value: int
    dropout: float = 0.1
    trg_max_length: int = 1000
    emb_trg_sharing: bool = False
    is_factorized: bool = False
    r: int = 100
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.trg_embedding = nn.Embed(
            self.vocab_size, self.dim_emb,
            embedding_init=nn.initializers.xavier_uniform(),
            param_dtype=jnp.float32,
        )
        self.positional_encoding = PositionalEncoding(
            self.dim_model, self.trg_max_length
        )
        self.drop = nn.Dropout(self.dropout)
        self.layers = [
            DecoderLayer(
                num_heads=self.num_heads, dim_model=self.dim_model,
                dim_inner=self.dim_inner, dim_key=self.dim_key,
                dim_value=self.dim_value, dropout=self.dropout,
                is_factorized=self.is_factorized, r=self.r, dtype=self.dtype,
            )
            for _ in range(self.num_layers)
        ]
        self.output_linear = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=KERNEL_INIT,
            dtype=self.dtype,
        )
        self.x_logit_scale = 1.0

    def _embed(self, seq: jnp.ndarray, offset=0) -> jnp.ndarray:
        """Token embedding with torch padding_idx semantics + PE."""
        emb = self.trg_embedding(seq) * (seq != PAD_ID)[..., None]
        emb = emb * self.x_logit_scale
        return emb + self.positional_encoding(seq.shape[1], offset)

    def __call__(
        self,
        seq_in: jnp.ndarray,  # B x L, EOS-padded teacher-forcing input
        enc_output: jnp.ndarray,  # B x T_enc x D
        enc_input_lengths: jnp.ndarray,  # B (raw lengths — reference quirk)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, L = seq_in.shape
        non_pad_mask = non_pad_mask_from_ids(seq_in, EOS_ID)
        self_attn_mask = attn_key_pad_mask(seq_in, L, EOS_ID) | subsequent_mask(L)[None]
        dec_enc_attn_mask = attn_pad_mask_from_lengths(
            enc_input_lengths, enc_output.shape[1], L
        )

        h = self.drop(self._embed(seq_in), deterministic=deterministic)
        h = h.astype(self.dtype)
        for layer in self.layers:
            h = layer(h, enc_output, non_pad_mask, self_attn_mask,
                      dec_enc_attn_mask, deterministic)
        return self.output_linear(h).astype(jnp.float32)  # B x L x V

    # ---- incremental decoding -------------------------------------------
    def precompute_enc_kv(self, enc_output: jnp.ndarray) -> List[LayerKV]:
        return [layer.enc_kv(enc_output) for layer in self.layers]

    def init_cache(self, batch: int, max_steps: int) -> List[LayerKV]:
        caches = []
        for _ in range(self.num_layers):
            k = jnp.zeros((batch, max_steps, self.num_heads, self.dim_key),
                          dtype=self.dtype)
            v = jnp.zeros((batch, max_steps, self.num_heads, self.dim_value),
                          dtype=self.dtype)
            caches.append((k, v))
        return caches

    def decode_step(
        self,
        y_t: jnp.ndarray,  # B int32 — current token ids
        t,  # scalar step index
        enc_kvs: List[LayerKV],
        caches: List[LayerKV],
    ) -> Tuple[jnp.ndarray, List[LayerKV]]:
        """One autoregressive step; returns (logits B x V, updated caches)."""
        h = self._embed(y_t[:, None], offset=t).astype(self.dtype)  # B x 1 x D
        new_caches = []
        for layer, enc_kv, cache in zip(self.layers, enc_kvs, caches):
            h, cache = layer.step(h, cache, enc_kv, t)
            new_caches.append(cache)
        logits = self.output_linear(h[:, 0]).astype(jnp.float32)  # B x V
        return logits, new_caches
