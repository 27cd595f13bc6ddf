"""Transformer encoder.

Parity: modules/encoder.py:15-106 — input projection (optionally rank-r
factorized, encoder.py:40-44) + LayerNorm + sinusoidal PE (NO input dropout —
the reference defines ``self.dropout`` but never applies it in forward), then
``num_layers`` x [factorized self-attention -> *non_pad_mask -> post-LN FFN ->
*non_pad_mask].

The padding masks are built from the lengths the caller passes; the reference
passes *un-downsampled* input lengths against conv-downsampled time
(SURVEY.md §3.3 quirk) and callers here do the same by default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attn_pad_mask_from_lengths, non_pad_mask_from_lengths
from .layers import KERNEL_INIT, FactorizedDense, FeedForward, MultiHeadAttention, PositionalEncoding


class EncoderLayer(nn.Module):
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
        self.self_attn = MultiHeadAttention(
            num_heads=self.num_heads, dim_model=self.dim_model,
            dim_key=self.dim_key, dim_value=self.dim_value,
            dropout=self.dropout, r=self.r, dtype=self.dtype,
        )
        self.pos_ffn = FeedForward(
            dim_model=self.dim_model, dim_ff=self.dim_inner,
            dropout=self.dropout, factorized=self.is_factorized, r=self.r,
            dtype=self.dtype,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        non_pad_mask: jnp.ndarray,  # B x T x 1 float
        self_attn_mask: Optional[jnp.ndarray],  # B x T x T bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        out = self.self_attn(x, x, x, mask=self_attn_mask,
                             deterministic=deterministic)
        out = out * non_pad_mask.astype(out.dtype)
        out = self.pos_ffn(out, deterministic=deterministic)
        out = out * non_pad_mask.astype(out.dtype)
        return out


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    dim_model: int
    dim_key: int
    dim_value: int
    dim_input: int
    dim_inner: int
    dropout: float = 0.1
    src_max_length: int = 2500
    is_factorized: bool = False
    r: int = 100
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        rank = self.r if self.is_factorized else None
        self.input_linear = FactorizedDense(self.dim_model, r=rank,
                                            dtype=self.dtype)
        # epsilon=1e-5: torch nn.LayerNorm default (cross-framework parity)
        self.layer_norm_input = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.positional_encoding = PositionalEncoding(
            self.dim_model, self.src_max_length
        )
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(4,))
        self.layers = [
            layer_cls(
                num_heads=self.num_heads, dim_model=self.dim_model,
                dim_inner=self.dim_inner, dim_key=self.dim_key,
                dim_value=self.dim_value, dropout=self.dropout,
                is_factorized=self.is_factorized, r=self.r, dtype=self.dtype,
            )
            for _ in range(self.num_layers)
        ]

    def __call__(
        self,
        padded_input: jnp.ndarray,  # B x T x D_input
        input_lengths: jnp.ndarray,  # B (reference: un-downsampled lengths)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        T = padded_input.shape[1]
        non_pad_mask = non_pad_mask_from_lengths(input_lengths, T)
        self_attn_mask = attn_pad_mask_from_lengths(input_lengths, T, T)

        h = self.layer_norm_input(
            self.input_linear(padded_input.astype(self.dtype)).astype(jnp.float32)
        )
        h = (h + self.positional_encoding(T)).astype(self.dtype)

        for layer in self.layers:
            h = layer(h, non_pad_mask, self_attn_mask, deterministic)
        return h
