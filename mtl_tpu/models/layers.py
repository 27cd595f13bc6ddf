"""Transformer building blocks (Flax).

Behavioral parity targets (all file:line cites into /root/reference):

* ``PositionalEncoding`` — sinusoidal table, modules/common_layers.py:86-108.
* ``FeedForward`` — post-LN residual FFN, modules/common_layers.py:110-132,
  plus the rank-r factorized variant at :134-158.
* ``MultiHeadAttention`` — the reference instantiates
  ``FactorizedMultiHeadAttention`` (rank-r bottleneck QKV/output projections,
  modules/common_layers.py:238-306) in *every* encoder/decoder layer
  (modules/encoder.py:92, modules/decoder.py:302-305), so rank-r projection is
  the default here too (``r=100``). Attention math parity:
  scores / sqrt(dim_key), mask -> -inf, softmax, dropout, output projection,
  dropout, LayerNorm(out + residual) (post-LN).

TPU-first design notes: activations run in ``dtype`` (bfloat16 by default) so
matmuls hit the MXU natively; softmax and LayerNorm accumulate in float32;
params are float32. Heads are a tensor dimension (no torch-style
reshape/permute round-trips) so XLA lays out one batched matmul per
projection. Decoding uses an explicit KV cache (``decode_step``) instead of
the reference's full-prefix re-forward per step (modules/decoder.py:145-161).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Xavier-uniform everywhere: the reference re-initializes every parameter with
# dim > 1 via nn.init.xavier_uniform_ after module construction
# (models/asr/transformer.py:74-76), overriding the per-layer normal inits.
KERNEL_INIT = nn.initializers.xavier_uniform()


def sinusoid_table(max_length: int, dim_model: int) -> np.ndarray:
    """Precomputed sinusoidal positional table (1 x max_length x dim)."""
    position = np.arange(max_length, dtype=np.float32)[:, None]
    exp_term = np.exp(
        np.arange(0, dim_model, 2, dtype=np.float32)
        * -(math.log(10000.0) / dim_model)
    )
    pe = np.zeros((max_length, dim_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * exp_term)
    pe[:, 1::2] = np.cos(position * exp_term)
    return pe[None]


class PositionalEncoding(nn.Module):
    dim_model: int
    max_length: int = 2000

    def setup(self):
        self.pe = jnp.asarray(sinusoid_table(self.max_length, self.dim_model))

    def __call__(self, length: int, offset=0) -> jnp.ndarray:
        return jax.lax.dynamic_slice_in_dim(self.pe, offset, length, axis=1)


class FactorizedDense(nn.Module):
    """Rank-r bottleneck linear: x @ W_a (no bias) @ W_b (+ bias).

    Parity: the `*_linear_a` / `*_linear_b` pairs in
    FactorizedMultiHeadAttention / FactorizedPositionwiseFeedForward
    (common_layers.py:238-306, :134-158). ``r=None`` degenerates to a single
    Dense (the unfactorized reference variants).
    """

    features: int
    r: Optional[int] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        if self.r is not None:
            self.a = nn.Dense(self.r, use_bias=False, kernel_init=KERNEL_INIT,
                              dtype=self.dtype)
            self.b = nn.Dense(self.features, use_bias=self.use_bias,
                              kernel_init=KERNEL_INIT, dtype=self.dtype)
        else:
            self.full = nn.Dense(self.features, use_bias=self.use_bias,
                                 kernel_init=KERNEL_INIT, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.r is not None:
            return self.b(self.a(x))
        return self.full(x)


class FeedForward(nn.Module):
    """Post-LN residual FFN; optionally rank-r factorized linears."""

    dim_model: int
    dim_ff: int
    dropout: float = 0.1
    factorized: bool = False
    r: int = 100
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        rank = self.r if self.factorized else None
        self.linear_1 = FactorizedDense(self.dim_ff, r=rank, dtype=self.dtype)
        self.linear_2 = FactorizedDense(self.dim_model, r=rank, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        # epsilon=1e-5: torch nn.LayerNorm default (cross-framework parity)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        h = self.linear_2(nn.relu(self.linear_1(x.astype(self.dtype))))
        h = self.drop(h, deterministic=deterministic)
        out = self.layer_norm(h.astype(jnp.float32) + residual.astype(jnp.float32))
        return out.astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """Rank-r factorized multi-head attention with post-LN residual."""

    num_heads: int
    dim_model: int
    dim_key: int
    dim_value: int
    dropout: float = 0.1
    r: Optional[int] = 100
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        H, Dk, Dv = self.num_heads, self.dim_key, self.dim_value
        self.query_linear = FactorizedDense(H * Dk, r=self.r, dtype=self.dtype)
        self.key_linear = FactorizedDense(H * Dk, r=self.r, dtype=self.dtype)
        self.value_linear = FactorizedDense(H * Dv, r=self.r, dtype=self.dtype)
        self.output_linear = FactorizedDense(
            self.dim_model, r=self.r, dtype=self.dtype
        )
        self.attn_drop = nn.Dropout(self.dropout)
        self.out_drop = nn.Dropout(self.dropout)
        # epsilon=1e-5: torch nn.LayerNorm default (cross-framework parity)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)

    # ---- head projections ------------------------------------------------
    def _q_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        return self.query_linear(x.astype(self.dtype)).reshape(
            B, T, self.num_heads, self.dim_key
        )

    def project_kv(
        self, key: jnp.ndarray, value: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project K/V heads once (e.g. the cross-attention decode cache)."""
        B, T, _ = key.shape
        k = self.key_linear(key.astype(self.dtype)).reshape(
            B, T, self.num_heads, self.dim_key
        )
        v = self.value_linear(value.astype(self.dtype)).reshape(
            B, T, self.num_heads, self.dim_value
        )
        return k, v

    def _attend(
        self,
        q: jnp.ndarray,  # B x T_q x H x Dk
        k: jnp.ndarray,  # B x T_k x H x Dk
        v: jnp.ndarray,  # B x T_k x H x Dv
        mask: Optional[jnp.ndarray],  # B x T_q x T_k bool, True = masked
        deterministic: bool,
    ) -> jnp.ndarray:
        B, T_q = q.shape[0], q.shape[1]
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(self.dim_key)
        if mask is not None:
            scores = jnp.where(mask[:, None, :, :], -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = self.attn_drop(attn, deterministic=deterministic)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return ctx.reshape(B, T_q, self.num_heads * self.dim_value)

    def _finish(
        self, ctx: jnp.ndarray, residual: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        out = self.output_linear(ctx)
        out = self.out_drop(out, deterministic=deterministic)
        out = self.layer_norm(
            out.astype(jnp.float32) + residual.astype(jnp.float32)
        )
        return out.astype(residual.dtype)

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cached_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        q = self._q_heads(query)
        if cached_kv is not None:
            k, v = cached_kv
        else:
            k, v = self.project_kv(key, value)
        ctx = self._attend(q, k, v, mask, deterministic)
        return self._finish(ctx, query, deterministic)

    def decode_step(
        self,
        query_t: jnp.ndarray,  # B x 1 x D — current token representation
        cache_k: jnp.ndarray,  # B x T_max x H x Dk — running self-attn cache
        cache_v: jnp.ndarray,  # B x T_max x H x Dv
        t,  # scalar step index
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One autoregressive self-attention step with an explicit KV cache.

        Mathematically identical to the reference's full-prefix re-forward
        (modules/decoder.py:145-161) because the block is causal and post-LN.
        Returns (output B x 1 x D, new cache_k, new cache_v).
        """
        B = query_t.shape[0]
        q = self._q_heads(query_t)  # B x 1 x H x Dk
        k_t, v_t = self.project_kv(query_t, query_t)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_t, t, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_t, t, axis=1)
        T_max = cache_k.shape[1]
        # Mask future (not-yet-written) cache slots.
        pos = jnp.arange(T_max)[None, None, :]  # 1 x 1 x T_max
        mask = jnp.broadcast_to(pos > t, (B, 1, T_max))
        ctx = self._attend(q, cache_k, cache_v, mask, deterministic=True)
        out = self._finish(ctx, query_t, deterministic=True)
        return out, cache_k, cache_v

    def cross_step(
        self,
        query_t: jnp.ndarray,  # B x 1 x D
        enc_k: jnp.ndarray,  # B x T_enc x H x Dk — precomputed
        enc_v: jnp.ndarray,  # B x T_enc x H x Dv
        mask: Optional[jnp.ndarray] = None,  # B x 1 x T_enc
    ) -> jnp.ndarray:
        """One cross-attention step against precomputed encoder K/V."""
        q = self._q_heads(query_t)
        ctx = self._attend(q, enc_k, enc_v, mask, deterministic=True)
        return self._finish(ctx, query_t, deterministic=True)
