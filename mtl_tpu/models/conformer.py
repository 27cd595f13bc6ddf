"""Conformer encoder (stretch config — BASELINE.json configs[4]).

Not present in the reference (its encoder is a plain Transformer); this is
the scale-out encoder for the 17-layer d=1024 benchmark config. Standard
Conformer block (Gulati et al. 2020), TPU-first choices:

* macaron feed-forward halves (0.5x residual), pre-LN throughout;
* self-attention with rotary position embeddings (relative-position effect
  without the gather-heavy Transformer-XL bias tables — RoPE lowers to pure
  elementwise ops + the existing attention matmuls);
* convolution module: pointwise(2d)->GLU->depthwise(k=31)->norm->swish->
  pointwise, with LayerNorm instead of BatchNorm (no cross-batch state to
  shard, a standard substitution in JAX implementations);
* lengths-based masking identical to the rest of the stack.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masks import attn_pad_mask_from_lengths, non_pad_mask_from_lengths
from .layers import KERNEL_INIT


def rope_angles(t: int, dim: int) -> np.ndarray:
    """[T, dim/2] rotation angles, theta_i = 10000^{-2i/dim}."""
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = np.arange(t, dtype=np.float64)[:, None]
    return (pos * inv[None, :]).astype(np.float32)


def apply_rope(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; rotate feature pairs by position-dependent angles."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )


class ConformerFFN(nn.Module):
    dim_model: int
    expansion: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        h = nn.Dense(self.dim_model * self.expansion, kernel_init=KERNEL_INIT,
                     dtype=self.dtype)(h.astype(self.dtype))
        h = nn.swish(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConformerAttention(nn.Module):
    num_heads: int
    dim_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True):
        b, t, _ = x.shape
        h, dh = self.num_heads, self.dim_model // self.num_heads
        y = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        y = y.astype(self.dtype)
        q = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype, name="q")(y).reshape(b, t, h, dh)
        k = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype, name="k")(y).reshape(b, t, h, dh)
        v = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype, name="v")(y).reshape(b, t, h, dh)
        angles = jnp.asarray(rope_angles(t, dh))
        q = apply_rope(q, angles)
        k = apply_rope(k, angles)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, :, :], -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(self.dtype).reshape(b, t, self.dim_model)
        out = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                       dtype=self.dtype, name="out")(ctx)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class ConformerConvModule(nn.Module):
    dim_model: int
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True):
        h = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        h = h.astype(self.dtype)
        h = nn.Dense(2 * self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype, name="pw1")(h)
        h = nn.glu(h, axis=-1)
        if pad_mask is not None:  # keep padding zero before the depthwise conv
            h = h * pad_mask.astype(h.dtype)
        h = nn.Conv(self.dim_model, (self.kernel_size,), padding="SAME",
                    feature_group_count=self.dim_model,
                    kernel_init=KERNEL_INIT, dtype=self.dtype, name="dw")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            h.astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.swish(h)
        h = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype, name="pw2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    num_heads: int
    dim_model: int
    ff_expansion: int = 4
    conv_kernel: int = 31
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, non_pad_mask, attn_mask, deterministic=True):
        x = x + 0.5 * ConformerFFN(self.dim_model, self.ff_expansion,
                                   self.dropout, self.dtype, name="ff1")(
            x, deterministic)
        x = x + ConformerAttention(self.num_heads, self.dim_model,
                                   self.dropout, self.dtype, name="attn")(
            x, attn_mask, deterministic)
        x = x + ConformerConvModule(self.dim_model, self.conv_kernel,
                                    self.dropout, self.dtype, name="conv")(
            x, non_pad_mask, deterministic)
        x = x + 0.5 * ConformerFFN(self.dim_model, self.ff_expansion,
                                   self.dropout, self.dtype, name="ff2")(
            x, deterministic)
        return x * non_pad_mask.astype(x.dtype)


class ConformerEncoder(nn.Module):
    """Drop-in alternative to models/encoder.py:Encoder (same call shape)."""

    num_layers: int
    num_heads: int
    dim_model: int
    dim_input: int
    ff_expansion: int = 4
    conv_kernel: int = 31
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, padded_input, input_lengths, deterministic=True):
        t = padded_input.shape[1]
        non_pad_mask = non_pad_mask_from_lengths(input_lengths, t)
        attn_mask = attn_pad_mask_from_lengths(input_lengths, t, t)

        h = nn.Dense(self.dim_model, kernel_init=KERNEL_INIT,
                     dtype=self.dtype, name="input_linear")(
            padded_input.astype(self.dtype))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        block_cls = ConformerBlock
        if self.remat:
            # deterministic (arg 4: self, h, non_pad, attn, deterministic)
            # must stay a python bool through the remat boundary, same as
            # encoder.py:EncoderLayer remat.
            block_cls = nn.remat(ConformerBlock, static_argnums=(4,))
        for i in range(self.num_layers):
            h = block_cls(self.num_heads, self.dim_model, self.ff_expansion,
                          self.conv_kernel, self.dropout, self.dtype,
                          name=f"block_{i}")(h, non_pad_mask, attn_mask,
                                             deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(
            h.astype(jnp.float32)
        )
        return (h * non_pad_mask).astype(self.dtype)
