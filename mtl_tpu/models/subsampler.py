"""Convolutional feature extractors (spectrogram subsamplers).

Parity: models/asr/transformer.py:38-72 —
* ``vgg_cnn``: 2 x [Conv3x3(SAME) -> ReLU -> Conv3x3(SAME) -> ReLU ->
  MaxPool2(VALID)] with 64 then 128 channels; time and freq both /4.
* ``large_cnn``: same shape with 32 then 64 channels.
* ``emb_cnn``: Conv(41x11, stride 2x2, pad (0,10)) -> BatchNorm -> Hardtanh
  [0,20] -> Conv(21x11, stride 2x1) -> BatchNorm -> Hardtanh.

Input here is time-major ``[B, T, F]`` (the natural layout for the attention
stack and the device STFT front-end); convs run in NHWC with H=freq, W=time to
match the reference's NCHW (1-channel, H=freq, W=time) geometry. Output is
``[B, T', F' * C]`` — the reference flattens channel-major
(models/asr/transformer.py:93), we flatten freq-major; the two differ by a
fixed permutation of the encoder input features, which is absorbed by the
(fresh-trained) input projection.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import KERNEL_INIT


def subsampled_length(feat_extractor: str, length: jnp.ndarray) -> jnp.ndarray:
    """Time-axis length after the conv front-end (floor semantics of torch
    MaxPool2d / strided conv)."""
    if feat_extractor in ("vgg_cnn", "large_cnn"):
        return length // 2 // 2
    if feat_extractor == "emb_cnn":
        # W axis: conv1 stride 2 pad 10 k=11; conv2 stride 1 k=11 no pad
        l1 = (length + 20 - 11) // 2 + 1
        return l1 - 11 + 1
    return length


def subsampled_freq(feat_extractor: str, num_freq: int) -> int:
    if feat_extractor in ("vgg_cnn", "large_cnn"):
        return num_freq // 2 // 2
    if feat_extractor == "emb_cnn":
        h = (num_freq - 41) // 2 + 1
        return (h - 21) // 2 + 1
    return num_freq


def output_channels(feat_extractor: str) -> int:
    return {"vgg_cnn": 128, "large_cnn": 64, "emb_cnn": 32}.get(feat_extractor, 1)


class _ConvParams(nn.Module):
    """Declares ``kernel``/``bias`` exactly like nn.Conv does (same names,
    shapes, inits) without building the conv — the fused-Pallas path reads
    them directly, so checkpoints are interchangeable with the XLA path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", KERNEL_INIT,
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _VGGBlockStack(nn.Module):
    channels: tuple
    dtype: jnp.dtype = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fused:
            # x: [B, T, F] -> [B, T//4, (F//4)*C2] via the fused Pallas
            # kernels (ops/vgg_pallas.py); param tree matches the nn.Conv
            # path (Conv_0..Conv_3).
            from ..ops.vgg_pallas import fused_vgg_stack, vgg_stack_reference

            ws, c_in = [], 1
            for idx, ch in enumerate(c for c in self.channels for _ in "xx"):
                ws.extend(_ConvParams(ch, c_in, name=f"Conv_{idx}")())
                c_in = ch
            # Both fused blocks need an 8-divisible time extent; block 2 runs
            # at T//2, so T must be a multiple of 16 (ADVICE r2: T = 8 mod 16
            # crashed _pick_t_tile at trace time). Same params either way.
            if x.shape[1] % 16:
                return vgg_stack_reference(x, *ws)
            return fused_vgg_stack(x, *ws)
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=KERNEL_INIT,
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=KERNEL_INIT,
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))  # VALID: floor(T/2)
        return x


class _EmbCNN(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(32, (41, 11), strides=(2, 2), padding=((0, 0), (10, 10)),
                    kernel_init=KERNEL_INIT, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = jnp.clip(x, 0.0, 20.0).astype(self.dtype)
        x = nn.Conv(32, (21, 11), strides=(2, 1), padding="VALID",
                    kernel_init=KERNEL_INIT, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = jnp.clip(x, 0.0, 20.0).astype(self.dtype)
        return x


class FeatureExtractor(nn.Module):
    """Dispatches on feat_extractor name; returns [B, T', D'] frames."""

    feat_extractor: str = "vgg_cnn"
    dtype: jnp.dtype = jnp.bfloat16
    fused: bool = False  # channel-leading Pallas VGG kernels (TPU)

    def setup(self):
        fused = self.fused and self.feat_extractor in ("vgg_cnn", "large_cnn")
        if self.feat_extractor == "vgg_cnn":
            self.conv = _VGGBlockStack((64, 128), dtype=self.dtype,
                                       fused=fused)
        elif self.feat_extractor == "large_cnn":
            self.conv = _VGGBlockStack((32, 64), dtype=self.dtype,
                                       fused=fused)
        elif self.feat_extractor == "emb_cnn":
            self.conv = _EmbCNN(dtype=self.dtype)
        elif self.feat_extractor in ("none", None, ""):
            self.conv = None
        else:
            raise ValueError(f"unknown feat_extractor {self.feat_extractor!r}")

    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """features: [B, T, F] -> [B, T', F'*C]."""
        if self.conv is None:
            return features
        if getattr(self.conv, "fused", False):
            # fused path consumes [B, T, F] directly (channel-leading
            # kernels; no NHWC transpose) and returns [B, T', F'*C].
            return self.conv(features)
        # NHWC with H=freq, W=time, C=1 (reference NCHW geometry).
        x = jnp.transpose(features, (0, 2, 1))[..., None].astype(self.dtype)
        if self.feat_extractor == "emb_cnn":
            x = self.conv(x, train=train)
        else:
            x = self.conv(x)
        # [B, F', T', C] -> [B, T', F'*C]
        B, Fp, Tp, C = x.shape
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, Tp, Fp * C)
