"""Fused Pallas TPU kernel: windowed DFT -> log1p magnitude.

The STFT is expressed as two real matmuls against a windowed DFT basis
(see ops/frontend.py:dft_matrices). This kernel runs both matmuls on the MXU
and fuses the magnitude + log1p epilogue on the VPU, writing the final
log-spectrogram once — one HBM round-trip instead of four (re, im, mag, log)
that an unfused lowering could produce.

Replaces the hot CPU path of the reference (librosa STFT per utterance,
utils/data_loader.py:82-87) on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stft_kernel(frames_ref, cos_ref, nsin_ref, out_ref):
    frames = frames_ref[:]  # [TILE_R, K]
    # full f32 accumulation: log1p amplifies bf16-pass error at small bins
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, nsin_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.log1p(jnp.sqrt(re * re + im * im))


@functools.partial(jax.jit, static_argnames=())
def stft_logmag_pallas(
    frames: jnp.ndarray,  # [B, T, n_fft] float32 (window NOT applied;
    cos_b: jnp.ndarray,  # [n_fft, F] windowed cos basis
    nsin_b: jnp.ndarray,  # [n_fft, F] windowed -sin basis
) -> jnp.ndarray:
    """Returns log1p(|STFT|) of shape [B, T, F]."""
    b, t, k = frames.shape
    f = cos_b.shape[1]

    rows = b * t
    tile_r = 256
    rows_p = _round_up(rows, tile_r)
    f_p = _round_up(f, 128)

    x = frames.reshape(rows, k)
    if rows_p != rows:
        x = jnp.pad(x, ((0, rows_p - rows), (0, 0)))
    cb = jnp.pad(cos_b, ((0, 0), (0, f_p - f))) if f_p != f else cos_b
    sb = jnp.pad(nsin_b, ((0, 0), (0, f_p - f))) if f_p != f else nsin_b

    grid = (rows_p // tile_r,)
    out = pl.pallas_call(
        _stft_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_p, f_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, f_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_p * k * f_p,
            bytes_accessed=rows_p * k * 4 + 2 * k * f_p * 4 + rows_p * f_p * 4,
            transcendentals=rows_p * f_p,
        ),
    )(x, cb, sb)
    return out[:rows, :f].reshape(b, t, f)
