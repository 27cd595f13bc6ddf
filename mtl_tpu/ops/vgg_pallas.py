"""Fused Pallas TPU kernels for a VGG block: conv3x3 -> relu -> conv3x3 ->
relu -> maxpool2x2.

STATUS (round 1): correctness-verified in interpreter mode (tests/
test_vgg_pallas.py) and kept as groundwork, NOT yet wired into the model.
On this image's Mosaic, HBM->VMEM DMA slices require the minor (lane) dim to
be a 128-multiple — the C_in=1 (block 1) and C=64 (block 2) inputs that
carry ~80% of the flagship step's HBM traffic are both rejected
("Slice shape along dimension 3 must be aligned to tiling (128)"), and
padding channels to 128 erases the traffic saving. Also hit and worked
around: sublane-dim slices need 8/16-alignment (junk-padded windows),
reshape merges need tiling-aligned minor-2 dims (F padded to 16-multiples),
and 2D->3D minor-dim inserts that move lanes are unsupported (f-lane
broadcast conv rewritten as channel-lane matmuls). Round-2 options: a newer
Mosaic, double-buffered 128-wide channel-padded tiles with different
economics, or neighbor-block in_specs instead of manual DMA.

Why: the flagship meta step is HBM-bound (BASELINE.md roofline) and ~80% of
its 57.6 GB of traffic is the conv activations written/re-read at full
161x800 spectrogram resolution. These kernels keep the whole block's
intermediates in VMEM per (batch, time-tile) grid step: HBM sees only the
block input read and the pooled output write — intermediate activations
never round-trip.

Layout is **T-major**: block-1 input is [B, T, F] (2-D per sample, F in
lanes) and block-2 input/outputs are [B, T, F, C] (C in lanes). T lives on
untiled/sublane dims so the overlapping halo windows each tile DMAs are
legal Mosaic slices (lane-dim slices must be 128-aligned, which killed an
F-major design with C_in=1). T-major also matches what the encoder wants, so
the fused path drops the subsampler's transpose entirely.

Math parity: conv = 9 shifted matmuls (or broadcast outer-products for
C_in=1), SAME zero padding, bias, relu, VALID 2x2/stride-2 floor pool —
flax nn.Conv + nn.max_pool semantics (torch Conv2d/MaxPool2d parity).

Weights arrive as [9, C_in, C] (flattened HWIO, H=f-offset major).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2  # two fused 3x3 convs


def _mask_ext(y1, ti, t_tile, t_img, f_img):
    """Zero y1_ext positions outside the image (incl. alignment junk
    columns): SAME conv2 must see zeros, not relu(b1). y1_ext[j, i] is image
    (t = ti*t_tile + j - 1, f = i - 1)."""
    shape2 = y1.shape[:2]
    tj = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    fi = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    t_global = tj + ti * t_tile - 1
    inside = ((fi >= 1) & (fi <= f_img)
              & (t_global >= 0) & (t_global < t_img))
    return y1 * inside.astype(jnp.float32)[:, :, None]


def _pool_write(z2, out_ref, t_tile, f_img, dtype):
    """relu'd z2 [t_tile, F, C] -> 2x2 floor pool -> out_ref[0]."""
    f_p = f_img // 2
    t_p = t_tile // 2
    y = z2[:, : f_p * 2].reshape(t_p, 2, f_p, 2, z2.shape[-1])
    out_ref[0] = jnp.max(jnp.max(y, axis=3), axis=1).astype(dtype)


def _round16(v: int) -> int:
    return ((v + 15) // 16) * 16


def _fwd_kernel_cin1(f_img: int, t_img: int, t_tile: int,
                     x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                     xbuf, sem):
    """C_in == 1 (vgg block 1). x_hbm: [B, T+8, XP_F] f32 (globally
    zero-padded by 2, junk right-padding for 8-aligned windows and 16-aligned
    reshape merges — Mosaic can only merge tiling-aligned dims).
    conv1 is 9 broadcast outer-products (no K=1 matmuls)."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_tile, t_tile + 8), :], xbuf, sem
    )
    cp.start()
    cp.wait()
    x = xbuf[:]  # [t_tile+8, XP_F]

    f_z2 = _round16(f_img)           # merged-F width for the conv2 matmul
    f_y1 = f_z2 + 2                  # y1 extended width
    c = w1_ref.shape[-1]
    y1 = jnp.zeros((t_tile + 2, f_y1, c), jnp.float32)
    for df in range(3):
        for dt in range(3):
            slab = x[dt:dt + t_tile + 2, df:df + f_y1]
            y1 = y1 + (slab[:, :, None].astype(jnp.float32)
                       * w1_ref[df * 3 + dt, 0][None, None, :])
    y1 = jnp.maximum(y1 + b1_ref[0].reshape(1, 1, -1), 0.0)
    y1 = _mask_ext(y1, ti, t_tile, t_img, f_img).astype(jnp.bfloat16)

    z2 = jnp.zeros((t_tile * f_z2, c), jnp.float32)
    for df in range(3):
        for dt in range(3):
            slab = y1[dt:dt + t_tile, df:df + f_z2, :].reshape(
                t_tile * f_z2, c
            )
            z2 = z2 + jnp.dot(slab, w2_ref[df * 3 + dt].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
    z2 = jnp.maximum(
        z2.reshape(t_tile, f_z2, c) + b2_ref[0].reshape(1, 1, -1), 0.0
    )
    _pool_write(z2, out_ref, t_tile, f_img, out_ref.dtype)


def _fwd_kernel_cinN(f_img: int, t_img: int, t_tile: int,
                     x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                     xbuf, sem):
    """General C_in (vgg block 2). x_hbm: [B, T+4, F+4, C_in] bf16; T on an
    untiled dim, so the halo window slice has no alignment constraints."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_tile, t_tile + 4), :, :], xbuf, sem
    )
    cp.start()
    cp.wait()
    x = xbuf[:]  # [t_tile+4, F+4, C_in]

    c_in = x.shape[-1]
    c = w1_ref.shape[-1]
    f_z2 = _round16(f_img)
    f_y1 = f_z2 + 2
    y1 = jnp.zeros(((t_tile + 2) * f_y1, c), jnp.float32)
    for df in range(3):
        for dt in range(3):
            slab = x[dt:dt + t_tile + 2, df:df + f_y1, :].reshape(
                (t_tile + 2) * f_y1, c_in
            )
            y1 = y1 + jnp.dot(slab, w1_ref[df * 3 + dt].astype(x.dtype),
                              preferred_element_type=jnp.float32)
    y1 = y1.reshape(t_tile + 2, f_y1, c)
    y1 = jnp.maximum(y1 + b1_ref[0].reshape(1, 1, -1), 0.0)
    y1 = _mask_ext(y1, ti, t_tile, t_img, f_img).astype(jnp.bfloat16)

    z2 = jnp.zeros((t_tile * f_z2, c), jnp.float32)
    for df in range(3):
        for dt in range(3):
            slab = y1[dt:dt + t_tile, df:df + f_z2, :].reshape(
                t_tile * f_z2, c
            )
            z2 = z2 + jnp.dot(slab, w2_ref[df * 3 + dt].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
    z2 = jnp.maximum(
        z2.reshape(t_tile, f_z2, c) + b2_ref[0].reshape(1, 1, -1), 0.0
    )
    _pool_write(z2, out_ref, t_tile, f_img, out_ref.dtype)


def _pick_t_tile(t_img: int, c_out: int) -> int:
    tile = 128 if c_out <= 64 else 64
    while t_img % tile != 0 or tile % 8 != 0:
        tile //= 2
        if tile < 8:
            raise ValueError(f"T={t_img} not tileable (need multiple of 8)")
    return tile


def vgg_block_forward_pallas(
    x: jnp.ndarray,  # [B, T, F] (C_in==1) or [B, T, F, C_in], T-major
    w1: jnp.ndarray,  # [3, 3, C_in, C] (HWIO, H=f W=t)
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [3, 3, C, C]
    b2: jnp.ndarray,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns [B, T//2, F//2, C] (T-major)."""
    c_in = w1.shape[2]
    c = w1.shape[-1]
    if c_in == 1:
        b, t_img, f_img = x.shape[:3]
    else:
        b, t_img, f_img, _ = x.shape
    t_tile = _pick_t_tile(t_img, c)

    w1f = w1.reshape(9, c_in, c).astype(jnp.float32)
    w2f = w2.reshape(9, c, c).astype(jnp.float32)
    b1f = b1.astype(jnp.float32).reshape(1, c)
    b2f = b2.astype(jnp.float32).reshape(1, c)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, t_img // 2, f_img // 2, c),
                                       out_dtype),
        grid=(b, t_img // t_tile),
        out_specs=pl.BlockSpec((1, t_tile // 2, f_img // 2, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_img * t_img * 9 * c * (c_in + c),
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + b * (f_img // 2) * (t_img // 2) * c * 2),
            transcendentals=0,
        ),
    )
    w_specs = [
        pl.BlockSpec((9, c_in, c), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, c, c), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
    ]

    # F right-padding: reach the 16-aligned merge width (+2 slab reach),
    # then round the stored width up to the memref tiling (Mosaic checks
    # alignment even on full-dim slices): lanes (cin1 2-D layout) need 128,
    # sublanes (cinN 4-D layout) need 32.
    def _round(v, m):
        return ((v + m - 1) // m) * m

    if c_in == 1:
        xp_f = _round(_round16(f_img) + 4, 128)
        x2 = x.reshape(b, t_img, f_img).astype(jnp.float32)
        # T: left pad 2, right pad 6 so [ti*t_tile, +t_tile+8) windows fit
        xp = jnp.pad(x2, ((0, 0), (HALO, HALO + 4), (HALO, xp_f - f_img - 2)))
        kernel = functools.partial(_fwd_kernel_cin1, f_img, t_img, t_tile)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
            scratch_shapes=[
                pltpu.VMEM((t_tile + 8, xp_f), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            **common,
        )(xp, w1f, b1f, w2f, b2f)

    xp_f = _round(_round16(f_img) + 4, 32)
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (HALO, HALO), (HALO, xp_f - f_img - 2), (0, 0)))
    kernel = functools.partial(_fwd_kernel_cinN, f_img, t_img, t_tile)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
        scratch_shapes=[
            pltpu.VMEM((t_tile + 4, xp_f, c_in), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        **common,
    )(xp, w1f, b1f, w2f, b2f)


def vgg_block_reference(x, w1, b1, w2, b2):
    """XLA reference in the same T-major layout ([B, T, F(, C_in)] ->
    [B, T//2, F//2, C]); flax nn.Conv semantics. Used for tests and the VJP."""
    if x.ndim == 3:
        x = x[..., None]
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, x.shape[-1],
                                                  w1.shape[-1]),
                                        ("NHWC", "HWIO", "NHWC"))
    # T-major: spatial dims are (T, F) but the weights are (f, t) HWIO —
    # swap the weight spatial axes
    w1t = jnp.swapaxes(w1, 0, 1)
    w2t = jnp.swapaxes(w2, 0, 1)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w1t.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=dn)
    y = jnp.maximum(y + b1.reshape(1, 1, 1, -1), 0.0)
    dn2 = jax.lax.conv_dimension_numbers(y.shape, w2t.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        y, w2t.astype(jnp.float32), (1, 1), "SAME", dimension_numbers=dn2)
    y = jnp.maximum(y + b2.reshape(1, 1, 1, -1), 0.0)
    b_, t_, f_, c_ = y.shape
    y = y[:, : t_ // 2 * 2, : f_ // 2 * 2]
    y = y.reshape(b_, t_ // 2, 2, f_ // 2, 2, c_)
    return jnp.max(jnp.max(y, axis=4), axis=2).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# custom VJP: fused forward; backward recomputes via the XLA reference under
# remat semantics (a fully fused backward kernel is the next optimization).
# ---------------------------------------------------------------------------

# Set True to run the kernels in interpreter mode (tests on non-TPU hosts).
INTERPRET = False


@jax.custom_vjp
def fused_vgg_block(x, w1, b1, w2, b2):
    return vgg_block_forward_pallas(x, w1, b1, w2, b2, interpret=INTERPRET)


def _fwd(x, w1, b1, w2, b2):
    return (vgg_block_forward_pallas(x, w1, b1, w2, b2, interpret=INTERPRET),
            (x, w1, b1, w2, b2))


def _bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(vgg_block_reference, x, w1, b1, w2, b2)
    dx, dw1, db1, dw2, db2 = vjp(g.astype(jnp.bfloat16))
    return dx.astype(x.dtype).reshape(x.shape), dw1, db1, dw2, db2


fused_vgg_block.defvjp(_fwd, _bwd)
