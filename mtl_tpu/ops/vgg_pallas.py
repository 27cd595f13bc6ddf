"""Fused Pallas TPU kernels for the VGG blocks: conv3x3 -> relu -> conv3x3 ->
relu -> maxpool2x2 (reference models/asr/transformer.py:47-59).

STATUS (round 2): compiles and runs on real TPU. The round-1 T-major,
channel-minor design was blocked by two Mosaic limits on this image —
HBM->VMEM DMA requires the minor (lane) dim to be a 128-multiple (C=64
rejected), and 2D->3D minor-dim inserts are unsupported (killed the C_in=1
broadcast conv). This rewrite uses a **channel-leading layout** that
satisfies every constraint:

    activations [B, C, T, LANE]   C untiled, T sublanes, F on 128-mult lanes

* DMA slices touch only untiled/sublane dims at 8-aligned offsets with the
  lane dim always full and 128-aligned.
* conv f-shifts are lane `pltpu.roll`s (non-negative shifts only) with the
  wrap-around landing in zeroed junk lanes; t-shifts are plain sublane
  slices (verified legal at unaligned offsets).
* block-1 conv1 (C_in=1) is one K=9 MXU matmul over 9 stacked shifted
  slabs — no minor-dim broadcast needed.
* block-2 convs are 9 channel matmuls  W_k [C_out, C_in] @ slab_k
  [C_in, T*LANE]  (sublane x lane merges are legal when LANE % 128 == 0).
* 2x2 maxpool: T-pool by transposing C<->T and splitting the new leading
  dim (Mosaic cannot reshape-split a sublane dim); F-pool as
  max(z, roll(z, -1)) followed by an even-column 0/1 selection matmul
  (strided lane gathers are unsupported).

Why: the flagship meta step is HBM-bound (BASELINE.md roofline) and the
dominant traffic is the conv activations written/re-read at full 161x800
spectrogram resolution. These kernels keep a whole block's intermediates in
VMEM per (batch, time-tile) grid step: HBM sees only the block input read
and the pooled output write.

Math parity: SAME zero padding, bias, relu, VALID 2x2/stride-2 floor pool —
flax nn.Conv + nn.max_pool semantics (torch Conv2d/MaxPool2d parity).
Weights arrive as flax HWIO [3(f), 3(t), C_in, C_out].

Column convention: inside a block, extended activations store f at column
f+1 (column 0 is the SAME-conv left halo); block inputs/outputs store f at
column f. Junk lanes are kept at zero so roll wrap-around reads zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run the kernels in interpreter mode (tests on non-TPU hosts).
INTERPRET = False


def _round(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _pick_t_tile(t_img: int, cap: int = 32) -> int:
    """Largest multiple-of-8 tile <= cap dividing t_img (VMEM-bounded)."""
    tile = cap
    while tile >= 8:
        if t_img % tile == 0:
            return tile
        tile -= 8
    raise ValueError(f"T={t_img} not tileable (need a multiple of 8)")


def _edge_mask(shape2, base, t_img, f_img):
    """[rows, lanes] 0/1 mask: row j is real iff 0 <= base+j-1 < t_img,
    col i is real iff 1 <= i <= f_img (col = f+1 convention)."""
    tj = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    fi = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    t_g = tj + base - 1
    return ((t_g >= 0) & (t_g < t_img)
            & (fi >= 1) & (fi <= f_img)).astype(jnp.float32)


def _select_even(lane: int, lane_out: int, n_pool: int):
    """0/1 [lane, lane_out] matmul operand: out[:, j] = in[:, 2j], j<n_pool."""
    li = jax.lax.broadcasted_iota(jnp.int32, (lane, lane_out), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (lane, lane_out), 1)
    return ((li == 2 * lj) & (lj < n_pool)).astype(jnp.float32)


def _relu_pool_write(z2m, b2_ref, c, t_tile, lane, f_img, o_ref):
    """z2m [C, t_tile*LANE] f32 (cols = f) -> +bias, relu, 2x2 floor pool ->
    o_ref[0] [C, t_tile//2, LANE_OUT] (junk cols forced to zero by the
    selection matmul)."""
    z = jnp.maximum(z2m.reshape(c, t_tile, lane) + b2_ref[:], 0.0)
    # T-pool: transpose C<->T, split the (now leading) T dim, max, restore.
    zt = jnp.transpose(z, (1, 0, 2))
    zt = jnp.max(zt.reshape(t_tile // 2, 2, c, lane), axis=1)
    z = jnp.transpose(zt, (1, 0, 2))  # [C, t2, LANE] f32 (32-bit rolls)
    # F-pool: adjacent max then even-column selection on the MXU.
    m = jnp.maximum(z, pltpu.roll(z, lane - 1, 2))
    t2 = t_tile // 2
    lane_out = o_ref.shape[-1]
    sel = _select_even(lane, lane_out, f_img // 2)
    out = jnp.dot(m.reshape(c * t2, lane), sel,
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(c, t2, lane_out).astype(o_ref.dtype)


def _b1_kernel(f_img, t_img, t_tile, lane,
               x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    """VGG block with C_in == 1. x_ref: one halo window [1, 1, t_tile+8,
    LANE] f32 (windows pre-gathered by XLA so the blocks are standard
    non-overlapping VMEM tiles — pipelined, and vmap-batchable): row r =
    x[t = base + r - 2], col i = x[f = i-1]. w1 [C, 9] (k = dt*3+df),
    w2 [9, C, C] (w2[k] = [C_out, C_in])."""
    ti = pl.program_id(1)
    base = ti * t_tile
    x = x_ref[0, 0]  # [t_tile+8, LANE]
    te = t_tile + 8          # extended rows (8-mult for legal merges)
    c = w1_ref.shape[0]

    # conv1: slab_{dt,df}[j, i] = x[t=base+j+dt-2, f=i+df-2] = rolled xbuf.
    slabs = []
    for dt in range(3):
        xs = x if dt == 0 else jnp.concatenate(
            [x[dt:], jnp.zeros((dt, lane), x.dtype)], axis=0)
        for df in range(3):
            slabs.append(pltpu.roll(xs, (1 - df) % lane, 1))
    xs9 = jnp.stack(slabs, axis=0).reshape(9, te * lane)
    y1 = jnp.dot(w1_ref[:], xs9, preferred_element_type=jnp.float32)
    y1 = y1.reshape(c, te, lane) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0)
    # SAME conv2 must see zeros outside the image (relu(bias) != 0 there).
    # f32 throughout: Mosaic's lane rotate is 32-bit only; the MXU reads
    # f32 operands through its bf16 path at default precision anyway.
    y1 = y1 * _edge_mask((te, lane), base, t_img, f_img)[None]

    # conv2: z2[c, j2, i] at t=base+j2, f=i; input col = i + df.
    z2 = jnp.zeros((c, t_tile * lane), jnp.float32)
    for dt in range(3):
        ys = y1[:, dt:dt + t_tile, :]
        for df in range(3):
            slab = ys if df == 0 else pltpu.roll(ys, (lane - df) % lane, 2)
            z2 = z2 + jnp.dot(w2_ref[dt * 3 + df],
                              slab.reshape(c, t_tile * lane),
                              preferred_element_type=jnp.float32)
    _relu_pool_write(z2, b2_ref, c, t_tile, lane, f_img, o_ref)


def _b2_kernel(f_img, t_img, t_tile, lane, c_in,
               y_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    """VGG block with C_in > 1. y_ref: one halo window [1, 1, C_in,
    t_tile+8, LANE] bf16 (row r = t = base + r - 2, col i = f = i, junk
    cols zero). w1/w2 [9, C_out, C_in]."""
    ti = pl.program_id(1)
    base = ti * t_tile
    y = y_ref[0, 0].astype(jnp.float32)  # [C_in, te, LANE] (32-bit rolls)
    te = t_tile + 8
    c = w1_ref.shape[1]

    # conv1: y1[c, j, i] at t=base+j-1, f=i-1; input col = i + df - 2.
    y1m = jnp.zeros((c, te * lane), jnp.float32)
    for dt in range(3):
        ys = y if dt == 0 else jnp.concatenate(
            [y[:, dt:, :], jnp.zeros((c_in, dt, lane), y.dtype)], axis=1)
        for df in range(3):
            slab = ys if df == 2 else pltpu.roll(ys, 2 - df, 2)
            y1m = y1m + jnp.dot(w1_ref[dt * 3 + df],
                                slab.reshape(c_in, te * lane),
                                preferred_element_type=jnp.float32)
    y1 = y1m.reshape(c, te, lane) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0)
    y1 = y1 * _edge_mask((te, lane), base, t_img, f_img)[None]

    z2 = jnp.zeros((c, t_tile * lane), jnp.float32)
    for dt in range(3):
        ys = y1[:, dt:dt + t_tile, :]
        for df in range(3):
            slab = ys if df == 0 else pltpu.roll(ys, (lane - df) % lane, 2)
            z2 = z2 + jnp.dot(w2_ref[dt * 3 + df],
                              slab.reshape(c, t_tile * lane),
                              preferred_element_type=jnp.float32)
    _relu_pool_write(z2, b2_ref, c, t_tile, lane, f_img, o_ref)


def _w_cl(w):
    """flax HWIO [3(f), 3(t), C_in, C_out] -> [9, C_out, C_in], k=dt*3+df."""
    return jnp.transpose(w, (1, 0, 3, 2)).reshape(9, w.shape[3], w.shape[2])


def _out_lane(f_img: int) -> int:
    # pooled width + 2 so the next block's rolls wrap into zeroed junk
    return _round(f_img // 2 + 2, 128)


def vgg_block1_cl(x, w1, b1, w2, b2, out_dtype=jnp.bfloat16,
                  interpret=None):
    """Fused block, C_in == 1, channel-leading I/O.

    x [B, T, F] -> [B, C, T//2, LANE_OUT] (col = pooled f, junk cols zero).
    """
    interpret = INTERPRET if interpret is None else interpret
    b, t_img, f_img = x.shape
    c = w1.shape[-1]
    t_tile = _pick_t_tile(t_img)
    lane = _round(f_img + 2, 128)
    lane_out = _out_lane(f_img)

    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (2, 6), (1, lane - f_img - 1)))
    n_t = t_img // t_tile
    te = t_tile + 8
    # overlapping halo windows gathered by XLA (cheap: input is small) so
    # the kernel sees standard non-overlapping blocks
    idx = jnp.arange(n_t)[:, None] * t_tile + jnp.arange(te)[None, :]
    xw = xp[:, idx, :]  # [B, n_t, te, LANE]
    w1k = jnp.transpose(w1.reshape(3, 3, c), (2, 1, 0)).reshape(c, 9)
    w2k = _w_cl(w2)
    b1c = b1.astype(jnp.float32).reshape(c, 1, 1)
    b2c = b2.astype(jnp.float32).reshape(c, 1, 1)
    kernel = functools.partial(_b1_kernel, f_img, t_img, t_tile, lane)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, t_img // 2, lane_out),
                                       out_dtype),
        grid=(b, n_t),
        in_specs=[pl.BlockSpec((1, 1, te, lane),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(a.shape,
                         functools.partial(lambda n, bi, ti: (0,) * n,
                                           a.ndim),
                         memory_space=pltpu.VMEM)
            for a in (w1k, b1c, w2k, b2c)
        ],
        out_specs=pl.BlockSpec((1, c, t_tile // 2, lane_out),
                               lambda bi, ti: (bi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_img * t_img * 9 * c * (1 + c),
            bytes_accessed=int(xw.size * 4
                               + b * c * (t_img // 2) * lane_out * 2),
            transcendentals=0,
        ),
    )(xw, w1k, b1c, w2k, b2c)


def vgg_block2_cl(y, f_img, w1, b1, w2, b2, out_dtype=jnp.bfloat16,
                  interpret=None):
    """Fused block, C_in > 1, channel-leading I/O.

    y [B, C_in, T, LANE] (col = f, cols >= f_img zero, LANE >= f_img+2)
    -> [B, C_out, T//2, LANE_OUT].
    """
    interpret = INTERPRET if interpret is None else interpret
    b, c_in, t_img, lane = y.shape
    if lane % 128 or lane < f_img + 2:
        raise ValueError(f"LANE {lane} must be 128-mult and >= F+2={f_img+2}")
    c = w1.shape[-1]
    t_tile = _pick_t_tile(t_img)
    lane_out = _out_lane(f_img)

    yp = jnp.pad(y.astype(jnp.bfloat16), ((0, 0), (0, 0), (2, 6), (0, 0)))
    n_t = t_img // t_tile
    te = t_tile + 8
    idx = jnp.arange(n_t)[:, None] * t_tile + jnp.arange(te)[None, :]
    # [B, C, T+8, L] -> windows [B, n_t, C, te, L]
    yw = jnp.transpose(yp[:, :, idx, :], (0, 2, 1, 3, 4))
    kernel = functools.partial(_b2_kernel, f_img, t_img, t_tile, lane, c_in)
    w1k, w2k = _w_cl(w1), _w_cl(w2)
    b1c = b1.astype(jnp.float32).reshape(c, 1, 1)
    b2c = b2.astype(jnp.float32).reshape(c, 1, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, t_img // 2, lane_out),
                                       out_dtype),
        grid=(b, n_t),
        in_specs=[pl.BlockSpec((1, 1, c_in, te, lane),
                               lambda bi, ti: (bi, ti, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(a.shape,
                         functools.partial(lambda n, bi, ti: (0,) * n,
                                           a.ndim),
                         memory_space=pltpu.VMEM)
            for a in (w1k, b1c, w2k, b2c)
        ],
        out_specs=pl.BlockSpec((1, c, t_tile // 2, lane_out),
                               lambda bi, ti: (bi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_img * t_img * 9 * c * (c_in + c),
            bytes_accessed=int(yw.size * 2
                               + b * c * (t_img // 2) * lane_out * 2),
            transcendentals=0,
        ),
    )(yw, w1k, b1c, w2k, b2c)


# ---------------------------------------------------------------------------
# T-major single-block interface (tests + VJP reference)
# ---------------------------------------------------------------------------


def vgg_block_forward_pallas(
    x: jnp.ndarray,  # [B, T, F] (C_in==1) or [B, T, F, C_in], T-major
    w1: jnp.ndarray,  # [3, 3, C_in, C] (HWIO, H=f W=t)
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [3, 3, C, C]
    b2: jnp.ndarray,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns [B, T//2, F//2, C] (T-major). Transposes at the boundary;
    use fused_vgg_stack to keep the channel-leading layout across blocks."""
    c_in = w1.shape[2]
    if c_in == 1:
        b, t_img, f_img = x.shape[:3]
        out = vgg_block1_cl(x.reshape(b, t_img, f_img), w1, b1, w2, b2,
                            out_dtype=out_dtype, interpret=interpret)
    else:
        b, t_img, f_img, _ = x.shape
        lane = _round(f_img + 2, 128)
        ycl = jnp.pad(jnp.transpose(x, (0, 3, 1, 2)),
                      ((0, 0), (0, 0), (0, 0), (0, lane - f_img)))
        out = vgg_block2_cl(ycl, f_img, w1, b1, w2, b2,
                            out_dtype=out_dtype, interpret=interpret)
    # [B, C, T/2, LANE_OUT] -> [B, T/2, F/2, C]
    return jnp.transpose(out[:, :, :, : f_img // 2], (0, 2, 3, 1))


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


# ---------------------------------------------------------------------------
# Full two-block stack (the model integration point): activations stay
# channel-leading between the blocks; one cheap transpose on the small
# pooled output. Backward recomputes through the XLA reference (remat
# semantics); a fused backward kernel is the next optimization.
# ---------------------------------------------------------------------------


def vgg_stack_reference(x, w1a, b1a, w2a, b2a, w1b, b1b, w2b, b2b):
    """[B, T, F] -> [B, T//4, (F//4) * C2] via the XLA reference blocks.
    Flatten order is (f, c) f-major — matches FeatureExtractor."""
    y = vgg_block_reference(x, w1a, b1a, w2a, b2a)
    y = vgg_block_reference(y, w1b, b1b, w2b, b2b)
    b, t4, f4, c2 = y.shape
    return y.reshape(b, t4, f4 * c2)


def _stack_fwd_impl(x, w1a, b1a, w2a, b2a, w1b, b1b, w2b, b2b):
    b, t_img, f_img = x.shape
    y1 = vgg_block1_cl(x, w1a, b1a, w2a, b2a, interpret=INTERPRET)
    f2 = f_img // 2
    y2 = vgg_block2_cl(y1, f2, w1b, b1b, w2b, b2b, interpret=INTERPRET)
    c2 = w1b.shape[-1]
    f4 = f2 // 2
    out = jnp.transpose(y2[:, :, :, :f4], (0, 2, 3, 1))  # [B, T4, F4, C2]
    return out.reshape(b, t_img // 4, f4 * c2)


@jax.custom_vjp
def fused_vgg_stack(x, w1a, b1a, w2a, b2a, w1b, b1b, w2b, b2b):
    """Fused two-block VGG subsampler: [B, T, F] -> [B, T//4, (F//4)*C2]."""
    return _stack_fwd_impl(x, w1a, b1a, w2a, b2a, w1b, b1b, w2b, b2b)


def _stack_fwd(x, *w):
    return _stack_fwd_impl(x, *w), (x, w)


def _stack_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(vgg_stack_reference, x, *w)
    grads = vjp(g.astype(jnp.bfloat16))
    return (grads[0].astype(x.dtype),) + tuple(grads[1:])


fused_vgg_stack.defvjp(_stack_fwd, _stack_bwd)
