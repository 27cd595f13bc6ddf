"""Fused Pallas TPU kernels for the VGG blocks: conv3x3 -> relu -> conv3x3 ->
relu -> maxpool2x2 (reference models/asr/transformer.py:47-59).

Layout (v2): activations are **[T(untiled), F(sublane), C(lane)]** per
(batch, time-tile) grid step. This is the layout where a 3x3 conv's data
reuse is cheapest under this image's Mosaic constraints:

* the three t-shifts of every tap are FREE leading-dim slices (untiled dims
  just select vector registers — no data movement);
* the three f-shifts are applied AFTER the channel matmul (an input shift
  commutes with channel mixing), so each conv needs two sublane
  `pltpu.roll`s of the accumulator instead of six shifted input copies;
* channel contraction is a plain MXU matmul on the merged [(T*F), C_in]
  view (untiled x sublane merges and major-dim splits are legal);
* 2x2 maxpool: T-pool by a leading-dim reshape-split (free) + max; F-pool
  as max(z, roll(z, -1)) followed by an even-row selection einsum on the
  MXU (strided sublane gathers are unsupported);
* C on lanes means biases broadcast from natural lane vectors and no
  lane-padding waste.

History: the round-2a channel-leading [C, T, F-on-128-lanes] design also
compiled and was numerically correct, but moved ~45-60 MB of VMEM traffic
per [64, 32, 256] tile through rolls/slices/transposes — measured slower
than XLA's native conv (BASELINE.md). The round-1 T-major channel-minor
design never compiled (DMA lane dims must be 128-multiples; 2D->3D
minor-dim inserts unsupported). Other Mosaic limits worked around here:
lane/sublane rotates are 32-bit only (activations stay f32 in-kernel; the
MXU reads f32 through its bf16 path at default precision anyway); no
sublane reshape-splits; no strided gathers; thin 2D transposes ARE
supported (used once for the C_in=1 tap-stack matmul).

Indexing conventions inside a block (base = ti * t_tile):
* extended ("E") tensors: row j <-> t = base + j - 1, col i <-> f = i - 1
  (one halo row/col at index 0; junk cols stay zero so roll wrap-around
  reads zeros);
* input windows: row r <-> t = base + r - 2 (two halo rows — gathered by
  XLA into non-overlapping blocks so Pallas pipelining and vmap work);
* block outputs: row = pooled t direct, col g <-> pooled f = g - 1 (the
  next block consumes the same convention).

Math parity: SAME zero padding, bias, relu, VALID 2x2/stride-2 floor pool —
flax nn.Conv + nn.max_pool semantics (torch Conv2d/MaxPool2d parity).
Weights arrive as flax HWIO [3(f), 3(t), C_in, C_out].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run the kernels in interpreter mode (tests on non-TPU hosts).
INTERPRET = False

# Grid steps are independent (parallel) in both dims; the default 16 MB
# scoped-vmem cap is raised — v5e has 128 MiB of VMEM and the t_tile=40
# tiles peak around ~26 MB of live values.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _round(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _pick_t_tile(t_img: int, cap: int = 48) -> int:
    """Largest multiple-of-8 tile <= cap dividing t_img (VMEM-bounded)."""
    tile = cap - cap % 8
    while tile >= 8:
        if t_img % tile == 0:
            return tile
        tile -= 8
    raise ValueError(f"T={t_img} not tileable (need a multiple of 8)")


def _w9(w):
    """flax HWIO [3(f), 3(t), C_in, C_out] -> [9, C_in, C_out], k=dt*3+df."""
    return jnp.transpose(w, (1, 0, 2, 3)).reshape(9, w.shape[2], w.shape[3])


def _mask_e(te, f_pad, base, t_img, f_img):
    """[te, f_pad, 1] 0/1 mask for an E tensor: real iff 0 <= t < t_img and
    1 <= i <= f_img. SAME convs must see zeros outside the image
    (relu(bias) != 0 there)."""
    tj = jax.lax.broadcasted_iota(jnp.int32, (te, f_pad), 0)
    fi = jax.lax.broadcasted_iota(jnp.int32, (te, f_pad), 1)
    t_g = tj + base - 1
    return ((t_g >= 0) & (t_g < t_img)
            & (fi >= 1) & (fi <= f_img)).astype(jnp.float32)[:, :, None]


def _extend_rows(x, rows):
    extra = rows - x.shape[0]
    if extra <= 0:
        return x[:rows]
    return jnp.concatenate(
        [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], axis=0)


def _conv3x3(e_in, w_ref, r_out, c0):
    """3x3 conv with f-shifts applied after the channel matmul:

        out[j, i] = sum_{dt, df} e_in[j + dt, i + df - c0] @ W[dt*3 + df]

    e_in [RE, F_PAD, C_in] f32 with RE >= r_out + 2 (callers zero-extend;
    junk tail rows only feed output rows the consumer ignores). The dt
    slices are free untiled-dim selections; the df shift is a sublane roll
    of the [r_out, F_PAD, C_out] accumulator (wrap lands in junk cols,
    which upstream masking keeps zero). c0=1 yields E-convention output
    (rows t = base+j-1 when e_in rows are t = base+j-2); c0=0 yields
    direct rows/cols for the pool (e_in = the E-convention conv1 output).
    """
    f_pad = e_in.shape[1]
    c_in = e_in.shape[2]
    c = w_ref.shape[-1]
    z = None
    for df in range(3):
        a = None
        for dt in range(3):
            p = jax.lax.dot_general(
                e_in[dt:dt + r_out], w_ref[dt * 3 + df],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = p if a is None else a + p
        s = (c0 - df) % f_pad
        if s:
            a = pltpu.roll(a, s, 1)
        z = a if z is None else z + a
    return z


def _sel_pool(f_pad: int, g_pad: int, n_pool: int):
    """0/1 [g_pad, f_pad]: output row g picks f = 2*(g-1) for 1 <= g <=
    n_pool (output col convention: col g <-> pooled f = g - 1; col 0 and
    junk cols come out zero for the next block's halo/wrap reads)."""
    fi = jax.lax.broadcasted_iota(jnp.int32, (g_pad, f_pad), 1)
    gi = jax.lax.broadcasted_iota(jnp.int32, (g_pad, f_pad), 0)
    return ((fi == 2 * (gi - 1)) & (gi >= 1)
            & (gi <= n_pool)).astype(jnp.float32)


def _relu_pool_write(z, b_ref, t_tile, f_img, o_ref):
    """z [t_tile, F_PAD, C] pre-bias, rows/cols direct. relu(z+b) -> 2x2
    floor pool -> o_ref[0] [t_tile//2, G_PAD, C]."""
    f_pad = z.shape[1]
    c = z.shape[-1]
    z = jnp.maximum(z + b_ref[0], 0.0)
    z = jnp.max(z.reshape(t_tile // 2, 2, f_pad, c), axis=1)
    m = jnp.maximum(z, pltpu.roll(z, f_pad - 1, 1))  # m[i]=max(z[i],z[i+1])
    g_pad = o_ref.shape[-2]
    sel = _sel_pool(f_pad, g_pad, f_img // 2)
    out = jnp.einsum("gf,tfc->tgc", sel, m,
                     preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _b1_kernel(f_img, t_img, t_tile, lane_in, f_pad,
               x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    """VGG block, C_in == 1. x_ref: one halo window [1, 1, te, LANE_IN] f32
    (row r <-> t = base + r - 2, col i <-> f = i - 1, junk zero).
    w1 [9, C] tap-major, w2 [9, C, C]."""
    ti = pl.program_id(1)
    base = ti * t_tile
    x = x_ref[0, 0]  # [te, LANE_IN]
    te = t_tile + 8
    c = w1_ref.shape[-1]

    # conv1 as ONE K=9 matmul over 9 stacked shifted slabs (there is no
    # channel dim to contract for C_in=1). Slab for tap (dt, df):
    # y1_E[j, i] needs x[t = base+j-1+dtoff, f = i-1+dfoff]
    # -> window row j + dt, col i + df - 1 (lane roll by 1 - df).
    slabs = []
    for dt in range(3):
        xs = x if dt == 0 else _extend_rows(x[dt:], te)
        for df in range(3):
            slabs.append(pltpu.roll(xs, (1 - df) % lane_in, 1))
    x9 = jnp.stack(slabs, axis=0).reshape(9, te * lane_in)
    y1 = jnp.dot(x9.T, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = y1.reshape(te, lane_in, c)[:, :f_pad, :]
    y1 = jnp.maximum(y1 + b1_ref[0], 0.0)
    y1 = y1 * _mask_e(te, f_pad, base, t_img, f_img)

    z2 = _conv3x3(y1, w2_ref, t_tile, 0)
    _relu_pool_write(z2, b2_ref, t_tile, f_img, o_ref)


def _b2_kernel(f_img, t_img, t_tile,
               y_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    """VGG block, C_in > 1. y_ref: one halo window [1, 1, te, F_PAD, C_in]
    bf16 (row r <-> t = base + r - 2, col i <-> f = i - 1, junk zero)."""
    ti = pl.program_id(1)
    base = ti * t_tile
    y = y_ref[0, 0].astype(jnp.float32)  # [te, F_PAD, C_in] (32-bit rolls)
    te = t_tile + 8

    # conv1 -> y1 in E convention: y1[j] at t = base+j-1 needs window rows
    # j + dt (up to te+1 -> zero-extend; the junk tail rows only affect y1
    # rows >= te-2, which conv2 never consumes).
    y1 = _conv3x3(_extend_rows(y, te + 2), w1_ref, te, 1)
    y1 = jnp.maximum(y1 + b1_ref[0], 0.0)
    y1 = y1 * _mask_e(te, y.shape[1], base, t_img, f_img)

    z2 = _conv3x3(y1, w2_ref, t_tile, 0)
    _relu_pool_write(z2, b2_ref, t_tile, f_img, o_ref)


def _windows(xp, t_tile):
    """[B, T+8, ...] -> overlapping halo windows [B, n_t, t_tile+8, ...]
    gathered by XLA (cheap: block inputs are small) so the kernel sees
    standard non-overlapping blocks (pipelined, vmap-batchable)."""
    n_t = (xp.shape[1] - 8) // t_tile
    idx = jnp.arange(n_t)[:, None] * t_tile + jnp.arange(t_tile + 8)[None, :]
    return xp[:, idx]


def _g_pad(f_img: int) -> int:
    # pooled width + halo col + >=1 junk col (next block's rolls wrap into
    # zeros); 8-mult so downstream (t, f) merges stay legal
    return _round(f_img // 2 + 2, 8)


def _const_specs(arrs):
    return [
        pl.BlockSpec(a.shape,
                     functools.partial(lambda n, bi, ti: (0,) * n, a.ndim),
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]


def vgg_block1_fused(x, w1, b1, w2, b2, out_dtype=jnp.bfloat16,
                     interpret=None):
    """Fused block, C_in == 1.

    x [B, T, F] -> [B, T//2, G_PAD, C] (col g = pooled f + 1, junk zero).
    """
    interpret = INTERPRET if interpret is None else interpret
    b, t_img, f_img = x.shape
    c = w1.shape[-1]
    t_tile = _pick_t_tile(t_img)
    lane_in = _round(f_img + 2, 128)
    f_pad = _round(f_img + 2, 8)
    g_pad = _g_pad(f_img)

    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (2, 6), (1, lane_in - f_img - 1)))
    xw = _windows(xp, t_tile)  # [B, n_t, te, LANE_IN]
    w1k = jnp.transpose(w1.reshape(3, 3, c), (1, 0, 2)).reshape(9, c)
    w2k = _w9(w2)
    b1c = b1.astype(jnp.float32).reshape(1, 1, c)
    b2c = b2.astype(jnp.float32).reshape(1, 1, c)
    kernel = functools.partial(_b1_kernel, f_img, t_img, t_tile, lane_in,
                               f_pad)
    te = t_tile + 8
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_img // 2, g_pad, c), out_dtype),
        grid=(b, t_img // t_tile),
        in_specs=[pl.BlockSpec((1, 1, te, lane_in),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _const_specs((w1k, b1c, w2k, b2c)),
        out_specs=pl.BlockSpec((1, t_tile // 2, g_pad, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_img * t_img * 9 * c * (1 + c),
            bytes_accessed=int(xw.size * 4
                               + b * (t_img // 2) * g_pad * c * 2),
            transcendentals=0,
        ),
    )(xw, w1k, b1c, w2k, b2c)


def vgg_block2_fused(y, f_img, w1, b1, w2, b2, out_dtype=jnp.bfloat16,
                     interpret=None):
    """Fused block, C_in > 1.

    y [B, T, F_PAD, C_in] (col i = f + 1, junk cols zero, F_PAD >= F+2)
    -> [B, T//2, G_PAD, C_out].
    """
    interpret = INTERPRET if interpret is None else interpret
    b, t_img, f_pad, c_in = y.shape
    if f_pad < f_img + 2 or f_pad % 8:
        raise ValueError(
            f"F_PAD {f_pad} must be an 8-multiple >= F+2={f_img + 2}")
    c = w1.shape[-1]
    t_tile = _pick_t_tile(t_img)
    g_pad = _g_pad(f_img)

    yp = jnp.pad(y.astype(jnp.bfloat16), ((0, 0), (2, 6), (0, 0), (0, 0)))
    yw = _windows(yp, t_tile)  # [B, n_t, te, F_PAD, C_in]
    w1k, w2k = _w9(w1), _w9(w2)
    b1c = b1.astype(jnp.float32).reshape(1, 1, c)
    b2c = b2.astype(jnp.float32).reshape(1, 1, c)
    kernel = functools.partial(_b2_kernel, f_img, t_img, t_tile)
    te = t_tile + 8
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_img // 2, g_pad, c), out_dtype),
        grid=(b, t_img // t_tile),
        in_specs=[pl.BlockSpec((1, 1, te, f_pad, c_in),
                               lambda bi, ti: (bi, ti, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _const_specs((w1k, b1c, w2k, b2c)),
        out_specs=pl.BlockSpec((1, t_tile // 2, g_pad, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_img * t_img * 9 * c * (c_in + c),
            bytes_accessed=int(yw.size * 2
                               + b * (t_img // 2) * g_pad * c * 2),
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
    """Returns [B, T//2, F//2, C] (T-major; the fused layout IS T-major, so
    this is just the halo-column slice)."""
    c_in = w1.shape[2]
    if c_in == 1:
        b, t_img, f_img = x.shape[:3]
        out = vgg_block1_fused(x.reshape(b, t_img, f_img), w1, b1, w2, b2,
                               out_dtype=out_dtype, interpret=interpret)
    else:
        b, t_img, f_img, _ = x.shape
        f_pad = _round(f_img + 2, 8)
        ycl = jnp.pad(x, ((0, 0), (0, 0), (1, f_pad - f_img - 1), (0, 0)))
        out = vgg_block2_fused(ycl, f_img, w1, b1, w2, b2,
                               out_dtype=out_dtype, interpret=interpret)
    return out[:, :, 1:1 + f_img // 2, :]


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
# Full two-block stack (the model integration point): activations stay in
# the fused layout between the blocks; only a halo-column slice + reshape
# at the end. Backward recomputes through the XLA reference (remat
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
    y1 = vgg_block1_fused(x, w1a, b1a, w2a, b2a, interpret=INTERPRET)
    f2 = f_img // 2
    y2 = vgg_block2_fused(y1, f2, w1b, b1b, w2b, b2b, interpret=INTERPRET)
    c2 = w1b.shape[-1]
    f4 = f2 // 2
    out = y2[:, :, 1:1 + f4, :]  # [B, T4, F4, C2] — already T-major
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
