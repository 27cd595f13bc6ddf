"""Fused VGG-block Pallas kernel tests (interpreter mode — runs anywhere).

Layouts are T-major: x [B, T, F] (C_in=1) or [B, T, F, C_in]; out
[B, T//2, F//2, C]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mtl_tpu.ops.vgg_pallas as vp
from mtl_tpu.ops.vgg_pallas import (
    fused_vgg_block,
    vgg_block_forward_pallas,
    vgg_block_reference,
)


def make_inputs(B, T, F, Cin, C, scale=0.1, seed=0):
    rng = np.random.RandomState(seed)
    shape = (B, T, F) if Cin == 1 else (B, T, F, Cin)
    return (
        jnp.asarray(rng.randn(*shape).astype(np.float32)),
        jnp.asarray((rng.randn(3, 3, Cin, C) * scale).astype(np.float32)),
        jnp.asarray((rng.randn(C) * scale).astype(np.float32)),
        jnp.asarray((rng.randn(3, 3, C, C) * scale).astype(np.float32)),
        jnp.asarray((rng.randn(C) * scale).astype(np.float32)),
    )


@pytest.mark.parametrize(
    "B,T,F,Cin,C",
    [
        (2, 32, 13, 1, 8),    # odd F, single tile, C_in=1 (vgg block 1)
        (1, 64, 21, 8, 16),   # C_in>1 (vgg block 2 shape)
        (2, 256, 9, 1, 8),    # multiple time tiles (halo correctness)
        (1, 128, 11, 8, 16),  # multiple tiles, C_in>1
    ],
)
def test_fused_forward_matches_reference(B, T, F, Cin, C):
    x, w1, b1, w2, b2 = make_inputs(B, T, F, Cin, C)
    ref = np.asarray(vgg_block_reference(x, w1, b1, w2, b2), np.float32)
    out = np.asarray(
        vgg_block_forward_pallas(x, w1, b1, w2, b2, interpret=True),
        np.float32,
    )
    assert out.shape == ref.shape == (B, T // 2, F // 2, C)
    # bf16 outputs + backend matmul precision
    np.testing.assert_allclose(out, ref, atol=4e-2, rtol=2e-2)


def test_reference_matches_fmajor_flax_semantics():
    """The T-major reference equals the F-major NHWC conv pipeline (i.e. the
    layout change is pure transpose, weights HWIO with H=f)."""
    B, T, F, C = 1, 16, 9, 4
    x, w1, b1, w2, b2 = make_inputs(B, T, F, 1, C)
    out_t = np.asarray(vgg_block_reference(x, w1, b1, w2, b2), np.float32)

    xf = jnp.transpose(x, (0, 2, 1))[..., None]  # [B, F, T, 1]
    dn = jax.lax.conv_dimension_numbers(xf.shape, w1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xf, w1, (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = jnp.maximum(y + b1.reshape(1, 1, 1, -1), 0.0)
    y = jax.lax.conv_general_dilated(y, w2, (1, 1), "SAME",
                                     dimension_numbers=dn._replace())
    y = jnp.maximum(y + b2.reshape(1, 1, 1, -1), 0.0)
    y = y[:, : F // 2 * 2, : T // 2 * 2]
    y = y.reshape(B, F // 2, 2, T // 2, 2, C)
    out_f = jnp.max(jnp.max(y, axis=4), axis=2)  # [B, F//2, T//2, C]
    out_f = np.asarray(jnp.transpose(out_f, (0, 2, 1, 3)), np.float32)
    np.testing.assert_allclose(out_t, out_f, atol=2e-2, rtol=1e-2)


def test_fused_block_trains():
    """Gradient descent through fused_vgg_block (custom VJP wiring)."""
    x, w1, b1, w2, b2 = make_inputs(1, 32, 9, 1, 4, scale=0.3)
    target = vgg_block_reference(x, w1, b1, w2, b2).astype(jnp.float32)
    params = (w1 + 0.1, b1, w2 - 0.1, b2)

    old = vp.INTERPRET
    vp.INTERPRET = True
    try:
        def loss_fn(p):
            out = fused_vgg_block(x, p[0], p[1], p[2], p[3])
            return jnp.mean((out.astype(jnp.float32) - target) ** 2)

        l0 = None
        for i in range(20):
            l, g = jax.value_and_grad(loss_fn)(params)
            params = jax.tree.map(lambda w, gw: w - 0.5 * gw, params, g)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0 * 0.5, (l0, float(l))
    finally:
        vp.INTERPRET = old


def test_fused_stack_matches_reference_and_grads():
    """fused_vgg_stack forward == XLA reference; grads flow (custom VJP);
    works under vmap (the meta step vmaps tasks over the conv)."""
    rng = np.random.RandomState(1)

    def mk(*s, sc=0.1):
        return jnp.asarray((rng.randn(*s) * sc).astype(np.float32))

    x = jnp.asarray(rng.randn(2, 32, 13).astype(np.float32))
    w = [mk(3, 3, 1, 8), mk(8), mk(3, 3, 8, 8), mk(8),
         mk(3, 3, 8, 16, sc=0.2), mk(16), mk(3, 3, 16, 16, sc=0.2), mk(16)]

    old = vp.INTERPRET
    vp.INTERPRET = True
    try:
        out = np.asarray(vp.fused_vgg_stack(x, *w), np.float32)
        ref = np.asarray(vp.vgg_stack_reference(x, *w), np.float32)
        assert out.shape == ref.shape == (2, 8, 3 * 16)
        np.testing.assert_allclose(out, ref, atol=4e-2, rtol=2e-2)

        # grads via the recompute VJP match grads of the reference
        def loss_fused(w):
            return jnp.mean(vp.fused_vgg_stack(x, *w).astype(jnp.float32)**2)

        def loss_ref(w):
            return jnp.mean(
                vp.vgg_stack_reference(x, *w).astype(jnp.float32)**2)

        gf = jax.grad(loss_fused)(w)
        gr = jax.grad(loss_ref)(w)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-2)

        # vmap over a task axis (meta-step shape): runs and matches stacking
        xs = jnp.stack([x, x + 0.05])
        vm = jax.vmap(lambda xi: vp.fused_vgg_stack(xi, *w))(xs)
        single = jnp.stack([vp.fused_vgg_stack(xs[0], *w),
                            vp.fused_vgg_stack(xs[1], *w)])
        np.testing.assert_allclose(np.asarray(vm), np.asarray(single),
                                   atol=2e-2, rtol=2e-2)
    finally:
        vp.INTERPRET = old


def test_fused_subsampler_param_tree_matches_xla_path():
    """FeatureExtractor(fused=True) shares the exact param tree with the XLA
    nn.Conv path, so checkpoints are interchangeable; outputs match."""
    from mtl_tpu.models.subsampler import FeatureExtractor

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 9).astype(np.float32))

    old = vp.INTERPRET
    vp.INTERPRET = True
    try:
        fe_x = FeatureExtractor("vgg_cnn", fused=False)
        fe_f = FeatureExtractor("vgg_cnn", fused=True)
        px = fe_x.init(jax.random.PRNGKey(0), x)
        pf = fe_f.init(jax.random.PRNGKey(0), x)
        tx = jax.tree.structure(px)
        tf_ = jax.tree.structure(pf)
        assert tx == tf_, (tx, tf_)
        shapes_x = jax.tree.map(lambda a: a.shape, px)
        shapes_f = jax.tree.map(lambda a: a.shape, pf)
        assert shapes_x == shapes_f

        # same params -> same output (within bf16 tolerance) either path
        out_x = np.asarray(fe_x.apply(px, x), np.float32)
        out_f = np.asarray(fe_f.apply(px, x), np.float32)
        assert out_x.shape == out_f.shape
        np.testing.assert_allclose(out_f, out_x, atol=4e-2, rtol=2e-2)
    finally:
        vp.INTERPRET = old


def test_fused_subsampler_falls_back_on_t_mod_16():
    """T = 8 (mod 16) is 8-divisible but block 2 (at T//2) is not tileable;
    the guard must take the reference path, not crash at trace time
    (ADVICE r2: default bucket 200 frames hit this)."""
    from mtl_tpu.models.subsampler import FeatureExtractor

    rng = np.random.RandomState(3)
    old = vp.INTERPRET
    vp.INTERPRET = True
    try:
        fe = FeatureExtractor("vgg_cnn", fused=True)
        for t in (24, 200):  # both = 8 mod 16
            x = jnp.asarray(rng.randn(1, t, 9).astype(np.float32))
            params = fe.init(jax.random.PRNGKey(0), x)
            out = fe.apply(params, x)
            assert out.shape == (1, t // 4, 2 * 128)
    finally:
        vp.INTERPRET = old


def test_second_order_forces_unfused_conv():
    """custom_vjp cannot nest under grad-of-grad: --second-order must build
    the XLA conv path even when --fused-vgg is requested."""
    from mtl_tpu.config import Config
    from mtl_tpu.models.transformer import build_model

    cfg = Config()
    cfg.model.fused_vgg = True
    cfg.train.second_order = True
    model = build_model(cfg, 40)
    assert model.fused_vgg is False

    cfg2 = Config()
    cfg2.model.fused_vgg = True
    cfg2.train.second_order = False
    assert build_model(cfg2, 40).fused_vgg is True

    cfg3 = Config()  # default: opt-in only
    assert build_model(cfg3, 40).fused_vgg is False
