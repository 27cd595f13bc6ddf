"""Conformer encoder + TP sharding tests (stretch config groundwork)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtl_tpu.models.conformer import ConformerEncoder, apply_rope, rope_angles
from mtl_tpu.models.transformer import ASRTransformer


def test_rope_preserves_norm_and_relative_phase():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 8))
    ang = jnp.asarray(rope_angles(6, 8))
    y = apply_rope(x, ang)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-5,
    )
    # relative property: <rope(q,t1), rope(k,t2)> depends only on t1-t2
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 8))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, 8))
    def dot_at(t1, t2, T=10):
        ang = jnp.asarray(rope_angles(T, 8))
        qq = apply_rope(jnp.broadcast_to(q, (1, T, 1, 8)), ang)[0, t1, 0]
        kk = apply_rope(jnp.broadcast_to(k, (1, T, 1, 8)), ang)[0, t2, 0]
        return float(jnp.dot(qq, kk))
    np.testing.assert_allclose(dot_at(3, 1), dot_at(7, 5), rtol=1e-4)


def test_conformer_encoder_shapes_and_masking():
    enc = ConformerEncoder(num_layers=2, num_heads=2, dim_model=16,
                           dim_input=24, dropout=0.0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
    lengths = jnp.array([10, 4])
    params = enc.init(jax.random.PRNGKey(1), x, lengths)
    out = enc.apply(params, x, lengths)
    assert out.shape == (2, 10, 16)
    np.testing.assert_array_equal(np.asarray(out[1, 4:]), 0.0)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_conformer_asr_model_forward():
    model = ASRTransformer(
        vocab_size=16, feat_extractor="vgg_cnn", num_enc_layers=2,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
        encoder_type="conformer",
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12)) * 0.2
    lengths = jnp.array([16, 16])
    seq_in = jnp.array([[1, 5, 6], [1, 7, 8]])
    params = model.init(jax.random.PRNGKey(1), feats, lengths, seq_in)
    logits = model.apply(params, feats, lengths, seq_in)
    assert logits.shape == (2, 3, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_conformer_remat_matches_and_trains():
    """remat=True must be numerically identical to remat=False and must
    differentiate in train mode (deterministic=False + dropout), i.e. the
    `deterministic` bool stays static through the nn.remat boundary — the
    configuration the stretch bench (bench.py --stretch) runs."""
    kw = dict(num_layers=2, num_heads=2, dim_model=16, dim_input=24,
              dropout=0.1, dtype=jnp.float32)
    enc = ConformerEncoder(**kw)
    enc_r = ConformerEncoder(remat=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
    lengths = jnp.array([10, 7])
    params = enc.init(jax.random.PRNGKey(1), x, lengths)

    out = enc.apply(params, x, lengths)
    out_r = enc_r.apply(params, x, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    def loss(p, module):
        y = module.apply(p, x, lengths, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params, enc)
    g_r = jax.grad(loss)(params, enc_r)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        g, g_r)


def test_tp_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from mtl_tpu.config import Config, MeshConfig
    from mtl_tpu.parallel.mesh import make_mesh
    from mtl_tpu.parallel.sharding import tp_param_shardings

    ds = jax.devices("cpu")
    if len(ds) < 8:
        pytest.skip("need 8 virtual devices")
    cfg = Config()
    cfg.mesh = MeshConfig(task=1, data=4, model=2)
    mesh = make_mesh(cfg, ds)

    enc = ConformerEncoder(num_layers=1, num_heads=2, dim_model=16,
                           dim_input=24, dropout=0.0, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 24))
    params = enc.init(jax.random.PRNGKey(0), x, jnp.array([8]))
    shardings = tp_param_shardings(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    found_col = found_row = False
    for kp, sh in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if "/q/" in path.replace("'", "") or "q/kernel" in path:
            pass
        if sh.spec == P(None, "model"):
            found_col = True
        if sh.spec == P("model", None):
            found_row = True
    assert found_col and found_row

    # sharded apply matches unsharded
    with mesh:
        sharded_params = jax.device_put(params, shardings)
        out_sharded = enc.apply(sharded_params, x, jnp.array([8]))
    out_ref = enc.apply(jax.device_put(params, ds[0]), x, jnp.array([8]))
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_ref),
                               atol=1e-5)
