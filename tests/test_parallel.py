"""Multi-device sharding tests on the virtual CPU mesh (8 devices via
xla_force_host_platform_device_count — the TPU equivalent of multi-node
testing without a cluster, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mtl_tpu.config import Config, MeshConfig
from mtl_tpu.parallel.mesh import make_mesh


def cpu_devices():
    ds = jax.devices("cpu")
    if len(ds) < 8:
        pytest.skip("need 8 virtual CPU devices")
    return ds


def test_make_mesh_axes():
    ds = cpu_devices()
    cfg = Config()
    cfg.mesh = MeshConfig(task=2, data=4, model=1)
    mesh = make_mesh(cfg, ds)
    assert mesh.axis_names == ("task", "data", "model")
    assert mesh.devices.shape == (2, 4, 1)


def test_sharded_meta_step_matches_single_device():
    """The jitted meta step must produce identical losses when its inputs are
    sharded over a (task, data) mesh vs a single device."""
    ds = cpu_devices()
    from mtl_tpu.models.transformer import ASRTransformer
    from mtl_tpu.train.steps import init_train_state, make_meta_step

    cfg = Config()
    cfg.model.dtype = "float32"
    cfg.train.lr = 0.01
    model = ASRTransformer(
        vocab_size=16, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    opt = optax.adam(1e-3)
    step = make_meta_step(model, cfg, opt)

    k, b, t, f, l = 2, 4, 8, 12, 5
    rng = np.random.RandomState(0)
    support = {
        "features": rng.randn(k, b, t, f).astype(np.float32),
        "input_lengths": np.full((k, b), t, np.int32),
        "targets": rng.randint(4, 16, size=(k, b, l)),
    }
    query = {
        "features": rng.randn(b, t, f).astype(np.float32),
        "input_lengths": np.full((b,), t, np.int32),
        "targets": rng.randint(4, 16, size=(b, l)),
    }
    ex = jax.tree.map(lambda x: jnp.asarray(x[0]), support)
    state = init_train_state(model, cfg, opt, jax.random.PRNGKey(0), ex)
    drng = jax.random.PRNGKey(1)

    # single CPU device (the default backend here may be a real TPU via the
    # axon plugin — keep both runs on the same platform for exact equality)
    cpu0 = ds[0]
    state = jax.device_put(state, cpu0)
    s1, m1 = step(state,
                  jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0),
                               support),
                  jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0),
                               query),
                  jax.device_put(drng, cpu0))

    # sharded over (task=2, data=4)
    cfg.mesh = MeshConfig(task=2, data=4, model=1)
    mesh = make_mesh(cfg, ds)
    with mesh:
        state_r = jax.device_put(state, NamedSharding(mesh, P()))
        sup_s = jax.tree.map(
            lambda x: jax.device_put(
                np.asarray(x),
                NamedSharding(mesh, P(*(("task", "data") + (None,) *
                                        (np.asarray(x).ndim - 2)))),
            ),
            support,
        )
        q_s = jax.tree.map(
            lambda x: jax.device_put(
                np.asarray(x),
                NamedSharding(mesh, P(*(("data",) + (None,) *
                                        (np.asarray(x).ndim - 1)))),
            ),
            query,
        )
        s2, m2 = step(state_r, sup_s, q_s, drng)

    np.testing.assert_allclose(float(m1["outer_loss"]),
                               float(m2["outer_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["support_losses"]), np.asarray(m2["support_losses"]),
        rtol=1e-5,
    )
    # Param-exactness after ADAM is ill-conditioned (update ~ sign(g) for
    # near-zero grads, so reduction-order noise flips tiny entries); the
    # loss equalities above already pin the forward+gradient path. Check the
    # bulk of the update agrees:
    a_flat = np.concatenate([np.asarray(x).reshape(-1) for x in
                             jax.tree.leaves(s1.params)])
    b_flat = np.concatenate([np.asarray(x).reshape(-1) for x in
                             jax.tree.leaves(s2.params)])
    frac_close = float(np.mean(np.abs(a_flat - b_flat) < 1e-4))
    assert frac_close > 0.999, frac_close
    # and that training actually moved the params
    p0 = np.concatenate([np.asarray(x).reshape(-1) for x in
                         jax.tree.leaves(state.params)])
    assert float(np.max(np.abs(a_flat - p0))) > 1e-5
