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


def _tiny_meta_setup(k, b):
    """Shared tiny flagship setup for the scale tests."""
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
    t, f, l = 8, 12, 5
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
    return cfg, model, step, state, support, query


def test_sharded_meta_step_k4_data2_matches_single_device():
    """Scale evidence beyond the K=2 x data=4 case: K=4 tasks x data=2
    sharding produces the single-device outer grad (VERDICT r1 #9)."""
    ds = cpu_devices()
    cfg, model, step, state, support, query = _tiny_meta_setup(k=4, b=2)
    drng = jax.random.PRNGKey(1)

    cpu0 = ds[0]
    state0 = jax.device_put(state, cpu0)
    s1, m1 = step(
        state0,
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0), support),
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0), query),
        jax.device_put(drng, cpu0),
    )

    cfg.mesh = MeshConfig(task=4, data=2, model=1)
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
    a = np.concatenate([np.asarray(x).reshape(-1)
                        for x in jax.tree.leaves(s1.params)])
    b_ = np.concatenate([np.asarray(x).reshape(-1)
                         for x in jax.tree.leaves(s2.params)])
    assert float(np.mean(np.abs(a - b_) < 1e-4)) > 0.999


def test_meta_step_outer_grad_lowers_to_all_reduce():
    """Compiled-HLO guard: the sharded meta step's cross-device gradient
    reduction must lower to all-reduce collectives, not gather-based
    reassembly (VERDICT r1 #9)."""
    ds = cpu_devices()
    cfg, model, step, state, support, query = _tiny_meta_setup(k=2, b=4)
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
        compiled = step.lower(state_r, sup_s, q_s,
                              jax.random.PRNGKey(1)).compile()
        hlo = compiled.as_text()

    import re

    # 1) the outer gradients must be reduced as param-shaped all-reduce
    #    tuples (XLA groups grad leaves into tuple all-reduces) — look for
    #    signature kernel shapes inside all-reduce op lines
    ar_lines = [l for l in hlo.splitlines()
                if re.search(r"= .*all-reduce\(", l)]
    assert ar_lines, "no all-reduce in the sharded meta step"
    ar_text = "\n".join(ar_lines)
    for sig in ("3,3,64,64", "3,3,64,128", "16,384"):  # conv + input kernels
        assert sig in ar_text, (
            f"param grad shape [{sig}] not covered by any all-reduce:\n"
            + ar_text[:2000]
        )

    # 2) all-gather traffic must stay bounded (XLA legitimately gathers some
    #    conv activations while computing weight grads, ~6 MB at this shape;
    #    a gather-based gradient reassembly would blow far past this budget)
    def collective_bytes(kind):
        total = 0
        itemsize = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                    "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}
        for m in re.finditer(r"= (\w+)\[([\d,]*)\][^ ]* " + kind, hlo):
            size = 1
            for d in m.group(2).split(","):
                if d:
                    size *= int(d)
            total += size * itemsize.get(m.group(1), 4)
        return total

    ag_bytes = collective_bytes("all-gather")
    assert ag_bytes < 16 * 1024 * 1024, (
        f"all-gather traffic exploded: {ag_bytes/1e6:.1f} MB"
    )


# --------------------------------------------------------------------------
# Tensor parallelism (in-suite; VERDICT r1 #8)
# --------------------------------------------------------------------------

def test_tp_conformer_fwd_bwd_matches_replicated():
    """TP-sharded Conformer fwd+bwd == replicated single-device values
    (ports the dryrun's phase 2 into the suite)."""
    ds = cpu_devices()
    from jax.sharding import Mesh

    from mtl_tpu.models.conformer import ConformerEncoder
    from mtl_tpu.parallel.sharding import shard_params_tp

    enc = ConformerEncoder(num_layers=2, num_heads=2, dim_model=32,
                           dim_input=24, dropout=0.0, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(8, 12, 24).astype(np.float32)
    lengths = np.full((8,), 12, np.int32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]),
                      jnp.asarray(lengths[:2]))

    def loss_fn(p, xb, lb):
        out = enc.apply(p, xb, lb)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    # replicated single-device reference
    cpu0 = ds[0]
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(
        jax.device_put(params, cpu0), jax.device_put(jnp.asarray(x), cpu0),
        jax.device_put(jnp.asarray(lengths), cpu0),
    )

    mesh = Mesh(np.asarray(ds[:8]).reshape(4, 2), ("data", "model"))
    with mesh:
        tp_params = shard_params_tp(params, mesh)
        xb = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
        lb = jax.device_put(lengths, NamedSharding(mesh, P("data")))
        l_tp, g_tp = jax.jit(jax.value_and_grad(loss_fn))(tp_params, xb, lb)

    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_flagship_transformer_fwd_bwd_matches_replicated():
    """TP over the flagship ASRTransformer's factorized projections."""
    ds = cpu_devices()
    from jax.sharding import Mesh

    from mtl_tpu.ops.targets import make_teacher_forcing
    from mtl_tpu.parallel.sharding import shard_params_tp
    from mtl_tpu.models.transformer import ASRTransformer
    from mtl_tpu.train.losses import ce_loss

    model = ASRTransformer(
        vocab_size=16, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    rng = np.random.RandomState(1)
    feats = rng.randn(4, 8, 12).astype(np.float32)
    lengths = np.full((4,), 8, np.int32)
    targets = rng.randint(4, 16, size=(4, 5))
    seq_in, seq_out = make_teacher_forcing(jnp.asarray(targets))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(lengths), seq_in)

    def loss_fn(p, f, ln, si, so):
        logits = model.apply(p, f, ln, si)
        return ce_loss(logits, so)[0]

    cpu0 = ds[0]
    args0 = [jax.device_put(jnp.asarray(a), cpu0)
             for a in (feats, lengths, seq_in, seq_out)]
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(
        jax.device_put(params, cpu0), *args0)

    mesh = Mesh(np.asarray(ds[:8]).reshape(4, 2), ("data", "model"))
    with mesh:
        tp_params = shard_params_tp(params, mesh)
        f_s = jax.device_put(feats, NamedSharding(mesh, P("data", None, None)))
        l_s = jax.device_put(lengths, NamedSharding(mesh, P("data")))
        si_s = jax.device_put(np.asarray(seq_in),
                              NamedSharding(mesh, P("data", None)))
        so_s = jax.device_put(np.asarray(seq_out),
                              NamedSharding(mesh, P("data", None)))
        l_tp, g_tp = jax.jit(jax.value_and_grad(loss_fn))(
            tp_params, f_s, l_s, si_s, so_s)

    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_spec_coverage_flagship():
    """Every >=2-D kernel in the flagship model either matches a TP rule or
    is on the intentional-replication allowlist — no silent fall-through."""
    from mtl_tpu.models.transformer import ASRTransformer
    from mtl_tpu.parallel.sharding import _spec_for

    model = ASRTransformer(
        vocab_size=16, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    import re

    from mtl_tpu.ops.targets import make_teacher_forcing

    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 8, 12).astype(np.float32))
    lengths = jnp.full((2,), 8, jnp.int32)
    seq_in, _ = make_teacher_forcing(
        jnp.asarray(rng.randint(4, 16, size=(2, 5))))
    params = model.init(jax.random.PRNGKey(0), feats, lengths, seq_in)

    # intentionally replicated >=2-D params: conv kernels (spatial), the
    # embedding table, and the encoder input projection (small fan-in)
    ALLOW_REPLICATED = re.compile(
        r"(^|/)conv/|trg_embedding|input_linear"
    )

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    uncovered = []
    for kp, leaf in flat:
        if leaf.ndim < 2:
            continue
        path = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                        for k in kp)
        spec = _spec_for(path, leaf.ndim)
        if spec == P() and not ALLOW_REPLICATED.search(path):
            uncovered.append(path)
    assert not uncovered, f"kernels with no TP rule or allowlist: {uncovered}"


def test_meta_step_composed_with_tp_matches_single_device():
    """The FULL meta-transfer step on a 3-axis (task=2, data=2, model=2)
    mesh — TP param shardings composed with task/data batch sharding —
    equals the single-device run (VERDICT r2 #5)."""
    ds = cpu_devices()
    from mtl_tpu.parallel.sharding import shard_params_tp

    cfg, model, step, state, support, query = _tiny_meta_setup(k=2, b=4)
    drng = jax.random.PRNGKey(1)

    cpu0 = ds[0]
    state0 = jax.device_put(state, cpu0)
    s1, m1 = step(
        state0,
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0), support),
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0), query),
        jax.device_put(drng, cpu0),
    )

    cfg.mesh = MeshConfig(task=2, data=2, model=2)
    mesh = make_mesh(cfg, ds)
    with mesh:
        tp_params = shard_params_tp(state.params, mesh)
        # opt-state moments inherit the TP shardings via jit-init propagation
        # (mtl_tpu/parallel/mesh.py:shard_train_state)
        import optax

        opt = optax.adam(1e-3)
        opt_state = jax.jit(opt.init)(tp_params)
        state_tp = state.replace(params=tp_params, opt_state=opt_state)
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
        s2, m2 = step(state_tp, sup_s, q_s, drng)

    np.testing.assert_allclose(float(m1["outer_loss"]),
                               float(m2["outer_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["support_losses"]), np.asarray(m2["support_losses"]),
        rtol=1e-5,
    )
    a = np.concatenate([np.asarray(x).reshape(-1)
                        for x in jax.tree.leaves(s1.params)])
    b_ = np.concatenate([np.asarray(x).reshape(-1)
                         for x in jax.tree.leaves(s2.params)])
    assert float(np.mean(np.abs(a - b_) < 1e-4)) > 0.999


def test_trainer_path_3axis_mesh(tmp_path):
    """TransientTrainer itself on (task=2, data=2, model=2): the product
    mesh wiring composes TP param sharding with the meta step and trains
    with finite losses."""
    cpu_devices()
    from mtl_tpu.data.synthetic import make_synthetic_corpus
    from mtl_tpu.cli.asr import meta_transfer_train_main

    manifests, labels = make_synthetic_corpus(
        str(tmp_path / "c"), num_tasks=2, utts_per_task=4, max_sec=0.4,
        max_chars=5,
    )
    argv = [
        "--name", "mesh3axis",
        "--train-manifest-list", *manifests,
        "--valid-manifest-list", manifests[-1],
        "--labels-path", labels,
        "--num-enc-layers", "1", "--num-dec-layers", "1", "--num-heads", "2",
        "--dim-model", "16", "--dim-key", "8", "--dim-value", "8",
        "--dim-inner", "16", "--dim-emb", "16", "--r", "4",
        "--dropout", "0.0", "--dtype", "float32",
        "--src-max-len", "64", "--tgt-max-len", "32",
        "--src-buckets", "64", "--tgt-buckets", "16",
        "--k-train", "2", "--k-valid", "2",
        "--lr", "1e-2", "--meta-lr", "1e-3",
        "--epochs", "2", "--evaluate-every", "4", "--save-every", "4",
        "--save-folder", str(tmp_path / "m"),
        "--mesh-task", "2", "--mesh-data", "2", "--mesh-model", "2",
    ]
    with jax.default_device(jax.devices("cpu")[0]):
        state = meta_transfer_train_main(argv)
    flat = np.concatenate([np.asarray(x).reshape(-1)
                           for x in jax.tree.leaves(state.params)])
    assert np.isfinite(flat).all()


def test_stretch_conformer_tp_shards_and_runs():
    """BASELINE.json configs[4] stretch config (17L d=1024 Conformer):
    params shard under the TP rules at those dims and one fwd+bwd runs on
    the virtual mesh (VERDICT r2 #5). One layer's weights stand in for 17
    at init time (layers are homogeneous; 17 layers only scale memory),
    but the DIMS are the stretch dims."""
    ds = cpu_devices()
    from jax.sharding import Mesh

    from mtl_tpu.models.conformer import ConformerEncoder
    from mtl_tpu.parallel.sharding import shard_params_tp, tp_param_shardings

    enc = ConformerEncoder(num_layers=2, num_heads=8, dim_model=1024,
                           dim_input=80, dropout=0.0, dtype=jnp.bfloat16)
    x = np.random.RandomState(0).randn(4, 16, 80).astype(np.float32)
    lengths = np.full((4,), 16, np.int32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]),
                      jnp.asarray(lengths[:1]))

    mesh = Mesh(np.asarray(ds[:8]).reshape(4, 2), ("data", "model"))
    # every >=2-D kernel with a TP rule must actually split cleanly at
    # d_model=1024 over model=2
    shardings = tp_param_shardings(params, mesh)
    n_sharded = 0
    for leaf, sh in zip(jax.tree.leaves(params), jax.tree.leaves(shardings)):
        spec = sh.spec
        for dim, ax in enumerate(spec):
            if ax == "model":
                assert leaf.shape[dim] % 2 == 0, (leaf.shape, spec)
                n_sharded += 1
    assert n_sharded >= 8  # attention qkv/out + ffn up/down actually split

    with mesh:
        tp_params = shard_params_tp(params, mesh)
        xb = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
        lb = jax.device_put(lengths, NamedSharding(mesh, P("data")))

        def loss_fn(p):
            out = enc.apply(p, xb, lb)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        l, g = jax.jit(jax.value_and_grad(loss_fn))(tp_params)
        assert np.isfinite(float(l))
        # TP-tagged params must get NON-replicated grads (no silent
        # all-gather of the big matrices); untagged params are free
        for gp, sh in zip(jax.tree.leaves(g), jax.tree.leaves(shardings)):
            if any(ax == "model" for ax in sh.spec):
                assert not gp.sharding.is_fully_replicated, sh.spec


def test_sharded_joint_step_matches_single_device():
    """Data-parallel joint training: the jitted joint step over a (task,
    data)-sharded batch equals the single-device run (SURVEY §2.6 DP row)."""
    ds = cpu_devices()
    from mtl_tpu.models.transformer import ASRTransformer
    from mtl_tpu.train.steps import init_train_state, make_joint_step

    cfg = Config()
    cfg.model.dtype = "float32"
    model = ASRTransformer(
        vocab_size=16, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=64, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    # sgd(1.0): params_new = params - grads, so the param comparison below
    # is a GRADIENT comparison (Adam's eps-divide makes near-zero gradient
    # elements sign-sensitive to reduction order — not a meaningful check)
    opt = optax.sgd(1.0)
    step = make_joint_step(model, cfg, opt)

    k, b, t, f, l = 2, 4, 8, 12, 5
    rng = np.random.RandomState(7)
    batches = {
        "features": rng.randn(k, b, t, f).astype(np.float32),
        "input_lengths": np.full((k, b), t, np.int32),
        "targets": rng.randint(4, 16, size=(k, b, l)),
    }
    ex = jax.tree.map(lambda x: jnp.asarray(x[0]), batches)
    state = init_train_state(model, cfg, opt, jax.random.PRNGKey(0), ex)
    drng = jax.random.PRNGKey(1)

    cpu0 = ds[0]
    state0 = jax.device_put(state, cpu0)
    s1, loss1, _ = step(
        state0, jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0),
                             batches),
        jax.device_put(drng, cpu0))

    cfg.mesh = MeshConfig(task=2, data=4, model=1)
    mesh = make_mesh(cfg, ds)
    with mesh:
        state_r = jax.device_put(state0, NamedSharding(mesh, P()))
        b_s = jax.tree.map(
            lambda x: jax.device_put(
                np.asarray(x),
                NamedSharding(mesh, P(*(("task", "data") + (None,) *
                                        (np.asarray(x).ndim - 2)))),
            ),
            batches,
        )
        s2, loss2, _ = step(state_r, b_s, drng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    g1 = jax.tree.map(lambda o, n: np.asarray(o) - np.asarray(n),
                      state0.params, s1.params)
    g2 = jax.tree.map(lambda o, n: np.asarray(o) - np.asarray(n),
                      state0.params, s2.params)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-6)

def test_second_order_meta_step_sharded_matches_single_device():
    """The SECOND-order meta step (grad-through-grad, the stretch MAML
    config) under (task=2, data=4) sharding equals the single-device run —
    the first-order equality tests don't exercise the jvp-of-vjp HLO the
    second-order path emits."""
    from mtl_tpu.train.steps import make_meta_step

    ds = cpu_devices()
    cfg, model, _, state, support, query = _tiny_meta_setup(k=2, b=4)
    cfg.train.second_order = True
    step = make_meta_step(model, cfg, optax.adam(1e-3))
    drng = jax.random.PRNGKey(1)

    cpu0 = ds[0]
    s1, m1 = step(
        jax.device_put(state, cpu0),
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0), support),
        jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cpu0), query),
        jax.device_put(drng, cpu0),
    )

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
    a = np.concatenate([np.asarray(x).reshape(-1)
                        for x in jax.tree.leaves(s1.params)])
    b_ = np.concatenate([np.asarray(x).reshape(-1)
                         for x in jax.tree.leaves(s2.params)])
    assert float(np.mean(np.abs(a - b_) < 1e-4)) > 0.999


def test_sp_encode_matches_single_device_and_shards_time():
    """Sequence-parallel long-form encoding (parallel/sp.py): time axis over
    the ``model`` mesh axis must be numerically equal to the unsharded
    encoder, and the compiled HLO must show XLA actually distributed it —
    all-gathers at attention, collective-permute halo exchange at the VGG
    convs (the scaling-book recipe: annotate, verify collectives)."""
    ds = cpu_devices()
    from mtl_tpu.models.transformer import ASRTransformer
    from mtl_tpu.parallel.sp import encode_sp, lower_encode_sp

    model = ASRTransformer(
        vocab_size=16, feat_extractor="vgg_cnn", num_enc_layers=1,
        num_dec_layers=1, num_heads=2, dim_model=16, dim_key=8, dim_value=8,
        dim_input=(12 // 4) * 128, dim_inner=16, dim_emb=16, dropout=0.0,
        src_max_length=128, trg_max_length=32, r=4, dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    b, t, f = 4, 64, 12
    feats = rng.randn(b, t, f).astype(np.float32)
    lens = np.full((b,), t, np.int32)
    seq_in = rng.randint(4, 16, size=(b, 5))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(lens), jnp.asarray(seq_in))

    ref = model.apply(params, jnp.asarray(feats), jnp.asarray(lens),
                      method=model.encode)

    cfg = Config()
    cfg.mesh = MeshConfig(task=1, data=2, model=4)
    mesh = make_mesh(cfg, ds)
    out = encode_sp(model, params, feats, lens, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    hlo = lower_encode_sp(model, params, feats, lens, mesh).compile().as_text()
    assert "all-gather" in hlo  # attention gathers the full K/V sequence
    assert "collective-permute" in hlo  # conv halo exchange between slices
