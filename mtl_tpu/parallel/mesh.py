"""Device meshes and sharding rules.

The reference is strictly single-device (SURVEY.md §2.6); scale-out here is
expressed with `jax.sharding` so XLA inserts the collectives:

* axis ``task``: the meta loops' per-language tasks (the stacked leading K
  axis of support batches) — outer gradients are psum-reduced across it;
* axis ``data``: batch data-parallelism within each task;
* axis ``model``: reserved tensor-parallel axis for the stretch Conformer
  config (params replicated while its size is 1).

Params are replicated over (task, data); batches are sharded
``[K over task, B over data, ...]``. With `jax.jit` + these shardings the
outer-grad mean over tasks compiles to an all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config

AXES = ("task", "data", "model")


def make_mesh(cfg: Optional[Config] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    task = max(1, cfg.mesh.task) if cfg else 1
    model = max(1, cfg.mesh.model) if cfg else 1
    data = max(1, cfg.mesh.data) if cfg else 0
    if cfg is None or cfg.mesh.data <= 0:
        data = max(1, n // (task * model))
    used = task * data * model
    assert used <= n, f"mesh {task}x{data}x{model} needs {used} > {n} devices"
    dev_array = np.asarray(devices[:used]).reshape(task, data, model)
    return Mesh(dev_array, AXES)


def maybe_make_mesh(cfg: Config) -> Optional[Mesh]:
    """The product trainers' mesh: None for the single-device path
    (``--mesh-* 1``, the default), else a (task, data, model) mesh.

    When the default backend has fewer devices than requested, falls back to
    the CPU backend's (possibly virtual, xla_force_host_platform_device_count)
    devices — the test/dryrun environment for multi-chip code without a
    multi-chip slice (SURVEY.md §4)."""
    total = (max(1, cfg.mesh.task) * max(1, cfg.mesh.data)
             * max(1, cfg.mesh.model))
    if total <= 1:
        return None
    devices = jax.devices()
    if len(devices) < total:
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if len(cpus) >= total:
            devices = cpus
        else:
            raise ValueError(
                f"--mesh-task {cfg.mesh.task} --mesh-data {cfg.mesh.data} "
                f"--mesh-model {cfg.mesh.model} needs {total} devices; "
                f"{len(devices)} available"
            )
    return make_mesh(cfg, devices)


def validate_mesh_divisibility(mesh: Mesh, num_tasks: int, k_train: int,
                               k_valid: int) -> None:
    """Static-shape sharding needs the batch axes to divide evenly; fail
    fast with the fix spelled out instead of an XLA sharding error."""
    task, data = mesh.shape["task"], mesh.shape["data"]
    if num_tasks % task:
        raise ValueError(
            f"--mesh-task {task} must divide the number of train manifests "
            f"({num_tasks})"
        )
    if k_train % data:
        raise ValueError(
            f"--mesh-data {data} must divide --k-train ({k_train})"
        )
    if k_valid % data:
        raise ValueError(
            f"--mesh-data {data} must divide --k-valid ({k_valid})"
        )


def shard_train_state(state, mesh: Mesh, optimizer=None):
    """Place a TrainState onto the mesh: everything replicated over
    (task, data); when the ``model`` axis is >1, params (and the matching
    optimizer moments) get the Megatron-style TP shardings instead.
    ``optimizer`` is accepted for signature stability; sharding is derived
    from parameter paths alone."""
    state = jax.device_put(state, replicated(mesh))
    if mesh.shape.get("model", 1) <= 1 or not hasattr(state, "params"):
        # wrapper states (e.g. the discriminator's) only support replication;
        # TP composes with the plain TrainState
        return state
    from .sharding import tp_param_shardings

    params = jax.device_put(state.params,
                            tp_param_shardings(state.params, mesh))
    # optimizer moments mirror the param tree, and the TP rules match by
    # parameter PATH — which appears inside the opt-state paths (…/mu/…/
    # query_linear/…) — so the same rule pass shards mu/nu and replicates
    # counts/scalars. (A jit(optimizer.init) propagation trick would fight
    # jax.default_device pinning in the CPU-isolated dryrun.)
    opt_state = jax.device_put(state.opt_state,
                               tp_param_shardings(state.opt_state, mesh))
    return state.replace(params=params, opt_state=opt_state)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] sharded over data."""
    return NamedSharding(mesh, P("data"))


def task_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] sharded over (task, data)."""
    return NamedSharding(mesh, P("task", "data"))


def shard_batch_prefix(batch, mesh: Mesh, prefix: Sequence[Optional[str]]):
    """Place a host batch onto the mesh, sharding each leaf's leading dims by
    ``prefix`` (e.g. ("task", "data") for [K, B, ...] leaves)."""

    def put(x):
        spec = P(*(list(prefix) + [None] * max(0, x.ndim - len(prefix)))
                 [: x.ndim])
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def shard_batch(batch, mesh: Mesh, task_axis: bool = False):
    """Place a host batch onto the mesh with the right partitioning."""
    prefix = ("task", "data") if task_axis else ("data",)
    return shard_batch_prefix(batch, mesh, prefix)


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
