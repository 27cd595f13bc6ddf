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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] sharded over data."""
    return NamedSharding(mesh, P("data"))


def task_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] sharded over (task, data)."""
    return NamedSharding(mesh, P("task", "data"))


def shard_batch(batch, mesh: Mesh, task_axis: bool = False):
    """Place a host batch onto the mesh with the right partitioning."""
    sh = task_batch_sharding(mesh) if task_axis else batch_sharding(mesh)

    def put(x):
        spec = (
            P(*(["task", "data"] + [None] * (x.ndim - 2))[: x.ndim])
            if task_axis
            else P(*(["data"] + [None] * (x.ndim - 1))[: x.ndim])
        )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
