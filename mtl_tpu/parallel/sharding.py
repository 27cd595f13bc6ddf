"""Tensor-parallel parameter sharding rules (stretch Conformer config).

Megatron-style column/row splits over the ``model`` mesh axis, expressed as
PartitionSpecs matched against flax parameter paths:

* q/k/v (or query/key/value) projections and FFN up-projections: columns
  (output features) over ``model``;
* attention output projections and FFN down-projections: rows (input
  features) over ``model``;
* everything else (norms, biases, embeddings, convs): replicated.

Under jit, sharded params + data-sharded activations make XLA insert the
all-reduces over ICI — no hand-written collectives.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec for 2-D kernels) — first match wins
_RULES = [
    # column-parallel: split output features
    (re.compile(r"(query_linear|key_linear|value_linear|/q/|/k/|/v/|"
                r"linear_1|pw1|ff\d/Dense_0)"), ("col",)),
    # row-parallel: split input features
    (re.compile(r"(output_linear|/out/|linear_2|pw2|ff\d/Dense_1)"), ("row",)),
]


def _spec_for(path: str, ndim: int) -> P:
    if ndim < 2:
        return P()  # biases / norm scales replicated
    for rx, (kind,) in _RULES:
        if rx.search(path):
            if kind == "col":
                return P(*([None] * (ndim - 1) + ["model"]))
            return P(*(["model"] + [None] * (ndim - 1)))
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for the params under Megatron-style TP."""

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = {}

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    leaves_with_path, treedef = flat
    sharded = [
        NamedSharding(mesh, _spec_for(path_str(kp), leaf.ndim))
        for kp, leaf in leaves_with_path
    ]
    return jax.tree_util.tree_unflatten(treedef, sharded)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh with TP shardings (model axis must divide the
    split dimensions)."""
    return jax.device_put(params, tp_param_shardings(params, mesh))
