"""Sharding rules: which parameters go on the ``model`` axis, and helpers
for placing batches and replicated pytrees on a mesh.

Strategy (scaling-book style "pick a mesh, annotate shardings, let XLA
insert collectives"): the convolutional trunks of these models are small
(<30 MB) — replicate them; tensor-parallelism only pays on the UFLD MLP
heads (``cls_fc1``: 1800x2048, ``cls_fc2``: 2048x~117k for CULane), which
we split column-wise then row-wise so the pair needs exactly one
reduce(-scatter) between them and one psum at the end, both on ICI.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (stream-batch) dim over ``data``, replicate rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_param_spec(path: tuple, leaf: Any) -> P:
    """PartitionSpec for one parameter, keyed by its flax path.

    ``cls_fc1`` shards its output features, ``cls_fc2`` its input features
    (megatron column->row split); everything else is replicated.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    if "cls_fc1" in names:
        if names[-1] == "kernel":
            return P(None, "model")
        if names[-1] == "bias":
            return P("model")
    if "cls_fc2" in names and names[-1] == "kernel":
        return P("model", None)
    return P()


def shard_ufld_params(variables: Any, mesh: Mesh) -> Any:
    """Place a UFLD variables pytree on the mesh with TP on the MLP head."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, variables)


def param_shardings(variables: Any, mesh: Mesh) -> Any:
    """The NamedSharding pytree matching :func:`shard_ufld_params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_param_spec(path, leaf)),
        variables,
    )
