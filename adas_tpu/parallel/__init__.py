"""Device-mesh parallelism: mesh construction, sharding rules, sharded
inference over stream batches, and the UFLD training step (DP + TP).

The reference is strictly single-device (SURVEY.md §2.3); this package is
the TPU-idiomatic upgrade: a ``jax.sharding.Mesh`` with a ``data`` axis for
batched video streams and a ``model`` axis for tensor-sharding the large FC
heads, with XLA inserting the collectives.
"""
from .mesh import make_mesh
from .sharding import (
    batch_sharding,
    replicated_sharding,
    shard_ufld_params,
    tp_param_spec,
)
from .streams import make_sharded_stream_step
from .train import make_ufld_train_state, make_ufld_train_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_ufld_params",
    "tp_param_spec",
    "make_sharded_stream_step",
    "make_ufld_train_state",
    "make_ufld_train_step",
]
