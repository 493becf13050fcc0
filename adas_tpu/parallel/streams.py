"""Multi-stream data-parallel inference: N video feeds, one jitted step.

The reference processes one frame per loop iteration on one GPU
(demo.py:261-316).  The TPU-idiomatic upgrade (BASELINE.md config 5) is a
*batch of streams*: stack N frames (one per feed), shard the batch over the
``data`` mesh axis, and run the fused preprocess->net->decode->NMS step
once.  Tracker/analytics state stays host-side per stream, so DP is exact.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import batch_sharding, param_shardings


def make_sharded_stream_step(
    batched_step: Callable,
    variables,
    mesh: Mesh,
    batch_ndim: int = 4,
) -> Callable:
    """Wrap a batched device step ``f(variables, frames) -> dets`` so the
    frame batch is sharded over ``data`` and params follow the TP rules.

    Returns ``step(frames)`` closing over mesh-placed variables; outputs
    keep the ``data`` sharding so each stream's detections can be fetched
    independently (device→host copies only move that shard).
    """
    in_batch = batch_sharding(mesh, batch_ndim)
    p_shard = param_shardings(variables, mesh)
    placed = jax.device_put(variables, p_shard)

    jitted = jax.jit(
        batched_step,
        in_shardings=(p_shard, in_batch),
        out_shardings=NamedSharding(mesh, P("data")),
    )

    def step(frames):
        return jitted(placed, frames)

    return step
