"""Mesh construction for ADAS stream-parallel + tensor-parallel execution.

Axes:
* ``data``  — independent video streams (pure DP; exact, no cross-stream
  state lives on device — tracker/analytics state is host-side, mirroring
  the reference's host-side tracker, SURVEY.md §2.3).
* ``model`` — tensor-parallel shards of the large FC heads (UFLD's
  flatten->2048 MLP is the only layer big enough to benefit on these CNNs).

Collectives ride ICI only: DP needs none at inference; TP inserts one
psum per sharded matmul pair.  DCN is never touched.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D (data, model) mesh over the first ``n_devices`` devices.

    ``model_parallel`` defaults to 2 when the device count is even and > 1
    (the FC heads shard cleanly in half), else 1.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} present"
        )
    devices = devices[:n_devices]
    if model_parallel is None:
        model_parallel = 2 if (n_devices % 2 == 0 and n_devices > 1) else 1
    if n_devices % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide {n_devices}"
        )
    grid = np.asarray(devices).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names=tuple(axis_names))
