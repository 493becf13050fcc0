"""Training checkpoint / resume for the sharded UFLD trainer.

The reference has no runtime checkpointing; its "checkpoints" are the
offline model artifacts (SURVEY.md §5).  The trainer here is real, so
this supplies orbax-backed save/restore of the full train state (params,
batch stats, optimizer state, step) with mesh shardings reapplied on
restore — resume is exact on any mesh of the same shape.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def save_train_state(path: str, state: Dict[str, Any], step: int) -> str:
    """Write ``state`` (+ step) under ``path/step_<n>``; returns the dir."""
    path = os.path.abspath(os.path.expanduser(path))
    target = os.path.join(path, f"step_{step:08d}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(target, {"state": state, "step": np.asarray(step)})
    ckpt.wait_until_finished()
    return target


def latest_checkpoint(path: str) -> Optional[str]:
    path = os.path.abspath(os.path.expanduser(path))
    if not os.path.isdir(path):
        return None
    steps = sorted(
        d for d in os.listdir(path)
        if d.startswith("step_") and os.path.isdir(os.path.join(path, d))
    )
    return os.path.join(path, steps[-1]) if steps else None


def restore_train_state(
    target: str, example_state: Dict[str, Any]
) -> tuple:
    """Restore (state, step); leaves land with ``example_state``'s
    shardings (pass the freshly-initialized state from
    ``make_ufld_train_state``)."""
    ckpt = ocp.StandardCheckpointer()
    template = {
        "state": example_state,
        "step": np.asarray(0),
    }
    restored = ckpt.restore(target, template)
    return restored["state"], int(restored["step"])
