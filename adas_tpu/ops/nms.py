"""Fixed-shape non-maximum suppression for XLA.

The reference runs numba-JIT greedy NMS / soft-NMS on host
(ObjectDetector/utils.py:128-255).  On TPU everything under jit must be
static-shape, so both variants here are formulated as ``max_out`` sequential
selection steps over a padded box tensor with a validity mask — O(max_out·N)
vector work, no dynamic shapes, no host round-trip.

Reference quirk note (SURVEY.md §7): the reference's jitted soft-NMS compares
its ``method`` *string* against ints 1/2, so the linear/gaussian branches are
dead and it always applies hard suppression with VOC ``+1`` box arithmetic.
``method="hard"``+``plus_one=True`` reproduces that effective behavior and is
the parity default; "linear"/"gaussian" implement the intended soft-NMS.

Divergence from the reference: its in-place max-swap
(utils.py:219 ``dets[i,:], dets[maxpos,:] = dets[maxpos,:], tBD`` where
``tBD`` is a *view* of row i) duplicates the max row and loses the
displaced box whenever the input is not already score-sorted, so on
unsorted candidates the reference suppresses against corrupted geometry.
We sort by score up front (top_k) and keep every box intact; on sorted
input — where the reference bug is dormant — the keep sets agree exactly
(tests/test_reference_golden.py golden vs the reference's own code).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import iou_row

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS over padded inputs.

    Args:
        boxes: (N, 4) xyxy; padding rows arbitrary.
        scores: (N,) confidence; padding entries must be <= 0 (use 0/-inf).
        iou_threshold: suppress boxes with IoU > threshold vs a kept box.
        max_out: static output size.

    Returns:
        (indices, count): ``indices`` (max_out,) int32 into the input, padded
        with -1; ``count`` scalar number of valid outputs.  Indices are in
        descending score order.
    """
    return _select_loop(
        boxes, scores, iou_threshold, max_out, method=0, sigma=0.5,
        score_threshold=0.0, plus_one=False,
    )


@functools.partial(
    jax.jit, static_argnames=("max_out", "method", "plus_one")
)
def soft_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.3,
    sigma: float = 0.5,
    score_threshold: float = 0.001,
    max_out: int = 100,
    method: str = "hard",
    plus_one: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (linear / gaussian) or hard NMS with rescoring semantics.

    Matches the reference's effective behavior with the defaults
    (method="hard", plus_one=True): iteratively take the highest-scoring
    box, zero out neighbors above the IoU threshold, keep survivors whose
    (possibly decayed) score exceeds ``score_threshold``.
    """
    method_id = {"linear": 1, "gaussian": 2, "hard": 0}[method]
    return _select_loop(
        boxes, scores, iou_threshold, max_out, method=method_id,
        sigma=sigma, score_threshold=score_threshold, plus_one=plus_one,
    )


def _select_loop(
    boxes, scores, iou_threshold, max_out, method, sigma,
    score_threshold, plus_one, use_iou_matrix=None,
):
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    live_scores = scores.astype(jnp.float32)

    # Optionally precompute the O(N^2) IoU once (tiled Pallas kernel,
    # ops/pallas_iou.py) so the scan is row lookups.  Measured on the
    # fused detect path this loses to XLA's fusion of the per-step
    # iou_row (the matrix materializes through HBM), so it is opt-in —
    # it wins when the same box set feeds several consumers.
    if use_iou_matrix is None:
        use_iou_matrix = False
    iou_mat = None
    if use_iou_matrix:
        from .pallas_iou import iou_matrix_auto

        iou_mat = iou_matrix_auto(boxes, plus_one=plus_one)

    def step(carry, _):
        live, active = carry
        masked = jnp.where(active, live, NEG_INF)
        i = jnp.argmax(masked)
        best = masked[i]
        ok = best > score_threshold
        idx = jnp.where(ok, i, -1).astype(jnp.int32)

        if iou_mat is not None:
            ious = iou_mat[i]
        else:
            ious = iou_row(boxes, boxes[i], plus_one=plus_one)
        over = ious > iou_threshold
        if method == 1:  # linear decay
            weight = jnp.where(over, 1.0 - ious, 1.0)
        elif method == 2:  # gaussian decay
            weight = jnp.exp(-(ious * ious) / sigma)
        else:  # hard suppression
            weight = jnp.where(over, 0.0, 1.0)
        # only rescore boxes still in play; the selected box leaves the pool
        live = jnp.where(active, live * weight, live)
        active = active.at[i].set(False) & ok
        return (live, active), idx

    active0 = live_scores > score_threshold
    (_, _), picked = jax.lax.scan(
        step, (live_scores, active0), None, length=min(max_out, n)
    )
    if picked.shape[0] < max_out:
        picked = jnp.concatenate(
            [picked, jnp.full((max_out - picked.shape[0],), -1, jnp.int32)]
        )
    count = jnp.sum(picked >= 0)
    return picked, count
