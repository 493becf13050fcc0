"""Pairwise-IoU as a tiled Pallas TPU kernel.

The O(N²) IoU matrix is the arithmetic bulk of NMS (the reference numba-
jits exactly this loop nest, ObjectDetector/utils.py:128-159).  Here each
(128, 128) output tile is computed in VMEM from two (8, 128) coordinate
blocks — boxes are carried transposed (coords-major) so the lane
dimension is the box index, giving full 8x128 VPU utilization; the greedy
selection scan (ops/nms.py) then just indexes precomputed rows.

Falls back to interpreter mode off-TPU so tests run on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .boxes import pairwise_iou

TILE = 128
# coordinate rows are padded 4 -> 8 to hit the f32 (8, 128) min sublane tile
_CROWS = 8


def _iou_kernel(plus_one: bool):
    off = 1.0 if plus_one else 0.0

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]  # (8, TILE): rows x1, y1, x2, y2, pad...
        b = b_ref[:]
        ax1, ay1, ax2, ay2 = (
            a[0:1, :].T, a[1:2, :].T, a[2:3, :].T, a[3:4, :].T
        )  # (TILE, 1) columns
        bx1, by1, bx2, by2 = b[0:1, :], b[1:2, :], b[2:3, :], b[3:4, :]

        w = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + off, 0.0)
        h = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + off, 0.0)
        inter = w * h
        area_a = (ax2 - ax1 + off) * (ay2 - ay1 + off)
        area_b = (bx2 - bx1 + off) * (by2 - by1 + off)
        union = area_a + area_b - inter
        o_ref[:] = jnp.where(union > 0, inter / union, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("plus_one", "interpret"))
def iou_matrix(
    boxes: jnp.ndarray, plus_one: bool = False, interpret: bool = False
) -> jnp.ndarray:
    """(N, 4) xyxy -> (N, N) IoU, N padded internally to a TILE multiple."""
    n = boxes.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    bt = jnp.zeros((_CROWS, n_pad), jnp.float32)
    bt = bt.at[:4, :n].set(boxes.astype(jnp.float32).T)

    grid = (n_pad // TILE, n_pad // TILE)
    out = pl.pallas_call(
        _iou_kernel(plus_one),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_CROWS, TILE), lambda i, j: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_CROWS, TILE), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bt, bt)
    return out[:n, :n]


def iou_matrix_auto(boxes: jnp.ndarray, plus_one: bool = False) -> jnp.ndarray:
    """Pallas on TPU; XLA broadcast fallback elsewhere (identical math)."""
    if jax.default_backend() == "tpu":
        return iou_matrix(boxes, plus_one=plus_one)
    return pairwise_iou(boxes, boxes, plus_one=plus_one)
