"""Box coordinate transforms and IoU, as jit-safe fixed-shape JAX ops.

Replaces the reference's numpy/numba box math (ObjectTracker/byteTrack/
matching.py:34-53, ObjectDetector/utils.py:134-159) with vectorized jnp that
runs on TPU inside the fused per-frame step.
"""
from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x, y, w, h) top-left boxes -> (x1, y1, x2, y2)."""
    xy = boxes[..., 0:2]
    wh = boxes[..., 2:4]
    return jnp.concatenate([xy, xy + wh], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) boxes -> (x, y, w, h) top-left."""
    xy = boxes[..., 0:2]
    wh = boxes[..., 2:4] - xy
    return jnp.concatenate([xy, wh], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) center boxes -> (x1, y1, x2, y2)."""
    c = boxes[..., 0:2]
    half = boxes[..., 2:4] * 0.5
    return jnp.concatenate([c - half, c + half], axis=-1)


def box_area(boxes: jnp.ndarray, plus_one: bool = False) -> jnp.ndarray:
    off = 1.0 if plus_one else 0.0
    return (boxes[..., 2] - boxes[..., 0] + off) * (
        boxes[..., 3] - boxes[..., 1] + off
    )


def pairwise_iou(
    a: jnp.ndarray, b: jnp.ndarray, plus_one: bool = False
) -> jnp.ndarray:
    """IoU matrix between two xyxy box sets: (N, 4) x (M, 4) -> (N, M).

    ``plus_one`` reproduces legacy VOC-style ``+1`` width/height used by the
    reference soft-NMS (ObjectDetector/utils.py:211,236-237).
    """
    off = 1.0 if plus_one else 0.0
    a = a[..., :, None, :]  # (N, 1, 4)
    b = b[..., None, :, :]  # (1, M, 4)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0] + off) * (a[..., 3] - a[..., 1] + off)
    area_b = (b[..., 2] - b[..., 0] + off) * (b[..., 3] - b[..., 1] + off)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_row(
    boxes: jnp.ndarray, box: jnp.ndarray, plus_one: bool = False
) -> jnp.ndarray:
    """IoU of one xyxy ``box`` (4,) against ``boxes`` (N, 4) -> (N,)."""
    off = 1.0 if plus_one else 0.0
    lt = jnp.maximum(boxes[:, :2], box[:2])
    rb = jnp.minimum(boxes[:, 2:], box[2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    union = box_area(boxes, plus_one) + box_area(box, plus_one) - inter
    return jnp.where(union > 0, inter / union, 0.0)
