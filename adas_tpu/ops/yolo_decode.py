"""YOLO head decode + candidate selection as fused fixed-shape device ops.

Replaces the reference's per-detection host loop
(ObjectDetector/yoloDetector.py:104-133) and numba NMS with one XLA graph:
raw network output -> confidence/class reduction -> top-k candidate
pre-selection -> padded NMS -> letterbox inverse -> compact (max_det, 6)
detections [x1, y1, x2, y2, score, class_id] in source-image coordinates.

Output-contract handling per family (reference yoloDetector.py:110-124):
* v8/v9/v10 raw: (4+nc, N) — class prob is the confidence
* v5/v6/v7:     (N, 5+nc) — confidence = obj_conf * cls_conf
* v5-lite:      (N, 5+nc) pre-grid-decode — apply anchor/grid transform
  first (reference YoloLiteParameters.lite_postprocess, yoloDetector.py:36-50)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.types import ObjectModelType
from .boxes import cxcywh_to_xyxy
from .nms import _select_loop
from .preprocess import LetterboxGeometry

_V8_LIKE = (
    ObjectModelType.YOLOV8,
    ObjectModelType.YOLOV9,
    ObjectModelType.YOLOV10,
)

V5LITE_ANCHORS = np.array(
    [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
     [116, 90, 156, 198, 373, 326]],
    np.float32,
).reshape(3, 3, 2)


def v5lite_grid_decode(
    output: jnp.ndarray, input_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Anchor/grid decode for YOLOv5-lite exports whose graph stops before
    the grid transform.  ``output``: (N, 5+nc) with sigmoided xywh."""
    h_in, w_in = input_hw
    strides = (8.0, 16.0, 32.0)
    xs, ws, rest = [], [], []
    row = 0
    na = V5LITE_ANCHORS.shape[1]
    pieces = []
    for level, stride in enumerate(strides):
        gh, gw = int(h_in / stride), int(w_in / stride)
        length = na * gh * gw
        ys_g, xs_g = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        grid = np.stack([xs_g, ys_g], -1).reshape(-1, 2).astype(np.float32)
        grid = np.tile(grid, (na, 1))  # (na*gh*gw, 2)
        anchors = np.repeat(V5LITE_ANCHORS[level], gh * gw, axis=0)
        seg = output[row : row + length]
        xy = (seg[:, 0:2] * 2.0 - 0.5 + jnp.asarray(grid)) * stride
        wh = (seg[:, 2:4] * 2.0) ** 2 * jnp.asarray(anchors)
        pieces.append(jnp.concatenate([xy, wh, seg[:, 4:]], axis=1))
        row += length
    return jnp.concatenate(pieces, axis=0)


def decode_predictions(
    raw: jnp.ndarray,
    model_type: ObjectModelType,
    num_classes: int,
    input_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image raw output -> (boxes_xyxy (N,4), scores (N,), ids (N,))."""
    if model_type in _V8_LIKE:
        preds = raw.T  # (N, 4+nc)
        cls_probs = preds[:, 4:]
        scores = jnp.max(cls_probs, axis=-1)
        class_ids = jnp.argmax(cls_probs, axis=-1)
        boxes = cxcywh_to_xyxy(preds[:, :4])
    else:
        preds = raw
        if model_type == ObjectModelType.YOLOV5_LITE:
            assert input_hw is not None
            preds = v5lite_grid_decode(preds, input_hw)
        cls_probs = preds[:, 5:] * preds[:, 4:5]
        scores = jnp.max(cls_probs, axis=-1)
        class_ids = jnp.argmax(cls_probs, axis=-1)
        boxes = cxcywh_to_xyxy(preds[:, :4])
    return boxes, scores, class_ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "box_score", "iou_threshold", "max_det", "pre_topk", "hard_only",
    ),
)
def select_and_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    box_score: float = 0.4,
    iou_threshold: float = 0.45,
    max_det: int = 100,
    pre_topk: int = 512,
    hard_only: bool = True,
) -> jnp.ndarray:
    """Threshold + top-k preselect + class-agnostic NMS -> (max_det, 6).

    Rows are [x1, y1, x2, y2, score, class_id], padded with score 0.
    ``hard_only=True`` matches the reference's effective soft-NMS behavior
    (hard suppression, VOC +1 arithmetic — see ops/nms.py docstring).
    """
    scores = jnp.where(scores > box_score, scores, 0.0)
    k = min(pre_topk, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    top_ids = class_ids[idx]

    keep, _ = _select_loop(
        top_boxes, top_scores, iou_threshold, max_det,
        method=0 if hard_only else 2, sigma=0.5,
        score_threshold=0.001, plus_one=True,
    )
    valid = keep >= 0
    gather = jnp.clip(keep, 0, k - 1)
    out = jnp.concatenate(
        [
            top_boxes[gather],
            top_scores[gather][:, None],
            top_ids[gather][:, None].astype(jnp.float32),
        ],
        axis=-1,
    )
    return jnp.where(valid[:, None], out, 0.0)


def detections_to_original(
    dets: jnp.ndarray, geom: LetterboxGeometry
) -> jnp.ndarray:
    """Map padded (max_det, 6) detections from letterboxed to source
    coordinates on device."""
    boxes = geom.boxes_to_original_jnp(dets[:, :4])
    return jnp.concatenate([boxes, dets[:, 4:]], axis=-1)
