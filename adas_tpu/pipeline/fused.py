"""Fused per-frame device step: object detection + lane detection in ONE
jitted XLA graph, with async submit/fetch for software pipelining.

Motivation (measured on the tunneled TPU): a single dispatch+fetch
round-trip costs ~30-90 ms of latency while the actual compute is a few
ms, so the reference-style one-call-per-model loop (demo.py:268-281) is
latency-bound.  Fusing both models into one graph halves the round-trips,
and the submit/fetch split lets frame N+1's dispatch overlap frame N's
fetch — dispatch is async in JAX; only ``device_get`` blocks
(SURVEY.md §7 "one jitted mega-step").
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packing import pack, unpack
from ..ops.preprocess import LetterboxGeometry, ufld_v2_preprocess, yolo_preprocess
from ..ops.ufld_decode import ufld_v2_decode
from ..ops.yolo_decode import (
    decode_predictions,
    detections_to_original,
    select_and_nms,
)


class FusedADASStep:
    """Runs YoloDetector + UltrafastLaneDetectorV2 as one device step.

    ``submit(frame)`` dispatches and returns a handle immediately;
    ``fetch(handle)`` blocks, then populates both detectors' result state
    (``object_info`` / ``lane_info``) exactly as their own DetectFrame
    would.
    """

    def __init__(self, yolo, lane):
        self.yolo = yolo
        self.lane = lane
        self._steps = {}

    def _build(self, src_shape: Tuple[int, int]):
        yolo, lane = self.yolo, self.lane
        h, w = yolo.spec.input_size
        geom = LetterboxGeometry(src_shape[0], src_shape[1], h, w)
        yspec = yolo.spec
        lspec = lane.spec
        box_score = float(yolo.box_score)
        iou = float(getattr(yolo, "box_nms_iou", 0.45))
        max_det = int(getattr(yolo, "max_det", 100))
        model_type = yolo.model_type
        ynet, lnet = yolo.net, lane.net

        spec_holder = {}

        @jax.jit
        def step(yolo_vars, lane_vars, frame_bgr):
            x = yolo_preprocess(frame_bgr[None], geom)
            raw = ynet.apply(yolo_vars, x)[0]
            boxes, scores, ids = decode_predictions(
                raw, model_type, yspec.num_classes, yspec.input_size
            )
            dets = select_and_nms(
                boxes, scores, ids, box_score=box_score,
                iou_threshold=iou, max_det=max_det,
            )
            dets = detections_to_original(dets, geom)

            lx = ufld_v2_preprocess(
                frame_bgr[None], lspec.input_height, lspec.input_width,
                lspec.crop_ratio, dtype=lnet.dtype,
            )
            louts = lnet.apply(lane_vars, lx)
            louts = {k: v.astype(jnp.float32) for k, v in louts.items()}
            lanes = ufld_v2_decode(louts)
            # one packed vector -> one device→host transfer at fetch time
            flat, spec = pack((dets, lanes))
            spec_holder["spec"] = spec
            return flat

        return step, spec_holder

    def submit(self, frame: np.ndarray):
        """Dispatch the fused step; returns (handle, frame_shape)."""
        src_shape = frame.shape[:2]
        if src_shape not in self._steps:
            self._steps[src_shape] = self._build(src_shape)
        step, spec_holder = self._steps[src_shape]
        out = step(
            self.yolo.variables, self.lane.variables, jnp.asarray(frame)
        )
        return out, spec_holder, src_shape

    def fetch(self, handle) -> None:
        """Block on the device result and populate both detectors."""
        flat, spec_holder, src_shape = handle
        h, w = src_shape
        dets, decoded = unpack(np.asarray(flat), spec_holder["spec"])
        self.yolo._object_info = self.yolo._dets_to_rectinfo(dets)
        self.lane._assemble(decoded, w, h)
        self.lane._finalize(h)

    def run(self, frame: np.ndarray) -> None:
        """Synchronous convenience: submit + fetch."""
        self.fetch(self.submit(frame))
