"""EfficientDet detection facade on the fused device path.

API parity with reference ObjectDetector/efficientdetDetector.py:18-110
(``set_defaults``, ``DetectFrame``, ``DrawDetectedOnFrame``,
``object_info``).  The reference depends on an ONNX graph with baked-in
postprocess returning (boxes, ids, confs); here the native flax
EfficientDet (models/efficientdet.py) runs letterbox → trunk → BiFPN →
heads → anchor decode → fixed-shape NMS in ONE jitted step, same contract
as the YOLO path.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.efficientdet import EfficientDet, EfficientDetSpec
from ..ops.preprocess import LetterboxGeometry, imagenet_preprocess
from ..ops.yolo_decode import detections_to_original, select_and_nms
from ..utils.types import ObjectModelType, RectInfo
from .object_detector import ObjectDetectBase


class EfficientdetDetector(ObjectDetectBase):
    """EfficientDet-D{0..2}; ``compound`` picks the scale."""

    _defaults = {
        "model_path": None,
        "model_type": ObjectModelType.EfficientDet,
        "classes_path": None,
        "box_score": 0.6,
        "box_nms_iou": 0.5,
        "compound": 0,
        "max_det": 100,
    }

    def __init__(self, logger=None, **kwargs):
        super().__init__(logger)
        self.__dict__.update(kwargs)
        self._initialize_class(getattr(self, "classes_path", None))

        self.spec = EfficientDetSpec(
            compound=int(getattr(self, "compound", 0)),
            num_classes=len(self.class_names),
        )
        self.net = EfficientDet(self.spec)
        self.variables = self._load_weights()
        self._steps = {}
        if self.logger:
            self.logger.info(
                f"EfficientdetDetector [D{self.spec.compound}] input "
                f"{self.spec.input_size} xla"
            )

    def _load_weights(self):
        if self.model_path is None:
            rng = jax.random.PRNGKey(0)
            s = self.spec.input_size
            return self.net.init(rng, jnp.zeros((1, s, s, 3), jnp.float32))
        if str(self.model_path).endswith(".npz"):
            from ..tools.params_io import load_params

            # pin to device once — numpy leaves would re-upload the whole
            # tree on every DetectFrame call (CLAUDE.md bandwidth trap)
            return jax.device_put(load_params(self.model_path))
        raise ValueError(
            f"Unsupported weights: {self.model_path} (expect .npz or None)"
        )

    def _build_step(self, src_shape):
        s = self.spec.input_size
        geom = LetterboxGeometry(src_shape[0], src_shape[1], s, s)
        box_score = float(self.box_score)
        iou = float(getattr(self, "box_nms_iou", 0.5))
        max_det = int(getattr(self, "max_det", 100))
        net = self.net

        @jax.jit
        def step(variables, frame_bgr):
            x = imagenet_preprocess(frame_bgr[None], geom)
            boxes, cls_probs = net.apply(variables, x)
            boxes, cls_probs = boxes[0], cls_probs[0]
            scores = jnp.max(cls_probs, axis=-1)
            ids = jnp.argmax(cls_probs, axis=-1)
            dets = select_and_nms(
                boxes, scores, ids, box_score=box_score,
                iou_threshold=iou, max_det=max_det,
            )
            return detections_to_original(dets, geom)

        return step

    def DetectFrame(self, srcimg: np.ndarray) -> None:
        src_shape = srcimg.shape[:2]
        if src_shape not in self._steps:
            self._steps[src_shape] = self._build_step(src_shape)
        dets = np.asarray(
            self._steps[src_shape](self.variables, jnp.asarray(srcimg))
        )
        self._object_info = self._dets_to_rectinfo(dets)

    def _dets_to_rectinfo(self, dets: np.ndarray) -> List[RectInfo]:
        results = []
        for x1, y1, x2, y2, score, cid in dets:
            if score <= 0:
                continue
            cid = int(cid)
            label = (
                self.class_names[cid]
                if 0 <= cid < len(self.class_names)
                else "unknown"
            )
            results.append(
                RectInfo(
                    x1, y1, x2 - x1, y2 - y1, conf=float(score), label=label
                )
            )
        return results
