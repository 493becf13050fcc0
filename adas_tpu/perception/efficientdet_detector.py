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
    """EfficientDet-D{0..7}; ``compound`` picks the scale."""

    _defaults = {
        "model_path": None,
        "model_type": ObjectModelType.EfficientDet,
        "classes_path": None,
        "box_score": 0.6,
        "box_nms_iou": 0.5,
        "compound": 0,
        "max_det": 100,
        # serve at a non-default square resolution (multiple of 128);
        # None keeps the compound's paper size
        "input_size": None,
        # "int8" runs trunk/BiFPN/head convs as W8A8 int8 MXU convs
        # (models/efficientdet._conv_same); headers stay f32
        "compute_dtype": None,
    }

    def __init__(self, logger=None, engine=None, **kwargs):
        super().__init__(logger)
        self.__dict__.update(kwargs)
        self._initialize_class(getattr(self, "classes_path", None))

        # The reference consumes EfficientDet ONLY as an ONNX export with
        # baked-in postprocess returning (boxes, ids, confs)
        # (efficientdetDetector.py:38,67-83); a .onnx model_path takes the
        # graph-executor path for the same contract.  Other paths run the
        # native flax net.
        if engine is None and str(self.model_path).endswith(".onnx"):
            from ..engine.onnx_engine import OnnxGraphEngine

            engine = OnnxGraphEngine(self.model_path)
        self.engine = engine
        if engine is not None:
            self.set_input_details(engine)
            self.set_output_details(engine)
        else:
            num_classes = len(self.class_names)
            ckpt_state = None
            if str(self.model_path).endswith((".pth", ".pt")):
                from ..tools.torch_import import load_state_dict

                ckpt_state = load_state_dict(self.model_path)
                # the graph must match the checkpoint's class count
                # (zylo117 releases are 90-way COCO)
                num_classes = (
                    ckpt_state[
                        "classifier.header.pointwise_conv.conv.bias"
                    ].size
                    // 9
                )
            self.spec = EfficientDetSpec(
                compound=int(getattr(self, "compound", 0)),
                num_classes=num_classes,
                input_size_override=getattr(self, "input_size", None),
            )
            self.net = EfficientDet(self.spec)
            self.variables = self._load_weights(ckpt_state)
        self._steps = {}
        if self.logger:
            which = (
                f"engine {engine.framework_type}"
                if engine is not None
                else f"D{self.spec.compound} input {self.spec.input_size}"
            )
            self.logger.info(f"EfficientdetDetector [{which}] xla")

    def _load_weights(self, ckpt_state=None):
        if ckpt_state is not None:
            # zylo117 Yet-Another-EfficientDet-Pytorch .pth release
            # (the weights behind the reference's ONNX export)
            from ..tools.efficientdet_import import efficientdet_variables

            variables = efficientdet_variables(ckpt_state, self.spec)
        elif self.model_path is None:
            rng = jax.random.PRNGKey(0)
            s = self.spec.input_size
            variables = self.net.init(
                rng, jnp.zeros((1, s, s, 3), jnp.float32)
            )
        elif str(self.model_path).endswith(".npz"):
            from ..tools.params_io import load_params

            variables = load_params(self.model_path)
        else:
            raise ValueError(
                f"Unsupported weights: {self.model_path} "
                "(expect .pth/.npz/.onnx or None)"
            )
        if getattr(self, "compute_dtype", None) == "int8":
            # pre-quantize Int8Conv kernels once at load (TRT's offline
            # engine build step — tools.quantize.pack_int8_weights)
            from ..tools.quantize import pack_int8_weights

            s = self.spec.input_size
            x0 = jnp.zeros((1, s, s, 3), jnp.float32)
            variables = pack_int8_weights(
                lambda v: self.net.apply(v, x0, mutable=["wscales"]),
                variables,
            )
        # pin to device once — numpy leaves would re-upload the whole
        # tree on every DetectFrame call (CLAUDE.md bandwidth trap)
        return jax.device_put(variables)

    def calibrate_int8(self, frames) -> None:
        """Static activation-scale calibration (see
        YoloDetector.calibrate_int8); requires compute_dtype='int8'."""
        if getattr(self, "compute_dtype", None) != "int8":
            raise ValueError("calibrate_int8 requires compute_dtype='int8'")
        if self.engine is not None:
            raise ValueError("calibration needs the native-graph path")
        from ..tools.quantize import calibrate_act_scales

        s = self.spec.input_size

        def apply_fn(variables, frame):
            geom = LetterboxGeometry(frame.shape[0], frame.shape[1], s, s)
            x = imagenet_preprocess(jnp.asarray(frame)[None], geom)
            return self.net.apply(variables, x, mutable=["act_scales"])

        self.variables = jax.device_put(
            calibrate_act_scales(apply_fn, self.variables, frames)
        )
        self._steps = {}

    def _build_step(self, src_shape):
        s = self.spec.input_size
        geom = LetterboxGeometry(src_shape[0], src_shape[1], s, s)
        box_score = float(self.box_score)
        iou = float(getattr(self, "box_nms_iou", 0.5))
        max_det = int(getattr(self, "max_det", 100))
        net = self.net
        quant_mode = getattr(self, "compute_dtype", None)

        @jax.jit
        def step(variables, frame_bgr):
            import contextlib

            from ..models.layers import quantized

            x = imagenet_preprocess(frame_bgr[None], geom)
            with quantized(quant_mode) if quant_mode == "int8" \
                    else contextlib.nullcontext():
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
        if self.engine is not None:
            self._detect_via_engine(srcimg)
            return
        src_shape = srcimg.shape[:2]
        if src_shape not in self._steps:
            self._steps[src_shape] = self._build_step(src_shape)
        dets = np.asarray(
            self._steps[src_shape](self.variables, jnp.asarray(srcimg))
        )
        self._object_info = self._dets_to_rectinfo(dets)

    def _detect_via_engine(self, srcimg: np.ndarray) -> None:
        """Postprocessed-export path (reference efficientdetDetector.py:
        58-92): letterbox, BGR ImageNet-normalize (zylo117 models are
        BGR-trained — the reference's mean tuple is BGR-ordered), run the
        graph, un-letterbox the already-NMSed boxes, score-filter."""
        h, w = self.input_shapes[-2:]
        geom = LetterboxGeometry(srcimg.shape[0], srcimg.shape[1], h, w)
        x = imagenet_preprocess(
            jnp.asarray(srcimg)[None], geom,
            mean=(0.406, 0.456, 0.485), std=(0.225, 0.224, 0.229),
            swap_rb=False,
        )
        outs = self.engine.engine_inference(
            np.transpose(np.asarray(x), (0, 3, 1, 2))
        )
        boxes, ids, confs = (np.asarray(o) for o in outs[:3])
        boxes = boxes.reshape(-1, 4)
        ids = ids.reshape(-1).astype(int)
        confs = confs.reshape(-1)
        boxes = geom.boxes_to_original(boxes)
        results = []
        for bbox, cid, conf in zip(boxes, ids, confs):
            if conf < float(self.box_score):
                continue
            x1, y1, x2, y2 = bbox
            label = (
                self.class_names[cid]
                if 0 <= cid < len(self.class_names)
                else "unknown"
            )
            results.append(
                RectInfo(
                    x1, y1, x2 - x1, y2 - y1, conf=float(conf), label=label
                )
            )
        self._object_info = results

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
