"""Object detection facades: YOLO v5..v10 / EfficientDet on the fused path.

API parity with the reference detectors (ObjectDetector/yoloDetector.py:52-192,
efficientdetDetector.py:18-110): ``set_defaults``, ``DetectFrame``,
``DrawDetectedOnFrame``, ``object_info`` returning ``RectInfo`` rows.

Architecture (SURVEY.md §7): one jitted graph per source frame shape runs
letterbox -> backbone -> head -> decode -> NMS -> inverse letterbox on
device; a single compact (max_det, 6) tensor returns to host.
"""
from __future__ import annotations

import contextlib
import os
import random
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import quantized
from ..models.yolo import YoloSpec, build_yolo
from ..ops.preprocess import LetterboxGeometry, yolo_preprocess
from ..ops.yolo_decode import (
    decode_predictions,
    detections_to_original,
    select_and_nms,
)
from ..utils.types import ObjectModelType, RectInfo, hex_to_rgb

DEFAULT_CLASSES = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "coco_label.txt"
)

_FAMILY_OF = {
    ObjectModelType.YOLOV5: "v5",
    ObjectModelType.YOLOV5_LITE: "v5lite",  # ShuffleNetV2 native graph
    ObjectModelType.YOLOV6: "v6",  # EfficientRep/RepPAN native graph
    ObjectModelType.YOLOV7: "v7",  # E-ELAN native graph
    ObjectModelType.YOLOV8: "v8",
    ObjectModelType.YOLOV9: "v9",
    ObjectModelType.YOLOV10: "v10",
}


class ObjectDetectBase:
    """Config + drawing surface shared by the object detectors."""

    _defaults = {
        "model_path": None,
        "model_type": None,
        "classes_path": None,
        "box_score": None,
    }

    @classmethod
    def set_defaults(cls, config: dict) -> None:
        cls._defaults = config

    @classmethod
    def check_defaults(cls) -> dict:
        return cls._defaults

    @classmethod
    def get_defaults(cls, name: str):
        if name in cls._defaults:
            return cls._defaults[name]
        return f"Unrecognized attribute name '{name}'"

    def __init__(self, logger=None):
        self.__dict__.update(self._defaults)
        self.logger = logger

    def set_input_details(self, engine) -> None:
        """Record engine input geometry (reference ObjectDetector/
        core.py:73-80): shape, NCHW channel count and dtype."""
        self.input_shapes = tuple(engine.get_engine_input_shape())
        self.input_types = engine.engine_dtype
        self.channel_count = self.input_shapes[1]
        if self.logger:
            self.logger.info(
                f"-> Input Shape : {self.input_shapes}"
            )

    def set_output_details(self, engine) -> None:
        """Record engine output shapes/names (reference ObjectDetector/
        core.py:82-91)."""
        shapes, names = engine.get_engine_output_shape()
        self.output_shapes = shapes
        self.output_names = names
        if self.logger:
            self.logger.info(
                f"-> Output Shape : {shapes} Names : {names}"
            )

    @property
    def object_info(self) -> List[RectInfo]:
        if not hasattr(self, "_object_info"):
            self._object_info = []
            if self.logger:
                self.logger.war(
                    "Can't get object information, maybe you forget to use "
                    "detect api."
                )
        return self._object_info

    def _initialize_class(self, classes_path: Optional[str]) -> None:
        classes_path = os.path.expanduser(classes_path or DEFAULT_CLASSES)
        if not os.path.isfile(classes_path):
            raise FileNotFoundError(f"{classes_path} is not exist.")
        with open(classes_path) as f:
            self.class_names = [c.strip() for c in f.readlines()]
        colors = [
            hex_to_rgb("#%06x" % random.randint(0, 0xFFFFFF))
            for _ in self.class_names
        ]
        self.colors_dict = dict(zip(self.class_names, colors))

    @staticmethod
    def cornerRect(
        img, bbox, t: int = 5, rt: int = 1,
        colorR=(255, 0, 255), colorC=(0, 255, 0),
    ):
        import cv2

        xmin, ymin, xmax, ymax = bbox
        l = max(1, int(min(ymax - ymin, xmax - xmin) * 0.2))
        if rt != 0:
            cv2.rectangle(img, (xmin, ymin), (xmax, ymax), colorR, rt)
        for (cx, cy), (dx, dy) in (
            ((xmin, ymin), (l, 0)), ((xmin, ymin), (0, l)),
            ((xmax, ymin), (-l, 0)), ((xmax, ymin), (0, l)),
            ((xmin, ymax), (l, 0)), ((xmin, ymax), (0, -l)),
            ((xmax, ymax), (-l, 0)), ((xmax, ymax), (0, -l)),
        ):
            cv2.line(img, (cx, cy), (cx + dx, cy + dy), colorC, t)
        return img

    def DrawDetectedOnFrame(self, frame_show: np.ndarray) -> None:
        import cv2

        tl = 3
        for info in self.object_info:
            xmin, ymin, xmax, ymax = info.tolist()
            label = info.label
            for kp in info.kpss:
                cv2.circle(frame_show, kp, 1, (255, 255, 255), thickness=-1)
            color = self.colors_dict.get(label, (0, 0, 0))
            t_size = cv2.getTextSize(label, 0, fontScale=tl / 3, thickness=2)[0]
            c2 = (xmin + t_size[0], ymin - t_size[1] - 3)
            cv2.rectangle(frame_show, (xmin, ymin), c2, color, -1, cv2.LINE_AA)
            self.cornerRect(
                frame_show, info.tolist(), colorR=color, colorC=color
            )
            cv2.putText(
                frame_show, label, (xmin + 2, ymin - 7),
                cv2.FONT_HERSHEY_TRIPLEX, tl / 4, (255, 255, 255), 2,
            )


class YoloDetector(ObjectDetectBase):
    """YOLO family detector running the fused jitted device step.

    ``model_path``: ``.npz`` weights (params_io) or None for random init;
    ``scale`` picks the model card (n/s/m/l/x).  An injected ``engine``
    (EngineBase) replaces the native graph, keeping decode on device —
    the seam for ONNX-ingested models and tests.
    """

    _defaults = {
        "model_path": None,
        "model_type": ObjectModelType.YOLOV5,
        "classes_path": None,
        "box_score": 0.4,
        "box_nms_iou": 0.45,
        "scale": "n",
        "max_det": 100,
        "input_size": (640, 640),
        # None=f32; "bf16" runs the graph on the MXU in bf16; "int8" runs
        # every ConvBN as W8A8 int8 MXU conv (models/layers.py Int8Conv)
        "compute_dtype": None,
        # v10 only: serve the one-to-one head (top-k, no NMS) — the
        # YOLOv10 design the reference routes through NMS anyway
        # (yoloDetector.py:114,139); BASELINE config 5 serves it NMS-free
        "nms_free": False,
        # .onnx handling: "auto" = ingest weights into the native graph,
        # falling back to executing the ONNX graph via XLA when the
        # checkpoint doesn't map (real v6/v7/v5-lite exports);
        # "graph" = always execute the graph; "ingest" = never fall back
        "onnx_mode": "auto",
    }

    def __init__(self, logger=None, engine=None, **kwargs):
        super().__init__(logger)
        self.__dict__.update(kwargs)
        self._initialize_class(getattr(self, "classes_path", None))

        # extension dispatch (reference picks TRT vs ONNX by suffix,
        # yoloDetector.py:74-77): .adas = serialized AOT engine artifact,
        # .onnx = graph execution (reference OnnxEngine parity) unless the
        # checkpoint ingests into the native graph
        onnx_mode = getattr(self, "onnx_mode", "auto")
        is_onnx = str(self.model_path).endswith(".onnx")
        if engine is None and str(self.model_path).endswith(".adas"):
            from ..engine.artifact import CompiledEngine

            engine = CompiledEngine(self.model_path)
        if engine is None and is_onnx and onnx_mode == "graph":
            from ..engine.onnx_engine import OnnxGraphEngine

            engine = OnnxGraphEngine(self.model_path)

        family = _FAMILY_OF[self.model_type]
        scale = getattr(self, "scale", "n")
        if family == "v9" and scale not in ("c",):
            scale = "c"  # GELAN-C is the supported v9 variant
        if family == "v6" and scale not in ("n", "s", "m", "l"):
            scale = "s"
        if family == "v5lite" and scale not in ("e", "s", "g"):
            scale = "s"
        self.spec = YoloSpec(
            family=family,
            scale=scale,
            num_classes=len(self.class_names),
            input_size=tuple(getattr(self, "input_size", (640, 640))),
        )
        if engine is None:
            self.net = build_yolo(self.spec)
            try:
                self.variables = self._load_weights()
            except (KeyError, NotImplementedError) as err:
                # checkpoint doesn't map onto the native graph (e.g. a
                # real v6 EfficientRep / v7 E-ELAN / v5-lite export):
                # execute the exported graph itself, like the reference's
                # OnnxEngine (coreEngine.py:159-186)
                if not (is_onnx and onnx_mode == "auto"):
                    raise
                if self.logger:
                    self.logger.war(
                        f"native weight ingest failed ({err}); executing "
                        "the ONNX graph via XLA instead"
                    )
                from ..engine.onnx_engine import OnnxGraphEngine

                engine = OnnxGraphEngine(self.model_path)
                del self.net
        self.engine = engine
        if engine is not None:
            self.set_input_details(engine)
            self.set_output_details(engine)
            n, c, h, w = engine.get_engine_input_shape()
            self.spec = YoloSpec(
                family=self.spec.family, scale=self.spec.scale,
                num_classes=self.spec.num_classes, input_size=(h, w),
            )
        self._steps = {}
        if self.logger:
            self.logger.info(
                f"YoloDetector [{self.model_type.name}-{self.spec.scale}] "
                f"input {self.spec.input_size} xla"
            )

    def _load_weights(self):
        variables = self._load_weights_f32()
        if self.spec.family == "v6":
            # serve v6 in RepVGG deploy form: switch_to_deploy at load
            # (models/yolov6.fuse_repvgg_variables) — one 3×3 MXU conv
            # per block instead of three branches + adds, and the fused
            # convs become int8-eligible dense 3×3s
            from ..models.yolov6 import fuse_repvgg_variables

            variables = fuse_repvgg_variables(variables)
        cd = getattr(self, "compute_dtype", None)
        if cd in ("bf16", "fp16"):
            from ..tools.quantize import cast_params

            variables = cast_params(variables, cd)
        elif cd == "int8":
            # pre-quantize Int8Conv kernels once at load (TRT's offline
            # engine build): int8 kernels + wscales collection in the
            # tree, no per-step weight quantize, 4x less weight HBM
            variables = self._pack_int8(variables)
        # pin to device once: host (numpy) leaves would re-upload the
        # whole weight tree on EVERY step call
        return jax.device_put(variables)

    def _pack_int8(self, variables):
        from ..tools.quantize import pack_int8_weights

        h, w = self.spec.input_size
        x0 = jnp.zeros((1, h, w, 3), jnp.float32)
        v10 = self.spec.family == "v10"

        def apply_fn(v):
            kw = dict(mutable=["wscales"])
            if v10:
                return self.net.apply(v, x0, method=self.net.both, **kw)
            return self.net.apply(v, x0, **kw)

        return pack_int8_weights(apply_fn, variables)

    def _load_weights_f32(self):
        if self.model_path is None:
            rng = jax.random.PRNGKey(0)
            h, w = self.spec.input_size
            x0 = jnp.zeros((1, h, w, 3), jnp.float32)
            if self.spec.family == "v10":
                return self.net.init(rng, x0, method=self.net.both)
            return self.net.init(rng, x0)
        if str(self.model_path).endswith("_int8.npz"):
            from ..tools.quantize import load_int8

            return load_int8(self.model_path)
        if str(self.model_path).endswith(".npz"):
            from ..tools.params_io import load_params

            return load_params(self.model_path)
        if str(self.model_path).endswith((".pth", ".pt")):
            from ..tools.torch_import import load_state_dict
            from ..tools.yolo_import import yolo_variables

            return yolo_variables(
                load_state_dict(self.model_path), self.spec
            )
        if str(self.model_path).endswith(".onnx"):
            from ..tools.onnx_import import read_onnx_initializers
            from ..tools.yolo_import import yolo_variables

            return yolo_variables(
                read_onnx_initializers(self.model_path), self.spec
            )
        raise ValueError(
            f"Unsupported weights: {self.model_path} "
            "(expect .npz/.pth/.onnx or None)"
        )

    def calibrate_int8(self, frames) -> None:
        """Static activation-scale calibration from sample source frames
        (the reference's TRT ``Calibrator`` contract — feed real images,
        convertOnnxToTensorRT.py:28-99).  Records per-conv absmax into an
        ``act_scales`` collection; later int8 steps quantize activations
        with those STATIC scales instead of a per-conv dynamic reduce."""
        if getattr(self, "compute_dtype", None) != "int8":
            raise ValueError("calibrate_int8 requires compute_dtype='int8'")
        if self.engine is not None:
            raise ValueError("calibration needs the native-graph path")
        from ..tools.quantize import calibrate_act_scales

        h, w = self.spec.input_size
        v10 = self.spec.family == "v10"

        def apply_fn(variables, frame):
            geom = LetterboxGeometry(frame.shape[0], frame.shape[1], h, w)
            x = yolo_preprocess(
                jnp.asarray(frame)[None], geom, dtype=jnp.float32
            )
            kw = dict(mutable=["act_scales"])
            if v10:
                return self.net.apply(
                    variables, x, method=self.net.both, **kw
                )
            return self.net.apply(variables, x, **kw)

        self.variables = jax.device_put(
            calibrate_act_scales(apply_fn, self.variables, frames)
        )
        self._steps = {}  # retrace: steps now bake in static scales

    def _build_step(self, src_shape):
        h, w = self.spec.input_size
        geom = LetterboxGeometry(src_shape[0], src_shape[1], h, w)
        spec = self.spec
        box_score = float(self.box_score)
        iou = float(self.box_nms_iou)
        max_det = int(getattr(self, "max_det", 100))
        net = getattr(self, "net", None)
        compute_dtype = getattr(self, "compute_dtype", None)
        nms_free = bool(getattr(self, "nms_free", False))
        if nms_free and spec.family != "v10":
            raise ValueError("nms_free serving requires a YOLOv10 model")

        in_dtype = (
            jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
        )
        quant = (
            quantized("int8")
            if compute_dtype == "int8"
            else contextlib.nullcontext()
        )

        @jax.jit
        def step(variables, frame_bgr):
            x = yolo_preprocess(frame_bgr[None], geom, dtype=in_dtype)
            if nms_free:
                # v10 one-to-one head: (1, k, 6) already-selected
                # detections, no NMS stage at all
                with quant:
                    dets = net.apply(
                        variables, x, method=net.one2one
                    )[0]
                dets = dets.astype(jnp.float32)
                keep = dets[:, 4] >= box_score
                dets = dets * keep[:, None].astype(jnp.float32)
                dets = dets[: max_det]
                return detections_to_original(dets, geom)
            with quant:
                raw = net.apply(variables, x)[0].astype(jnp.float32)
            boxes, scores, ids = decode_predictions(
                raw, self.model_type, spec.num_classes, spec.input_size
            )
            dets = select_and_nms(
                boxes, scores, ids, box_score=box_score,
                iou_threshold=iou, max_det=max_det,
            )
            return detections_to_original(dets, geom)

        return step

    def export_fused(
        self, out_path: str, frame_hw, platforms=None
    ) -> dict:
        """Serialize the FUSED step (uint8 frame -> (max_det, 6) dets in
        source coords) as a ``.adas`` artifact — single-round-trip
        serving, the true analogue of the reference's one
        h2d→execute→d2h engine call (coreEngine.py:93-118).

        ``frame_hw``: one (h, w) or a LIST of them — a multi-geometry
        artifact carries one graph per source shape and dispatches at
        run time (coreEngine.py:120-157 / TRT optimization profiles)."""
        if self.engine is not None:
            raise ValueError("export_fused needs the native-graph path")
        from ..engine.artifact import build_fused_artifact_multi
        from ..utils.misc import _norm_frame_hws

        variables = self.variables

        def step_for(hw):
            step = self._build_step(hw)
            return lambda frame: step(variables, frame)

        return build_fused_artifact_multi(
            step_for,
            _norm_frame_hws(frame_hw),
            out_path,
            platforms=platforms,
            meta={
                "kind": "yolo",
                "model": self.model_type.name,
                "scale": self.spec.scale,
                "net_input_size": list(self.spec.input_size),
            },
        )

    def DetectFrame(self, srcimg: np.ndarray) -> None:
        src_shape = srcimg.shape[:2]
        if self.engine is not None:
            if getattr(self.engine, "fused", False):
                from ..engine.artifact import check_fused_frame

                frame = check_fused_frame(self.engine, srcimg)
                dets = np.asarray(self.engine.run_device(frame))
                self._object_info = self._dets_to_rectinfo(dets)
                return
            self._detect_via_engine(srcimg)
            return
        if src_shape not in self._steps:
            self._steps[src_shape] = self._build_step(src_shape)
        dets = np.asarray(
            self._steps[src_shape](self.variables, jnp.asarray(srcimg))
        )
        self._object_info = self._dets_to_rectinfo(dets)

    def _detect_via_engine(self, srcimg: np.ndarray) -> None:
        """Engine-injected path: host letterbox via the same device ops,
        engine executes the graph, decode stays on device."""
        h, w = self.spec.input_size
        geom = LetterboxGeometry(srcimg.shape[0], srcimg.shape[1], h, w)
        x = yolo_preprocess(jnp.asarray(srcimg)[None], geom)
        raw = self.engine.engine_inference(
            np.transpose(np.asarray(x), (0, 3, 1, 2))
        )[0]
        raw = jnp.asarray(raw[0] if raw.ndim == 3 else raw)
        boxes, scores, ids = decode_predictions(
            raw, self.model_type, self.spec.num_classes, self.spec.input_size
        )
        dets = select_and_nms(
            boxes, scores, ids, box_score=float(self.box_score),
            iou_threshold=float(self.box_nms_iou),
            max_det=int(getattr(self, "max_det", 100)),
        )
        dets = np.asarray(detections_to_original(dets, geom))
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
