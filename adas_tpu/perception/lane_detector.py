"""Lane detection facades: UFLD v1 / v2 on the fused TPU path.

Public API parity with the reference detectors
(TrafficLaneDetector/ufldDetector/*.py): ``set_defaults`` class config,
``DetectFrame``, ``DrawDetectedOnFrame``, ``DrawAreaOnFrame``,
``AutoDrawLanes`` and a ``lane_info`` attribute.  Architecture differs
deliberately (SURVEY.md §7): preprocessing, backbone, head and anchor
decode run as ONE jitted XLA graph per frame shape — the frame crosses
host->device once as uint8 and only compact coordinate tensors return.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import quantized
from ..models.ufld import (
    UFLDV1_SPECS,
    UFLDV2_SPECS,
    UFLDv1Net,
    UFLDv2Net,
)
from ..ops.packing import pack, unpack
from ..ops.preprocess import ufld_v1_preprocess, ufld_v2_preprocess
from ..ops.ufld_decode import ufld_v1_decode, ufld_v2_decode
from ..utils.types import LANE_COLORS, LaneInfo, LaneModelType, OffsetType


class LaneDetectBase:
    """Config + drawing surface shared by the lane detectors."""

    _defaults = {"model_path": None, "model_type": None}

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
        self.adjust_lanes = False
        self.lane_info = LaneInfo()

    # -- drawing (host-side visualization shell, cv2 only here) ----------
    def DrawDetectedOnFrame(
        self, image, type: OffsetType = OffsetType.UNKNOWN, alpha: float = 0.3
    ) -> None:
        import cv2

        overlay = image.copy()
        for lane_num, lane_points in enumerate(self.lane_info.lanes_points):
            if lane_num == 1 and type == OffsetType.RIGHT:
                color = (0, 0, 255)
            elif lane_num == 2 and type == OffsetType.LEFT:
                color = (0, 0, 255)
            else:
                color = LANE_COLORS[lane_num]
            for x, y in lane_points:
                cv2.circle(overlay, (int(x), int(y)), 3, color, thickness=-1)
        image[:] = cv2.addWeighted(overlay, alpha, image, 1 - alpha, 0)

    def DrawAreaOnFrame(
        self, image, color: tuple = (255, 191, 0), alpha: float = 0.85
    ) -> None:
        import cv2

        if self.lane_info.area_status and len(self.lane_info.area_points):
            overlay = image.copy()
            pts = np.asarray(self.lane_info.area_points, np.int32)
            cv2.fillPoly(overlay, pts=[pts], color=color)
            image[:] = cv2.addWeighted(image, alpha, overlay, 1 - alpha, 0)

    def AutoDrawLanes(self, image, draw_points: bool = True, draw_area: bool = True):
        self.DetectFrame(image, adjust_lanes=True)
        if draw_points:
            self.DrawDetectedOnFrame(image)
        if draw_area:
            self.DrawAreaOnFrame(image)
        return image

    def _finalize(self, img_height: int) -> None:
        self.lane_info.update_status()
        self.lane_info.update_area(img_height, adjust_lanes=self.adjust_lanes)


class UltrafastLaneDetectorV2(LaneDetectBase):
    """UFLDv2 detector: fused preprocess+forward+decode on device.

    ``weights``: flax variables dict, path to ``.npz`` (params_io), or path
    to a torch ``.pth`` checkpoint; None -> random init (shape-correct,
    useful for benchmarks/smoke tests).
    """

    _defaults = {
        "model_path": None,
        "model_type": LaneModelType.UFLDV2_CULANE,
    }

    def __init__(
        self,
        model_path: Optional[str] = None,
        model_type: Optional[LaneModelType] = None,
        logger=None,
        dtype=jnp.float32,
        engine=None,
    ):
        super().__init__(logger)
        if model_path is not None or model_type is not None:
            self.model_path, self.model_type = model_path, model_type

        if self.model_type not in (
            LaneModelType.UFLDV2_TUSIMPLE,
            LaneModelType.UFLDV2_CULANE,
        ):
            msg = f"UltrafastLaneDetectorV2 can't use {self.model_type} type."
            if self.logger:
                self.logger.error(msg)
            raise ValueError(msg)

        # extension/injection dispatch (reference swaps TRT/ONNX engines,
        # ultrafastLaneDetectorV2.py:78-94): .adas = serialized artifact;
        # .onnx = native ingest with graph-executor fallback (the
        # reference's lane detectors consume .onnx/.trt EXCLUSIVELY,
        # ultrafastLaneDetector.py:65-68 — same auto dispatch as
        # YoloDetector onnx_mode="auto")
        if engine is None and str(self.model_path).endswith(".adas"):
            from ..engine.artifact import CompiledEngine

            engine = CompiledEngine(self.model_path)

        self.spec = UFLDV2_SPECS[self.model_type]
        # dtype="int8" runs the ResNet trunk convs as W8A8 int8 MXU convs
        # (models/resnet._conv_bn); the FC head stays f32 to protect the
        # row/col-anchor logits (same policy as ConvBN's final predictors)
        self._quant = "int8" if dtype == "int8" else None
        if self._quant:
            dtype = jnp.float32
        if engine is None:
            self.net = UFLDv2Net(self.spec, dtype=dtype)
            try:
                self.variables = _load_weights(
                    self.model_path, self.net,
                    (1, self.spec.input_height, self.spec.input_width, 3),
                    version=2, fc_norm=self.spec.fc_norm, quant=self._quant,
                )
            except (KeyError, NotImplementedError) as err:
                if not str(self.model_path).endswith(".onnx"):
                    raise
                if self.logger:
                    self.logger.war(
                        f"native lane ingest failed ({err}); executing "
                        "the ONNX graph via XLA instead"
                    )
                from ..engine.onnx_engine import OnnxGraphEngine

                engine = OnnxGraphEngine(self.model_path)
                del self.net
            else:
                self._step = self._build_step()
        self.engine = engine
        if engine is not None and not getattr(engine, "fused", False):
            outs, _ = engine.get_engine_output_shape()
            if len(outs) != 4:
                raise ValueError(
                    "UFLDv2 engine must emit 4 tensors "
                    "(loc_row/loc_col/exist_row/exist_col), got "
                    f"{len(outs)}"
                )
        if self.logger:
            self.logger.info(
                f"UfldDetectorV2 [{self.model_type.name}] input "
                f"{self.spec.input_height}x{self.spec.input_width} xla"
            )

    def calibrate_int8(self, frames) -> None:
        """Static activation-scale calibration (see
        YoloDetector.calibrate_int8); requires ``dtype="int8"``."""
        if getattr(self, "_quant", None) != "int8":
            raise ValueError("calibrate_int8 requires dtype='int8'")
        if self.engine is not None:
            raise ValueError("calibration needs the native-graph path")
        from ..tools.quantize import calibrate_act_scales

        spec, net = self.spec, self.net

        def apply_fn(variables, frame):
            x = ufld_v2_preprocess(
                jnp.asarray(frame)[None], spec.input_height,
                spec.input_width, spec.crop_ratio, dtype=net.dtype,
            )
            return net.apply(variables, x, mutable=["act_scales"])

        self.variables = jax.device_put(
            calibrate_act_scales(apply_fn, self.variables, frames)
        )

    def _build_step(self):
        """uint8 BGR (H, W, 3) -> decoded lane tensors, one jitted graph.
        Jit cache keyed on the source frame shape."""
        spec, net = self.spec, self.net
        spec_holder = {}
        quant_mode = getattr(self, "_quant", None)

        @jax.jit
        def step(variables, frame_bgr):
            x = ufld_v2_preprocess(
                frame_bgr[None], spec.input_height, spec.input_width,
                spec.crop_ratio, dtype=net.dtype,
            )
            # fresh context per trace: jit re-traces per frame shape and
            # quantized() is a single-use contextmanager
            with quantized(quant_mode) if quant_mode else contextlib.nullcontext():
                outputs = net.apply(variables, x)
            outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
            decoded = ufld_v2_decode(outputs)
            # pack the 4 decode tensors: ONE device->host transfer per frame
            flat, pack_spec = pack(decoded)
            spec_holder["spec"] = pack_spec
            return flat

        return step, spec_holder

    def export_fused(
        self, out_path: str, frame_hw, platforms=None
    ) -> dict:
        """Serialize the fused step (uint8 frame -> ONE packed decode
        vector) as a single-round-trip ``.adas`` artifact; the pack
        layout goes into the metadata so the host can unpack the one
        fetched buffer."""
        if self.engine is not None:
            raise ValueError("export_fused needs the native-graph path")
        from ..engine.artifact import (
            build_fused_artifact_multi,
            pack_spec_meta,
        )
        from ..utils.misc import _norm_frame_hws

        hws = _norm_frame_hws(frame_hw)
        step, spec_holder = self._step
        variables = self.variables
        fn = lambda frame: step(variables, frame)  # noqa: E731
        # trace once so the step records its pack spec (identical for
        # every geometry: the decode tensors are model-sized)
        h0, w0 = hws[0]
        jax.eval_shape(fn, jax.ShapeDtypeStruct((h0, w0, 3), jnp.uint8))
        return build_fused_artifact_multi(
            lambda hw: fn, hws, out_path, platforms=platforms,
            meta={
                "kind": "ufldv2",
                "model": self.model_type.name,
                **pack_spec_meta(spec_holder["spec"]),
            },
        )

    def DetectFrame(self, image: np.ndarray, adjust_lanes: bool = False) -> None:
        h, w = image.shape[:2]
        if self.engine is not None and getattr(self.engine, "fused", False):
            from ..engine.artifact import check_fused_frame, unpack_from_meta

            frame = check_fused_frame(self.engine, image)
            flat = np.asarray(self.engine.run_device(frame))
            decoded = unpack_from_meta(flat, self.engine.meta["pack"])
        elif self.engine is not None:
            decoded = self._detect_via_engine(image)
        else:
            step, spec_holder = self._step
            flat = np.asarray(step(self.variables, jnp.asarray(image)))
            decoded = unpack(flat, spec_holder["spec"])
        self.adjust_lanes = adjust_lanes
        self._assemble(decoded, w, h)
        self._finalize(h)

    def _detect_via_engine(self, image: np.ndarray) -> dict:
        """Engine-injected path: same device preprocess, engine forward
        (NCHW boundary), decode on device."""
        spec = self.spec
        x = ufld_v2_preprocess(
            jnp.asarray(image)[None], spec.input_height, spec.input_width,
            spec.crop_ratio,
        )
        outs = self.engine.engine_inference(
            np.transpose(np.asarray(x), (0, 3, 1, 2))
        )
        names = ("loc_row", "loc_col", "exist_row", "exist_col")
        outputs = {
            k: jnp.asarray(v, jnp.float32) for k, v in zip(names, outs)
        }
        return jax.device_get(ufld_v2_decode(outputs))

    def _assemble(self, decoded: dict, img_w: int, img_h: int) -> None:
        """Host-side point-list assembly (reference
        ultrafastLaneDetectorV2.py:139-181 semantics)."""
        s = self.spec
        row_x = decoded["row_x"][0] * img_w  # (R, L)
        row_valid = decoded["row_valid"][0]
        col_y = decoded["col_y"][0] * img_h  # (C, L)
        col_valid = decoded["col_valid"][0]
        row_anchor, col_anchor = s.row_anchor, s.col_anchor

        points = {k: [] for k in ("left-side", "left-ego", "right-ego", "right-side")}
        detected = {k: False for k in points}
        for i, key in ((1, "left-ego"), (2, "right-ego")):
            if row_valid[:, i].sum() > s.num_row / 2:
                pts = [
                    (int(row_x[k, i]), int(row_anchor[k] * img_h))
                    for k in range(s.num_row)
                    if row_valid[k, i]
                ]
                points[key].extend(pts)
                if len(pts) > 2:
                    detected[key] = True
        for i, key in ((0, "left-side"), (3, "right-side")):
            if col_valid[:, i].sum() > s.num_col / 4:
                pts = [
                    (int(col_anchor[k] * img_w), int(col_y[k, i]))
                    for k in range(s.num_col)
                    if col_valid[k, i]
                ]
                points[key].extend(pts)
                if len(pts) > 2:
                    detected[key] = True

        self.lane_info.lanes_points = np.array(
            list(points.values()), dtype=object
        )
        self.lane_info.lanes_status = list(detected.values())


class UltrafastLaneDetector(LaneDetectBase):
    """UFLD v1 detector on the fused device path."""

    _defaults = {
        "model_path": None,
        "model_type": LaneModelType.UFLD_TUSIMPLE,
    }

    def __init__(
        self,
        model_path: Optional[str] = None,
        model_type: Optional[LaneModelType] = None,
        logger=None,
        dtype=jnp.float32,
        engine=None,
    ):
        super().__init__(logger)
        if model_path is not None or model_type is not None:
            self.model_path, self.model_type = model_path, model_type
        if self.model_type not in (
            LaneModelType.UFLD_TUSIMPLE,
            LaneModelType.UFLD_CULANE,
        ):
            msg = f"UltrafastLaneDetector can't use {self.model_type} type."
            if self.logger:
                self.logger.error(msg)
            raise ValueError(msg)

        # .adas artifact / .onnx auto dispatch — reference lane detectors
        # consume .onnx/.trt exclusively (ultrafastLaneDetector.py:65-68)
        if engine is None and str(self.model_path).endswith(".adas"):
            from ..engine.artifact import CompiledEngine

            engine = CompiledEngine(self.model_path)

        self.spec = UFLDV1_SPECS[self.model_type]
        self._quant = "int8" if dtype == "int8" else None
        if self._quant:
            dtype = jnp.float32
        if engine is None:
            self.net = UFLDv1Net(self.spec, dtype=dtype)
            try:
                self.variables = _load_weights(
                    self.model_path, self.net,
                    (1, self.spec.input_height, self.spec.input_width, 3),
                    version=1, quant=self._quant,
                )
            except (KeyError, NotImplementedError) as err:
                if not str(self.model_path).endswith(".onnx"):
                    raise
                if self.logger:
                    self.logger.war(
                        f"native lane ingest failed ({err}); executing "
                        "the ONNX graph via XLA instead"
                    )
                from ..engine.onnx_engine import OnnxGraphEngine

                engine = OnnxGraphEngine(self.model_path)
                del self.net
            else:
                self._step = self._build_step()
        self.engine = engine
        if engine is not None and not getattr(engine, "fused", False):
            outs, _ = engine.get_engine_output_shape()
            if len(outs) != 1:
                raise ValueError(
                    f"UFLD v1 engine must emit 1 tensor, got {len(outs)}"
                )

    def _build_step(self):
        spec, net = self.spec, self.net
        quant_mode = getattr(self, "_quant", None)

        @jax.jit
        def step(variables, frame_bgr):
            x = ufld_v1_preprocess(
                frame_bgr[None], spec.input_height, spec.input_width,
                dtype=net.dtype,
            )
            with quantized(quant_mode) if quant_mode else contextlib.nullcontext():
                logits = net.apply(variables, x).astype(jnp.float32)
            return ufld_v1_decode(logits)

        return step

    def export_fused(
        self, out_path: str, frame_hw, platforms=None
    ) -> dict:
        """Serialize the fused v1 step (uint8 frame -> decoded loc grid)
        as a single-round-trip ``.adas`` artifact."""
        if self.engine is not None:
            raise ValueError("export_fused needs the native-graph path")
        from ..engine.artifact import build_fused_artifact_multi
        from ..utils.misc import _norm_frame_hws

        step, variables = self._step, self.variables
        return build_fused_artifact_multi(
            lambda hw: (lambda frame: step(variables, frame)),
            _norm_frame_hws(frame_hw), out_path, platforms=platforms,
            meta={"kind": "ufldv1", "model": self.model_type.name},
        )

    def DetectFrame(self, image: np.ndarray, adjust_lanes: bool = False) -> None:
        h, w = image.shape[:2]
        if self.engine is not None and getattr(self.engine, "fused", False):
            from ..engine.artifact import check_fused_frame

            frame = check_fused_frame(self.engine, image)
            loc = np.asarray(self.engine.run_device(frame))[0]
        elif self.engine is not None:
            spec = self.spec
            x = ufld_v1_preprocess(
                jnp.asarray(image)[None], spec.input_height, spec.input_width
            )
            logits = self.engine.engine_inference(
                np.transpose(np.asarray(x), (0, 3, 1, 2))
            )[0]
            loc = np.asarray(
                ufld_v1_decode(jnp.asarray(logits, jnp.float32))[0]
            )
        else:
            loc = np.asarray(self._step(self.variables, jnp.asarray(image))[0])
        self.adjust_lanes = adjust_lanes
        self._assemble(loc, w, h)
        self._finalize(h)

    def _assemble(self, loc: np.ndarray, img_w: int, img_h: int) -> None:
        """Reference ultrafastLaneDetector.py:113-136 point math."""
        s = self.spec
        h_ratio, w_ratio = img_h / s.img_h, img_w / s.img_w
        col_sample_w = (s.input_width - 1) / (s.griding_num - 1)
        lanes_points, lanes_detected = [], []
        for lane in range(loc.shape[1]):
            pts = []
            if np.sum(loc[:, lane] != 0) > 2:
                lanes_detected.append(True)
                for k in range(loc.shape[0]):
                    if loc[k, lane] > 0:
                        x = (
                            loc[k, lane] * col_sample_w * s.img_w / s.input_width
                            - 1
                        )
                        y = (
                            s.img_h
                            * (
                                s.row_anchor[s.cls_num_per_lane - 1 - k]
                                / s.input_height
                            )
                            - 1
                        )
                        pts.append([int(x * w_ratio), int(y * h_ratio)])
            else:
                lanes_detected.append(False)
            lanes_points.append(pts)
        self.lane_info.lanes_points = np.array(lanes_points, dtype=object)
        self.lane_info.lanes_status = lanes_detected


def _load_weights(
    model_path, net, input_shape, version=2, fc_norm=True, quant=None
):
    """Resolve weights from .npz / .pth / None(random); always returns
    device-resident arrays (host leaves would re-upload per call).
    ``quant="int8"`` pre-quantizes the trunk's Int8Conv kernels at load
    (tools.quantize.pack_int8_weights — TRT's offline engine build)."""
    if model_path is None:
        rng = jax.random.PRNGKey(0)
        variables = net.init(rng, jnp.zeros(input_shape, jnp.float32))
    elif str(model_path).endswith(".npz"):
        from ..tools.params_io import load_params

        variables = load_params(model_path)
    elif str(model_path).endswith((".pth", ".pt")):
        from ..tools.torch_import import load_state_dict, ufld_variables

        variables = ufld_variables(
            load_state_dict(model_path), version=version, fc_norm=fc_norm
        )
    elif str(model_path).endswith(".onnx"):
        # the reference's canonical lane artifact
        # (convertPytorchToONNX.py:77-91) carries torch-named
        # initializers; ingest them into the native graph.  Exports
        # whose names don't map raise KeyError and the facade falls
        # back to executing the graph via the ONNX->XLA engine.
        from ..tools.onnx_import import read_onnx_initializers
        from ..tools.torch_import import ufld_variables

        variables = ufld_variables(
            read_onnx_initializers(model_path),
            version=version, fc_norm=fc_norm,
        )
    else:
        raise ValueError(
            f"Unsupported weight format: {model_path} "
            "(expect .npz/.pth/.onnx or None)"
        )
    if quant == "int8":
        from ..tools.quantize import pack_int8_weights

        x0 = jnp.zeros(input_shape, jnp.float32)
        variables = pack_int8_weights(
            lambda v: net.apply(v, x0, mutable=["wscales"]), variables
        )
    return jax.device_put(variables)
