"""Detector-facade dispatch on ``.onnx`` model paths.

Reference behavior: every detector accepts a ``.onnx`` path and runs it
through ``OnnxEngine`` (yoloDetector.py:74-77, efficientdetDetector.py:38).
Here `.onnx` either ingests into the native graph (mapped checkpoints) or
executes through the XLA graph interpreter — these tests cover the
fallback and the EfficientDet postprocessed-export contract.
"""
import numpy as np
import pytest

from adas_tpu.perception.efficientdet_detector import EfficientdetDetector
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.tools import onnx_writer as W
from adas_tpu.utils.types import ObjectModelType


def _planted_yolo_onnx(tmp_path, num_classes=80, n_pred=12):
    """A v5-contract graph: output (1, n_pred, 5+nc) with one planted box
    at (cx=320, cy=320, w=100, h=80), class 2, obj*cls ~ 0.89.  The
    initializer names deliberately do NOT map to the native yolo graph so
    the 'auto' mode must fall back to graph execution."""
    preds = np.zeros((1, n_pred, 5 + num_classes), np.float32)
    preds[0, 0, :4] = [320, 320, 100, 80]
    preds[0, 0, 4] = 0.99
    preds[0, 0, 5 + 2] = 0.9
    nodes = [
        W.make_node("ReduceMean", ["images"], ["m"], keepdims=0),
        W.make_node("Mul", ["m", "zero"], ["z"]),
        W.make_node("Add", ["planted", "z"], ["output"]),
    ]
    model = W.simple_model(
        nodes,
        [("images", np.float32, (1, 3, 640, 640))],
        [("output", np.float32, (1, n_pred, 5 + num_classes))],
        initializers={"planted": preds, "zero": np.float32(0.0)},
    )
    path = tmp_path / "custom_v7.onnx"
    path.write_bytes(model)
    return str(path)


class TestYoloOnnxDispatch:
    def test_auto_falls_back_to_graph_execution(self, tmp_path):
        path = _planted_yolo_onnx(tmp_path)
        det = YoloDetector(
            model_path=path, model_type=ObjectModelType.YOLOV7,
            box_score=0.4,
        )
        assert det.engine is not None
        assert det.engine.framework_type == "onnx-xla"
        # engine input size overrides the config default
        assert det.spec.input_size == (640, 640)
        frame = np.zeros((640, 640, 3), np.uint8)
        det.DetectFrame(frame)
        assert len(det.object_info) == 1
        info = det.object_info[0]
        assert info.label == det.class_names[2]
        x, y, w, h = info.tolist(format_type="xywh")
        assert (x, y, w, h) == (270, 280, 100, 80)
        assert info.conf == pytest.approx(0.99 * 0.9, abs=1e-3)

    def test_graph_mode_skips_ingest(self, tmp_path):
        path = _planted_yolo_onnx(tmp_path)
        det = YoloDetector(
            model_path=path, model_type=ObjectModelType.YOLOV5,
            onnx_mode="graph",
        )
        assert det.engine is not None
        det.DetectFrame(np.zeros((360, 640, 3), np.uint8))
        assert len(det.object_info) == 1

    def test_ingest_mode_raises_on_unmapped(self, tmp_path):
        path = _planted_yolo_onnx(tmp_path)
        with pytest.raises((KeyError, NotImplementedError)):
            YoloDetector(
                model_path=path, model_type=ObjectModelType.YOLOV5,
                onnx_mode="ingest",
            )


class TestEfficientDetOnnx:
    def test_postprocessed_export_contract(self, tmp_path):
        """Graph returns already-NMSed (boxes, ids, confs) like the
        zylo117 export the reference requires."""
        boxes = np.array(
            [[10, 20, 110, 220], [0, 0, 5, 5]], np.float32
        )
        ids = np.array([2, 0], np.int64)
        confs = np.array([0.9, 0.1], np.float32)
        nodes = [
            W.make_node("Identity", ["b0"], ["boxes"]),
            W.make_node("Identity", ["i0"], ["ids"]),
            W.make_node("Identity", ["c0"], ["confs"]),
        ]
        model = W.simple_model(
            nodes,
            [("input", np.float32, (1, 3, 512, 512))],
            [
                ("boxes", np.float32, (2, 4)),
                ("ids", np.int64, (2,)),
                ("confs", np.float32, (2,)),
            ],
            initializers={"b0": boxes, "i0": ids, "c0": confs},
        )
        path = tmp_path / "effdet_d0.onnx"
        path.write_bytes(model)

        det = EfficientdetDetector(model_path=str(path), box_score=0.6)
        assert det.engine.framework_type == "onnx-xla"
        assert tuple(det.input_shapes) == (1, 3, 512, 512)
        det.DetectFrame(np.zeros((512, 512, 3), np.uint8))
        # low-conf row filtered; survivor un-letterboxed (identity here)
        assert len(det.object_info) == 1
        info = det.object_info[0]
        assert info.label == det.class_names[2]
        assert list(info.tolist(format_type="xywh")) == [10, 20, 100, 200]


class TestV5LiteOnnxContract:
    def test_pre_grid_export_grid_decodes(self, tmp_path):
        """A v5-Lite-contract export (sigmoided PRE-grid rows, reference
        yoloDetector.py:36-50) executed via the XLA graph engine must be
        grid-decoded by the facade exactly once: a planted row at level-0
        cell (40, 40), anchor 0 maps to center (328, 328), w=10, h=13."""
        nc = 80
        n = sum(3 * (640 // s) * (640 // s) for s in (8, 16, 32))
        preds = np.full((1, n, 5 + nc), 0.001, np.float32)
        row = 0 * 80 * 80 + 40 * 80 + 40  # anchor 0, y=40, x=40 @ stride 8
        preds[0, row, 0:2] = 0.75          # xy: (0.75*2-0.5+40)*8 = 328
        preds[0, row, 2:4] = 0.5           # wh: (0.5*2)^2 * (10, 13)
        preds[0, row, 4] = 0.9
        preds[0, row, 5 + 3] = 0.9
        nodes = [
            W.make_node("ReduceMean", ["images"], ["m"], keepdims=0),
            W.make_node("Mul", ["m", "zero"], ["z"]),
            W.make_node("Add", ["planted", "z"], ["output"]),
        ]
        model = W.simple_model(
            nodes,
            [("images", np.float32, (1, 3, 640, 640))],
            [("output", np.float32, (1, n, 5 + nc))],
            initializers={"planted": preds, "zero": np.float32(0.0)},
        )
        path = tmp_path / "v5lite_s.onnx"
        path.write_bytes(model)
        det = YoloDetector(
            model_path=str(path), model_type=ObjectModelType.YOLOV5_LITE,
            box_score=0.4,
        )
        assert det.engine is not None
        det.DetectFrame(np.zeros((640, 640, 3), np.uint8))
        assert len(det.object_info) == 1
        info = det.object_info[0]
        x, y, w, h = info.tolist(format_type="xywh")
        assert (w, h) == (10, 13)
        # RectInfo coords are ints; the odd height floors the center
        assert abs(x + w / 2 - 328) <= 0.5 and abs(y + h / 2 - 328) <= 0.5
        assert info.label == det.class_names[3]


class TestLaneOnnxDispatch:
    """Lane `.onnx` model paths (the reference's ONLY lane artifact —
    ultrafastLaneDetector.py:65-68, convertPytorchToONNX.py:77-91):
    native ingest for torch-named exports, graph-executor fallback for
    everything else, decode identical to the engine-injected path."""

    def _canned_v2_onnx(self, tmp_path, native, frame):
        """An export that reproduces the native net's 4 outputs for a
        given frame (initializer names don't map -> graph fallback)."""
        import jax.numpy as jnp

        from adas_tpu.ops.preprocess import ufld_v2_preprocess

        spec = native.spec
        x = ufld_v2_preprocess(
            jnp.asarray(frame)[None], spec.input_height, spec.input_width,
            spec.crop_ratio,
        )
        outs = native.net.apply(native.variables, x)
        names = ("loc_row", "loc_col", "exist_row", "exist_col")
        nodes = [W.make_node("ReduceMean", ["input"], ["m"], keepdims=0),
                 W.make_node("Mul", ["m", "zero"], ["z"])]
        inits = {"zero": np.float32(0.0)}
        outputs = []
        for k in names:
            v = np.asarray(outs[k], np.float32)
            inits[f"c_{k}"] = v
            nodes.append(W.make_node("Add", [f"c_{k}", "z"], [k]))
            outputs.append((k, np.float32, v.shape))
        model = W.simple_model(
            nodes,
            [("input", np.float32,
              (1, 3, spec.input_height, spec.input_width))],
            outputs, initializers=inits,
        )
        path = tmp_path / "ufldv2.onnx"
        path.write_bytes(model)
        return str(path)

    def test_v2_onnx_path_matches_native(self, tmp_path):
        from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
        from adas_tpu.utils.types import LaneModelType

        native = UltrafastLaneDetectorV2(
            model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
        )
        frame = np.random.default_rng(7).integers(
            0, 255, (240, 480, 3), dtype=np.uint8
        )
        native.DetectFrame(frame)
        expected = [
            list(map(tuple, p)) for p in native.lane_info.lanes_points
        ]
        path = self._canned_v2_onnx(tmp_path, native, frame)

        det = UltrafastLaneDetectorV2(
            model_path=path, model_type=LaneModelType.UFLDV2_TUSIMPLE
        )
        assert det.engine is not None  # fell back to graph execution
        assert det.engine.framework_type == "onnx-xla"
        det.DetectFrame(frame)
        got = [list(map(tuple, p)) for p in det.lane_info.lanes_points]
        assert got == expected

    def test_v1_onnx_path_matches_native(self, tmp_path):
        import jax.numpy as jnp

        from adas_tpu.ops.preprocess import ufld_v1_preprocess
        from adas_tpu.perception.lane_detector import UltrafastLaneDetector
        from adas_tpu.utils.types import LaneModelType

        native = UltrafastLaneDetector(
            model_path=None, model_type=LaneModelType.UFLD_TUSIMPLE
        )
        frame = np.random.default_rng(9).integers(
            0, 255, (240, 480, 3), dtype=np.uint8
        )
        native.DetectFrame(frame)
        expected = [
            list(map(tuple, p)) for p in native.lane_info.lanes_points
        ]

        spec = native.spec
        x = ufld_v1_preprocess(
            jnp.asarray(frame)[None], spec.input_height, spec.input_width
        )
        logits = np.asarray(
            native.net.apply(native.variables, x), np.float32
        )
        nodes = [
            W.make_node("ReduceMean", ["input"], ["m"], keepdims=0),
            W.make_node("Mul", ["m", "zero"], ["z"]),
            W.make_node("Add", ["c0", "z"], ["output"]),
        ]
        model = W.simple_model(
            nodes,
            [("input", np.float32,
              (1, 3, spec.input_height, spec.input_width))],
            [("output", np.float32, logits.shape)],
            initializers={"c0": logits, "zero": np.float32(0.0)},
        )
        path = tmp_path / "ufldv1.onnx"
        path.write_bytes(model)

        det = UltrafastLaneDetector(
            model_path=str(path), model_type=LaneModelType.UFLD_TUSIMPLE
        )
        assert det.engine is not None
        assert det.engine.framework_type == "onnx-xla"
        det.DetectFrame(frame)
        got = [list(map(tuple, p)) for p in det.lane_info.lanes_points]
        assert got == expected

    def test_wrong_output_arity_rejected(self, tmp_path):
        """A 1-output export is not a valid UFLDv2 engine (reference
        enforces 4, ultrafastLaneDetectorV2.py:93-94)."""
        from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
        from adas_tpu.utils.types import LaneModelType

        nodes = [
            W.make_node("ReduceMean", ["input"], ["m"], keepdims=0),
            W.make_node("Mul", ["m", "zero"], ["out"]),
        ]
        model = W.simple_model(
            nodes, [("input", np.float32, (1, 3, 320, 800))],
            [("out", np.float32, ())],
            initializers={"zero": np.float32(0.0)},
        )
        path = tmp_path / "bad.onnx"
        path.write_bytes(model)
        with pytest.raises(ValueError, match="4 tensors"):
            UltrafastLaneDetectorV2(
                model_path=str(path),
                model_type=LaneModelType.UFLDV2_TUSIMPLE,
            )
