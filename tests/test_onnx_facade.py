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
