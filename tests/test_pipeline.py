"""L4 pipeline tests: panel widgets render, full ADASPipeline smoke runs
end-to-end on synthetic frames with random weights (fake multi-layer
integration per SURVEY.md §4)."""
import numpy as np
import pytest

from adas_tpu.utils.types import (
    CollisionType,
    CurvatureType,
    LaneModelType,
    ObjectModelType,
    OffsetType,
)

cv2 = pytest.importorskip("cv2")


def test_control_panel_widgets_render():
    from adas_tpu.pipeline.panel import ControlPanel

    panel = ControlPanel()
    frame = np.zeros((720, 1280, 3), dtype=np.uint8)
    bird = np.zeros((720, 1280, 3), dtype=np.uint8)
    panel.DisplayBirdViewPanel(frame, bird)
    for off, curve in [
        (OffsetType.UNKNOWN, CurvatureType.UNKNOWN),
        (OffsetType.RIGHT, CurvatureType.HARD_LEFT),
        (OffsetType.LEFT, CurvatureType.HARD_RIGHT),
        (OffsetType.CENTER, CurvatureType.STRAIGHT),
    ]:
        panel.DisplaySignsPanel(frame, off, curve)
    for col in CollisionType:
        panel.DisplayCollisionPanel(frame, col, 0.01, 0.002)
    assert frame.any()


def test_panel_curve_hysteresis():
    from adas_tpu.pipeline.panel import ControlPanel

    panel = ControlPanel()
    frame = np.zeros((720, 1280, 3), dtype=np.uint8)
    panel.DisplaySignsPanel(frame, OffsetType.CENTER, CurvatureType.HARD_LEFT)
    assert panel.curve_status == "Left"
    # EASY_LEFT keeps showing the left arrow (sticky)
    panel.DisplaySignsPanel(frame, OffsetType.CENTER, CurvatureType.EASY_LEFT)
    assert panel.curve_status == "Left"
    # UNKNOWN + CENTER resets
    panel.DisplaySignsPanel(frame, OffsetType.CENTER, CurvatureType.UNKNOWN)
    assert panel.curve_status is None


def test_adas_pipeline_smoke():
    from adas_tpu.pipeline import ADASPipeline

    pipe = ADASPipeline(
        frame_size=(640, 360),
        lane_config={
            "model_path": None,
            "model_type": LaneModelType.UFLDV2_TUSIMPLE,
        },
        object_config={
            "model_path": None,
            "model_type": ObjectModelType.YOLOV8,
            "scale": "n",
            "input_size": (320, 320),
            "box_score": 0.25,
        },
    )
    rng = np.random.default_rng(0)
    for _ in range(2):
        frame = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
        out = pipe.process_frame(frame)
        assert out.shape == frame.shape
        assert out.any()
    # per-stage timers populated (observability parity, demo.py:268-281)
    assert pipe.object_infer_time >= 0
    assert pipe.lane_infer_time >= 0
