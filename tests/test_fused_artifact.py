"""Fused ``.adas`` artifacts: single-round-trip serving parity.

The reference engine call is ONE h2d -> execute -> d2h round-trip
(coreEngine.py:93-118).  A bare-network artifact forces the facade into
3-4 round-trips per frame (device preprocess, fetch, engine re-upload,
device decode, fetch); a FUSED artifact (engine/artifact.py
``build_fused_artifact``) bakes preprocess+net+decode into the exported
graph so ``CompiledEngine`` serves like the native path: uint8 frame up,
compact decoded tensors down.  These tests assert the fused-artifact
facade output is identical to the native facade output.
"""
import numpy as np
import pytest

from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.utils.types import LaneModelType, ObjectModelType

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (180, 320, 3), dtype=np.uint8)


def test_yolo_fused_artifact_matches_native(tmp_path, frame):
    native = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.05,
    )
    path = str(tmp_path / "v8n_fused.adas")
    meta = native.export_fused(path, frame_hw=frame.shape[:2])
    assert meta["fused"] and meta["kind"] == "yolo"

    served = YoloDetector(
        model_path=path, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.05,
    )
    assert served.engine is not None and served.engine.fused

    native.DetectFrame(frame)
    served.DetectFrame(frame)
    a = [(o.tolist(), round(o.conf, 5), o.label) for o in native.object_info]
    b = [(o.tolist(), round(o.conf, 5), o.label) for o in served.object_info]
    assert a == b

    # shape-specialized like TRT fixed bindings: clear error on mismatch
    with pytest.raises(ValueError, match="fused engine was built"):
        served.DetectFrame(frame[:90])


def test_ufldv2_fused_artifact_matches_native(tmp_path, frame):
    native = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    path = str(tmp_path / "ufldv2_fused.adas")
    meta = native.export_fused(path, frame_hw=frame.shape[:2])
    assert meta["fused"] and "pack" in meta
    # ONE output tensor => one device->host fetch per frame
    assert len(meta["output_shapes"]) == 1

    served = UltrafastLaneDetectorV2(
        model_path=path, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    assert served.engine is not None and served.engine.fused

    native.DetectFrame(frame)
    served.DetectFrame(frame)
    na, sa = native.lane_info, served.lane_info
    assert na.lanes_status == sa.lanes_status
    for lane_a, lane_b in zip(na.lanes_points, sa.lanes_points):
        assert np.array_equal(np.asarray(lane_a), np.asarray(lane_b))


def test_multi_geometry_fused_artifact(tmp_path, frame):
    """ONE serialized engine covering two source geometries, dispatched
    at run time on the incoming frame's shape (the reference's extension
    dispatch covers any file: coreEngine.py:120-157; TRT optimization
    profiles are the hardware analogue)."""
    native = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.05,
    )
    small = frame[:90, :160].copy()
    path = str(tmp_path / "v8n_multi.adas")
    meta = native.export_fused(
        path, frame_hw=[frame.shape[:2], small.shape[:2]]
    )
    assert len(meta["geometries"]) == 2

    served = YoloDetector(
        model_path=path, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.05,
    )
    assert served.engine.fused
    assert served.engine.fused_shapes == {(180, 320, 3), (90, 160, 3)}

    for f in (frame, small):
        native.DetectFrame(f)
        served.DetectFrame(f)
        a = [
            (o.tolist(), round(o.conf, 5), o.label)
            for o in native.object_info
        ]
        b = [
            (o.tolist(), round(o.conf, 5), o.label)
            for o in served.object_info
        ]
        assert a == b, f.shape

    # an unbuilt geometry still errors loudly
    with pytest.raises(ValueError, match="fused engine was built"):
        served.DetectFrame(frame[:64])


def test_multi_geometry_lane_artifact(tmp_path, frame):
    native = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    small = frame[:90, :160].copy()
    path = str(tmp_path / "ufldv2_multi.adas")
    meta = native.export_fused(
        path, frame_hw=[frame.shape[:2], small.shape[:2]]
    )
    assert len(meta["geometries"]) == 2 and "pack" in meta

    served = UltrafastLaneDetectorV2(
        model_path=path, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    for f in (frame, small):
        native.DetectFrame(f)
        served.DetectFrame(f)
        assert native.lane_info.lanes_status == served.lane_info.lanes_status
        for la, lb in zip(
            native.lane_info.lanes_points, served.lane_info.lanes_points
        ):
            assert np.array_equal(np.asarray(la), np.asarray(lb))
