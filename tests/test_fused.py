"""Fused dual-model step tests: results match the separate per-model
paths, and submit/fetch pipelining preserves ordering."""
import numpy as np

from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.pipeline.fused import FusedADASStep
from adas_tpu.utils.types import LaneModelType, ObjectModelType


def _make_pair():
    yolo = YoloDetector(
        model_path=None,
        model_type=ObjectModelType.YOLOV8,
        scale="n",
        input_size=(320, 320),
        box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    return yolo, lane


def test_fused_matches_separate_paths():
    yolo, lane = _make_pair()
    fused = FusedADASStep(yolo, lane)
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)

    fused.run(frame)
    fused_objs = [
        (o.label, round(o.conf, 5), o.tolist()) for o in yolo.object_info
    ]
    fused_lanes = [list(map(tuple, p)) for p in lane.lane_info.lanes_points]

    yolo.DetectFrame(frame)
    lane.DetectFrame(frame)
    sep_objs = [
        (o.label, round(o.conf, 5), o.tolist()) for o in yolo.object_info
    ]
    sep_lanes = [list(map(tuple, p)) for p in lane.lane_info.lanes_points]

    assert fused_objs == sep_objs
    assert fused_lanes == sep_lanes


def test_fused_pipelined_ordering():
    yolo, lane = _make_pair()
    fused = FusedADASStep(yolo, lane)
    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 255, (360, 640, 3), dtype=np.uint8) for _ in range(3)
    ]
    # sequential reference results
    expected = []
    for f in frames:
        fused.run(f)
        expected.append(
            [(o.label, round(o.conf, 5)) for o in yolo.object_info]
        )
    # pipelined: submit i+1 before fetching i
    got = []
    pending = fused.submit(frames[0])
    for f in frames[1:]:
        nxt = fused.submit(f)
        fused.fetch(pending)
        got.append([(o.label, round(o.conf, 5)) for o in yolo.object_info])
        pending = nxt
    fused.fetch(pending)
    got.append([(o.label, round(o.conf, 5)) for o in yolo.object_info])
    assert got == expected
