"""End-to-end ADAS pipeline benchmark (BASELINE.md north star).

Runs the flagship per-frame path on synthetic 720p dash-cam frames:
YOLOv8 object detection + UFLDv2-CULane lane detection, each a single
fused jitted device step (preprocess → net → decode [→ NMS]), plus the
host-side ByteTrack update when available.  Prints ONE JSON line:

    {"metric": "e2e_fps", "value": N, "unit": "frames/s", "vs_baseline": N}

vs_baseline is measured FPS / 300 (the ≥300 FPS north-star target from
BASELINE.json; the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

SCALE = os.environ.get("ADAS_BENCH_SCALE", "l")
N_FRAMES = int(os.environ.get("ADAS_BENCH_FRAMES", "100"))
BASELINE_FPS = 300.0


def main() -> None:
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
        for _ in range(8)
    ]

    yolo = YoloDetector(
        model_path=None,
        model_type=ObjectModelType.YOLOV8,
        scale=SCALE,
        box_score=0.25,
        input_size=(640, 640),
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE
    )

    try:
        from adas_tpu.tracking import BYTETracker

        tracker = BYTETracker(names=yolo.colors_dict)
    except Exception:
        tracker = None

    def one_frame(frame):
        yolo.DetectFrame(frame)
        lane.DetectFrame(frame)
        if tracker is not None:
            boxes, scores, labels = [], [], []
            for obj in yolo.object_info:
                boxes.append(obj.tolist(format_type="xyxy"))
                scores.append(obj.conf)
                labels.append(obj.label)
            tracker.update(
                np.asarray(boxes, dtype=np.float32).reshape(-1, 4),
                np.asarray(scores, dtype=np.float32),
                labels,
                frame,
            )

    # Warmup: trigger compilation of both fused steps.
    for frame in frames[:3]:
        one_frame(frame)

    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        one_frame(frames[i % len(frames)])
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    print(
        json.dumps(
            {
                "metric": "e2e_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
