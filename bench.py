"""End-to-end ADAS pipeline benchmark (BASELINE.md north star).

Measures the flagship per-frame path on synthetic 720p dash-cam frames:
YOLOv8 + UFLDv2-CULane fused into ONE jitted device step
(adas_tpu/pipeline/fused.py), software-pipelined (frame N+1 dispatches
while frame N fetches), plus the host-side ByteTrack update per frame.
Prints ONE JSON line:

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
    from adas_tpu.engine.xla_engine import enable_persistent_cache

    enable_persistent_cache()

    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.fused import FusedADASStep
    from adas_tpu.tracking import BYTETracker
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
    fused = FusedADASStep(yolo, lane)
    tracker = BYTETracker(names=yolo.colors_dict)

    def host_side(frame):
        boxes, scores, labels = [], [], []
        for obj in yolo.object_info:
            boxes.append(obj.tolist(format_type="xyxy"))
            scores.append(obj.conf)
            labels.append(obj.label)
        tracker.update(
            np.asarray(boxes, dtype=np.float64).reshape(-1, 4),
            np.asarray(scores, dtype=np.float64),
            labels,
            frame,
        )

    # Warmup: compile the fused step.
    for f in frames[:2]:
        fused.run(f)

    # Pipelined steady state: dispatch i+1 before fetching i.
    t0 = time.perf_counter()
    pending = fused.submit(frames[0])
    for i in range(1, N_FRAMES):
        nxt = fused.submit(frames[i % len(frames)])
        fused.fetch(pending)
        host_side(frames[(i - 1) % len(frames)])
        pending = nxt
    fused.fetch(pending)
    host_side(frames[(N_FRAMES - 1) % len(frames)])
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
