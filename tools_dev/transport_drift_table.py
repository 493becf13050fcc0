"""Measure transport-ladder decode drift per rung (BASELINE.md table).

Runs the flagship facades (YOLOv8l-640 + UFLDv2-CULane, seeded random
weights — no pretrained checkpoints exist offline, matching the
torch-oracle testing convention) over every ladder rung and prints the
parity-drift row transport_parity.measure_transport_drift defines.
CPU-safe: the measurement is backend-independent; run on TPU for speed
when the tunnel is up.

    python tools_dev/transport_drift_table.py [--scale l] [--frames 4]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

LADDER = [
    (360, 640), (324, 576), (288, 512), (252, 448), (216, 384),
    (180, 320), (144, 256),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="l")
    ap.add_argument("--family", default="YOLOV8")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--rungs", default="all")
    args = ap.parse_args()

    from adas_tpu.engine.xla_engine import enable_persistent_cache
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.transport_parity import measure_transport_drift
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    enable_persistent_cache()
    yolo = YoloDetector(
        model_path=None, model_type=getattr(ObjectModelType, args.family),
        scale=args.scale, input_size=(640, 640),
        box_score=float(os.environ.get("DRIFT_BOX_SCORE", "0.25")),
        compute_dtype="bf16",
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
    )
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
        for _ in range(args.frames)
    ]
    rungs = (
        LADDER
        if args.rungs == "all"
        else [tuple(int(v) for v in r.split("x")) for r in args.rungs.split(",")]
    )
    for rung in rungs:
        d = measure_transport_drift(yolo, lane, frames, rung)
        print(json.dumps(d), flush=True)


if __name__ == "__main__":
    main()
