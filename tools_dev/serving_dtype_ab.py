"""A/B the serving compute probe at bf16 vs int8 (blocks at default).

VERDICT r4 item 1 set an int8/bf16 >= 1.4x yardstick; rounds 3-4
measured 1.17-1.24x on the XLA-stem TRUNK microbench, but the decisive
context is bench.py's own compute probe (8-stream fused YOLOv8l-640 +
UFLDv2-CULane, Pallas fused stem, (360, 640) I420 transport) — the
same graph the serving block-kernel A/B used.  This measures that
ratio directly:

    timeout 3600 python tools_dev/serving_dtype_ab.py [l|s] [bf16 int8]

Run one mode per invocation for subprocess isolation in a single
tunnel window if the in-process pair interferes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

SCALE = sys.argv[1] if len(sys.argv) > 1 else "l"
N = 8
ITERS = 20


def build(rng, dtype):
    import cv2

    from adas_tpu.models import layers as L
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale=SCALE,
        box_score=0.25, input_size=(640, 640), compute_dtype=dtype,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        dtype=jnp.bfloat16 if dtype == "bf16" else dtype,
    )
    downscale = (360, 640)
    if dtype == "int8":
        calib = [
            cv2.resize(
                rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8),
                (downscale[1], downscale[0]),
            )
            for _ in range(2)
        ]
        yolo.calibrate_int8(calib)
        lane.calibrate_int8(calib)
    L.reset_trace_stats()
    ms = MultiStreamADAS(
        yolo, lane, N, frame_hw=(720, 1280),
        host_downscale=downscale, transport="i420",
    )
    batch = rng.integers(0, 255, (N, 720, 1280, 3), dtype=np.uint8)
    return ms, batch


def compute_fps(ms, batch):
    from adas_tpu.models import layers as L

    p1 = ms.make_compute_probe(ITERS)
    p2 = ms.make_compute_probe(2 * ITERS)
    x = jnp.asarray(ms._host_prep(batch))
    yv, lv = ms.yolo.variables, ms.lane.variables
    L.reset_trace_stats()

    def best(p):
        float(p(yv, lv, x))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(p(yv, lv, x))
            b = min(b, time.perf_counter() - t0)
        return b

    t1 = best(p1)
    stats = dict(L.trace_stats())
    t2 = best(p2)
    return ITERS * N / max(t2 - t1, 1e-6), stats


def main():
    rng = np.random.default_rng(0)
    modes = sys.argv[2:] or ["bf16", "int8"]
    for dtype in modes:
        jax.clear_caches()
        ms, batch = build(rng, dtype)
        fps, stats = compute_fps(ms, batch)
        print(
            f"serving compute_fps [{dtype:5s}] {fps:8.2f}  "
            f"pallas_blocks={stats.get('pallas_blocks', 0)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
