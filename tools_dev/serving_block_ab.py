"""A/B the fused block kernel on the REAL serving path (TPU).

The microbench (pallas_block_bench.py) runs the XLA stem; serving runs
the Pallas fused stem whose custom call pins layouts — the planar
boundary's collateral damage (upstream relayouts, unfused maxpool) may
not exist there.  This measures bench.py's own compute probe (the
headline compute_fps graph: 8-stream fused YOLOv8l-640 + UFLDv2-CULane
int8, planes stem) with the block kernel off/on.

    timeout 3600 python tools_dev/serving_block_ab.py [l|s]
"""
import os
import sys
import time

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

SCALE = sys.argv[1] if len(sys.argv) > 1 else "l"
N = 8
ITERS = 20


def build(rng):
    import cv2

    from adas_tpu.models import layers as L
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale=SCALE,
        box_score=0.25, input_size=(640, 640), compute_dtype="int8",
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        dtype="int8",
    )
    downscale = (360, 640)
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


MODES = {
    # mode -> (ADAS_PALLAS_BLOCK, layout, maxc)
    "off": ("0", "planar", "64"),
    "nhwc64": (None, "nhwc", "64"),       # the shipping default
    "planar64": (None, "planar", "64"),
    "planar128": (None, "planar", "128"),
}


def main():
    rng = np.random.default_rng(0)
    names = sys.argv[2:] or list(MODES)
    for mode in names:
        env, layout, maxc = MODES[mode]
        if env is None:
            os.environ.pop("ADAS_PALLAS_BLOCK", None)
        else:
            os.environ["ADAS_PALLAS_BLOCK"] = env
        os.environ["ADAS_PALLAS_BLOCK_LAYOUT"] = layout
        os.environ["ADAS_PALLAS_BLOCK_MAXC"] = maxc
        jax.clear_caches()
        ms, batch = build(rng)
        fps, stats = compute_fps(ms, batch)
        print(
            f"serving compute_fps [{mode:9s}] {fps:8.2f}  "
            f"pallas_blocks={stats['pallas_blocks']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
