"""Dev probe: capture a jax.profiler trace of the fused int8 step.

Runs the flagship compute probe (8-stream YOLOv8l + UFLDv2-CULane,
calibrated int8 — the exact graph bench.py's compute_fps measures) once
under ``jax.profiler.trace`` on the real chip, then summarizes the
xplane with xprof's hlo_stats converter: per-HLO-op self time, grouped
by category — the evidence BASELINE.md's MFU section needs.

    timeout 3600 python tools_dev/profile_trace.py [bf16|int8] [outdir]
"""
import glob
import json
import sys

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

DTYPE = sys.argv[1] if len(sys.argv) > 1 else "int8"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adas_trace"
N = 8
ITERS = 10


def build_ms():
    import cv2

    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="l",
        box_score=0.25, input_size=(640, 640), compute_dtype=DTYPE,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        dtype=jnp.bfloat16 if DTYPE == "bf16" else DTYPE,
    )
    rng = np.random.default_rng(0)
    downscale = (324, 576)
    if DTYPE == "int8":
        calib = [
            cv2.resize(
                rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8),
                (downscale[1], downscale[0]),
            )
            for _ in range(2)
        ]
        yolo.calibrate_int8(calib)
        lane.calibrate_int8(calib)
    ms = MultiStreamADAS(
        yolo, lane, N, frame_hw=(720, 1280),
        host_downscale=downscale, transport="i420",
    )
    batch = rng.integers(0, 255, (N, 720, 1280, 3), dtype=np.uint8)
    return ms, batch


def summarize(outdir: str) -> None:
    """Top HLO ops by self time from the captured xplane."""
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(
        outdir + "/plugins/profile/*/*.xplane.pb"
    )
    if not xplanes:
        print("no xplane captured under", outdir)
        return
    params = {"tqx": "out:csv;"}
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "hlo_stats", params
        )
    except Exception as e:  # tool name varies across xprof versions
        print("hlo_stats failed:", e)
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "op_profile", params
        )
    text = data.decode() if isinstance(data, bytes) else str(data)
    print(text[:8000])


def main() -> None:
    ms, batch = build_ms()
    probe = ms.make_compute_probe(ITERS)
    x = jnp.asarray(ms._host_prep(batch))
    yv, lv = ms.yolo.variables, ms.lane.variables
    float(probe(yv, lv, x))  # compile + warm
    with jax.profiler.trace(OUTDIR):
        float(probe(yv, lv, x))
    print("trace captured to", OUTDIR)
    summarize(OUTDIR)


if __name__ == "__main__":
    main()
