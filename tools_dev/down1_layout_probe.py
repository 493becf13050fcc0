"""Dev probe: print the optimized-HLO fusion serving v8l's ``down1``.

The round-5 attribution traces show down1 (s8 3x3 stride-2 64->128 at
320x320) at 39.7 TF/s in situ — with Pallas blocks ON and OFF alike —
while the identical conv isolated runs at 126.7 TF/s and its sibling
down2 (same epilogue, half the output elements) at 219 TF/s in situ.
Neither the block boundary nor the epilogue explains it; this dumps the
compiled fusion + its operand/result layouts to see what XLA actually
built around it.

    timeout 3600 python tools_dev/down1_layout_probe.py [l|s]
"""
import re
import sys

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

SCALE = sys.argv[1] if len(sys.argv) > 1 else "l"
N = 8


def build_ms():
    import cv2

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
    rng = np.random.default_rng(0)
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
    ms = MultiStreamADAS(
        yolo, lane, N, frame_hw=(720, 1280),
        host_downscale=downscale, transport="i420",
    )
    batch = rng.integers(0, 255, (N, 720, 1280, 3), dtype=np.uint8)
    return ms, batch


def main() -> None:
    ms, batch = build_ms()
    probe = ms.make_compute_probe(10)
    x = jnp.asarray(ms._host_prep(batch))
    yv, lv = ms.yolo.variables, ms.lane.variables
    txt = jax.jit(probe.fn if hasattr(probe, "fn") else probe).lower(
        yv, lv, x
    ).compile().as_text()
    print(f"optimized HLO: {len(txt.splitlines())} lines")
    # find the entry-computation fusion instruction whose metadata names
    # down1, print it plus the fusion computation body it calls
    want = [
        ln
        for ln in txt.splitlines()
        if "down1" in ln and ("fusion" in ln or "convolution" in ln)
    ]
    print(f"--- instructions mentioning down1: {len(want)}")
    for ln in want[:40]:
        print(ln.strip()[:400])
    # pull the fusion computation(s) named in those lines and dump them
    calls = set()
    for ln in want:
        m = re.search(r"calls=(%?[\w.\-]+)", ln)
        if m:
            calls.add(m.group(1).lstrip("%"))
    for cname in sorted(calls):
        m = re.search(
            rf"^%?{re.escape(cname)} \([^)]*\) -> .*?^}}",
            txt,
            re.MULTILINE | re.DOTALL,
        )
        if m:
            body = m.group(0)
            print(f"=== fusion computation {cname}: "
                  f"{len(body.splitlines())} lines")
            print(body[:6000])


if __name__ == "__main__":
    main()
