"""Dev probe: attribute the int8 fused step's device time (VERDICT r4 #8).

Captures a jax.profiler trace of the flagship compute probe (8-stream
YOLOv8l-640 + UFLDv2-CULane, calibrated+packed int8 — the graph behind
bench.py's compute_fps) and buckets per-HLO self time from xprof's
hlo_stats into the categories the 1.24x-int8-over-bf16 question needs:

- convolution fusions (the MXU work), with their model FLOP rates so
  per-op MXU occupancy is visible, split yolo vs lane by op path;
- QUANTIZE elementwise passes (non-conv fusions whose HLO expression
  round-nearest-evens / clamps into s8) — the cost that does not shrink
  with the MXU speedup;
- layout work (transpose/copy/bitcast fusions);
- everything else.

Prints the table BASELINE.md's round-5 attribution section records.

    timeout 3600 python tools_dev/quant_attrib.py [int8|bf16] [outdir]
"""
import glob
import json
import re
import sys

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

DTYPE = sys.argv[1] if len(sys.argv) > 1 else "int8"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adas_qattrib_" + DTYPE
N = 8
ITERS = 10

_QUANT_RE = re.compile(
    r"round-nearest-even|round_nearest_even", re.IGNORECASE
)
_S8_RE = re.compile(r"s8\[|convert.*s8", re.IGNORECASE)


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
    downscale = (360, 640)
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


def rows_from_trace(outdir):
    from xprof.convert import raw_to_tool_data

    # newest capture dir only: mixing xplanes from different profiler
    # sessions makes the converter return the string "None"
    xplanes = sorted(glob.glob(outdir + "/plugins/profile/*/*.xplane.pb"))
    if not xplanes:
        raise SystemExit("no xplane captured under " + outdir)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {"tqx": "out:csv;"}
    )
    text = data.decode() if isinstance(data, bytes) else str(data)
    d = json.loads(text)
    cols = [c["id"] for c in d["cols"]]
    out = []
    for r in d["rows"]:
        out.append(dict(zip(cols, [c.get("v") for c in r["c"]])))
    return out


def bucket(row):
    cat = (row.get("category") or "").lower()
    expr = row.get("hlo_op_expression") or ""
    name = (row.get("tf_op_name") or "") + " " + (
        row.get("hlo_op_name") or ""
    )
    if "convolution" in cat:
        return "conv"
    if "transpose" in cat or "copy" in cat or "bitcast" in cat:
        return "layout"
    if _QUANT_RE.search(expr) or _QUANT_RE.search(name):
        # elementwise rounding into the s8 domain = quantize pass
        return "quantize"
    if "fusion" in cat or "elementwise" in cat or cat in (
        "add", "multiply", "convert", "reduce", "select",
    ):
        return "elementwise"
    return "other"


def net_of(row):
    name = (row.get("tf_op_name") or "").lower()
    if "lane" in name or "ufld" in name or "resnet" in name:
        return "lane"
    if "yolo" in name or "c2f" in name or "sppf" in name:
        return "yolo"
    return "?"


def main() -> None:
    ms, batch = build_ms()
    probe = ms.make_compute_probe(ITERS)
    x = jnp.asarray(ms._host_prep(batch))
    yv, lv = ms.yolo.variables, ms.lane.variables
    float(probe(yv, lv, x))  # compile + warm
    with jax.profiler.trace(OUTDIR):
        float(probe(yv, lv, x))
    rows = rows_from_trace(OUTDIR)
    total = sum(r.get("total_self_time") or 0.0 for r in rows)
    per = {}
    conv_flops = []
    for r in rows:
        b = bucket(r)
        t = r.get("total_self_time") or 0.0
        per[b] = per.get(b, 0.0) + t
        if b == "conv" and t > 0:
            conv_flops.append(
                (t, r.get("model_flop_rate") or 0.0, net_of(r),
                 r.get("hlo_op_name"), r.get("bound_by"))
            )
    print(f"[{DTYPE}] total device self-time: {total:.1f} us "
          f"({ITERS} chained ticks x {N} frames)")
    for k in sorted(per, key=per.get, reverse=True):
        print(f"  {k:12s} {per[k]:10.1f} us  {100*per[k]/total:5.1f}%")
    # weighted conv MXU rate (model_flop_rate is GFLOP/s in hlo_stats)
    conv_t = sum(t for t, *_ in conv_flops)
    if conv_t:
        wrate = sum(t * fr for t, fr, *_ in conv_flops) / conv_t
        print(f"  conv time-weighted model flop rate: {wrate:.1f}")
    conv_flops.sort(reverse=True)
    print("  top conv fusions (self us, flop rate, net, bound_by):")
    for t, fr, net, nm, bb in conv_flops[:12]:
        print(f"    {t:9.1f}  {fr:10.1f}  {net:4s}  {nm}  {bb}")
    byb = {}
    for r in rows:
        bb = r.get("bound_by") or "?"
        byb[bb] = byb.get(bb, 0.0) + (r.get("total_self_time") or 0.0)
    print("  bound_by split:", {k: round(v, 1) for k, v in byb.items()})


if __name__ == "__main__":
    main()
