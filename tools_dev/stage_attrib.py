"""Dev probe: attribute the fused 8-stream step's device time to stages.

Chained-iteration timing (one dispatch) of progressively larger slices
of the fused pipeline on the real TPU:
  i420->bgr -> yolo_pre -> yolo_net -> decode+nms -> lane_pre -> lane_net
so stage cost = difference between consecutive slices.  Steers the MFU
work: names the top non-MXU sinks without a profiler UI.

    timeout 3600 python tools_dev/stage_attrib.py [bf16|int8]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

from adas_tpu.models.layers import quantized
from adas_tpu.ops.preprocess import (
    LetterboxGeometry,
    bgr_to_i420,
    i420_to_bgr,
    ufld_v2_preprocess,
    yolo_preprocess,
)
from adas_tpu.ops.yolo_decode import (
    decode_predictions,
    detections_to_original,
    select_and_nms,
)
from adas_tpu.ops.ufld_decode import ufld_v2_decode
from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.utils.types import LaneModelType, ObjectModelType

ITERS = 20
N = 8
SRC_H, SRC_W = 360, 640


def timed(fn, x, *vars_):
    def probe(x0, *vs):
        def body(i, s):
            xi = x0 + (i % 2).astype(x0.dtype)
            out = fn(xi, *vs)
            leaves = jax.tree_util.tree_leaves(out)
            return s + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    p = jax.jit(probe)
    float(p(x, *vars_))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(p(x, *vars_))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (N, SRC_H, SRC_W, 3), dtype=np.uint8)
    i420 = jnp.asarray(np.stack([bgr_to_i420(f) for f in frames]))

    dtype = jnp.bfloat16
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="l",
        input_size=(640, 640), box_score=0.25,
        compute_dtype="bf16" if mode == "bf16" else "int8",
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        dtype=dtype if mode == "bf16" else "int8",
    )
    if mode == "int8":
        yolo.calibrate_int8([frames[0]])
        lane.calibrate_int8([frames[0]])
    geom = LetterboxGeometry(SRC_H, SRC_W, 640, 640)
    lspec = lane.spec
    in_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    quantctx = (lambda: quantized("int8")) if mode == "int8" else None

    def q(fn):
        if quantctx is None:
            return fn()
        with quantctx():
            return fn()

    def s_bgr(x):
        return jax.vmap(lambda f: i420_to_bgr(f, SRC_H, SRC_W))(x)

    def s_ypre(x):
        bgr = jax.vmap(lambda f: i420_to_bgr(f, SRC_H, SRC_W))(x)
        return jax.vmap(
            lambda f: yolo_preprocess(f[None], geom, dtype=in_dtype)[0]
        )(bgr)

    yv, lv = yolo.variables, lane.variables

    def s_ynet(x, yvars):
        xp = s_ypre(x)
        return jax.vmap(
            lambda xi: q(lambda: yolo.net.apply(yvars, xi[None]))[0]
        )(xp)

    def s_ydec(x, yvars):
        raw = s_ynet(x, yvars)

        def one(r):
            boxes, scores, ids = decode_predictions(
                r.astype(jnp.float32), yolo.model_type, 80, (640, 640)
            )
            dets = select_and_nms(
                boxes, scores, ids, box_score=0.25, iou_threshold=0.45,
                max_det=100,
            )
            return detections_to_original(dets, geom)

        return jax.vmap(one)(raw)

    def s_lpre(x):
        bgr = jax.vmap(lambda f: i420_to_bgr(f, SRC_H, SRC_W))(x)
        return jax.vmap(
            lambda f: ufld_v2_preprocess(
                f[None], lspec.input_height, lspec.input_width,
                lspec.crop_ratio,
                dtype=in_dtype if mode == "bf16" else jnp.float32,
            )[0]
        )(bgr)

    def s_lnet(x, lvars):
        xp = s_lpre(x)
        outs = jax.vmap(
            lambda xi: q(lambda: lane.net.apply(lvars, xi[None]))
        )(xp)
        return outs

    def s_ldec(x, lvars):
        outs = s_lnet(x, lvars)
        return jax.vmap(
            lambda o: ufld_v2_decode(
                {k: v.astype(jnp.float32) for k, v in o.items()}
            )
        )(outs)

    rows = [
        ("i420->bgr", lambda: timed(s_bgr, i420)),
        ("+yolo_pre", lambda: timed(s_ypre, i420)),
        ("+yolo_net", lambda: timed(s_ynet, i420, yv)),
        ("+decode_nms", lambda: timed(s_ydec, i420, yv)),
        ("lane_pre(only)", lambda: timed(s_lpre, i420)),
        ("+lane_net", lambda: timed(s_lnet, i420, lv)),
        ("+lane_dec", lambda: timed(s_ldec, i420, lv)),
    ]
    prev = 0.0
    for name, f in rows:
        ms = f()
        print(f"{name:16s} cum {ms:7.2f} ms   delta {ms - prev:7.2f}")
        if name == "+decode_nms":
            prev = 0.0
        else:
            prev = ms


if __name__ == "__main__":
    main()
