"""Dev microbench: fused two-conv Pallas block vs XLA, in situ.

Measures the calibrated+packed int8 trunks with the block kernel off /
on (default channel gate) / widened (MAXC=128) — the round-5 VERDICT #1
acceptance numbers.  Run on the real TPU (axon tunnel):

    timeout 2400 python tools_dev/pallas_block_bench.py lane
    timeout 2400 python tools_dev/pallas_block_bench.py yolo

Chained iterations inside one dispatch (fori_loop), mirroring
tools_dev/int8_microbench.py, so tunnel dispatch latency is excluded.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

from adas_tpu.models import layers as L  # noqa: E402
from adas_tpu.models.layers import quantized  # noqa: E402

ITERS = int(os.environ.get("ITERS", "20"))


def chain(apply_fn, variables, x):
    def probe(v, x0):
        def body(i, s):
            xi = x0 + i.astype(x0.dtype)
            out = apply_fn(v, xi)
            leaves = jax.tree_util.tree_leaves(out)
            return s + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    p = jax.jit(probe)
    float(p(variables, x))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(p(variables, x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000  # ms per iter


def _modes():
    # planar layout: the NHWC variant's in-kernel transposes measured
    # slower than XLA's (block_kernel_probe 2026-08-19)
    return [
        ("xla", {"ADAS_PALLAS_BLOCK": "0"}),
        ("blocks_c64", {
            "ADAS_PALLAS_BLOCK": "", "ADAS_PALLAS_BLOCK_MAXC": "64",
            "ADAS_PALLAS_BLOCK_LAYOUT": "planar",
        }),
        ("blocks_c128", {
            "ADAS_PALLAS_BLOCK": "", "ADAS_PALLAS_BLOCK_MAXC": "128",
            "ADAS_PALLAS_BLOCK_LAYOUT": "planar",
        }),
    ]


def _run_modes(apply_fn, v, x, label):
    for name, env in _modes():
        for k, val in env.items():
            if val == "":
                os.environ.pop(k, None)
            else:
                os.environ[k] = val
        jax.clear_caches()
        L.reset_trace_stats()
        ms = chain(apply_fn, v, x)
        stats = L.trace_stats()
        print(
            f"{label} {name:12s} {ms:8.2f} ms  "
            f"pallas_blocks={stats['pallas_blocks']}",
            flush=True,
        )


def bench_lane():
    from adas_tpu.models.resnet import ResNetFeatures
    from adas_tpu.tools.quantize import (
        calibrate_act_scales,
        pack_int8_weights,
    )

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 320, 1600, 3)),
        jnp.float32,
    )
    net = ResNetFeatures(depth="18")
    v = net.init(jax.random.PRNGKey(0), x[:1])
    v = calibrate_act_scales(
        lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]), v, [x[:1]]
    )
    v = pack_int8_weights(
        lambda vv: net.apply(vv, x[:1], mutable=["wscales"]), v
    )
    v = jax.device_put(v)

    def apply_fn(vv, xi):
        with quantized("int8"):
            return net.apply(vv, xi)

    _run_modes(apply_fn, v, x, "resnet18 8x320x1600 int8")


def bench_yolo():
    from adas_tpu.models.yolo import YoloSpec, build_yolo
    from adas_tpu.tools.quantize import (
        calibrate_act_scales,
        pack_int8_weights,
    )

    scale = os.environ.get("SCALE", "l")
    spec = YoloSpec(
        family="v8", scale=scale, num_classes=80, input_size=(640, 640)
    )
    net = build_yolo(spec)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 640, 640, 3)),
        jnp.float32,
    )
    v = net.init(jax.random.PRNGKey(0), x[:1])
    v = calibrate_act_scales(
        lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]), v, [x[:1]]
    )
    v = pack_int8_weights(
        lambda vv: net.apply(vv, x[:1], mutable=["wscales"]), v
    )
    v = jax.device_put(v)

    def apply_fn(vv, xi):
        with quantized("int8"):
            return net.apply(vv, xi)

    _run_modes(apply_fn, v, x, f"yolov8{scale} 8x640x640 int8")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "lane"
    if which == "lane":
        bench_lane()
    elif which == "yolo":
        bench_yolo()
    else:
        raise SystemExit(f"unknown target {which}")
