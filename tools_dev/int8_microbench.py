"""Dev microbench: per-family trunk latency f32 / bf16 / int8(+calib).

Run on the real TPU (axon tunnel) to steer the int8 pipeline work:
    timeout 1800 python tools_dev/int8_microbench.py resnet
    timeout 1800 python tools_dev/int8_microbench.py effdet
    timeout 1800 python tools_dev/int8_microbench.py yolo
Chained iterations inside one dispatch (fori_loop) so tunnel dispatch
latency is excluded, mirroring bench.py's compute probe.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

from adas_tpu.models.layers import quantized

ITERS = 20


def chain(apply_fn, variables, x, reduce_fn=None):
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


def bench_resnet():
    from adas_tpu.models.resnet import ResNetFeatures
    from adas_tpu.tools.quantize import calibrate_act_scales, pack_int8_weights

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 320, 1600, 3)),
        jnp.float32,
    )
    rows = {}
    for mode in ("f32", "bf16", "int8", "int8_calib_packed"):
        dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
        net = ResNetFeatures(depth="18", dtype=dtype)
        v = net.init(jax.random.PRNGKey(0), x[:1])
        if mode == "int8_calib_packed":
            v = calibrate_act_scales(
                lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
                v, [x[:1]],
            )
            v = pack_int8_weights(
                lambda vv: net.apply(vv, x[:1], mutable=["wscales"]), v
            )
        v = jax.device_put(v)

        if mode.startswith("int8"):
            def apply_fn(vv, xi):
                with quantized("int8"):
                    return net.apply(vv, xi)
        else:
            def apply_fn(vv, xi):
                return net.apply(vv, xi.astype(dtype))

        rows[mode] = chain(apply_fn, v, x)
        print(f"resnet18 8x320x1600 {mode:20s} {rows[mode]:8.2f} ms")
    return rows


def bench_effdet():
    from adas_tpu.models.efficientdet import EfficientDet, EfficientDetSpec
    from adas_tpu.tools.quantize import calibrate_act_scales, pack_int8_weights

    spec = EfficientDetSpec(compound=0, num_classes=90)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 512, 512, 3)),
        jnp.float32,
    )
    for mode in ("f32", "bf16", "int8", "int8_calib_packed"):
        dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
        net = EfficientDet(spec, dtype=dtype)
        v = net.init(jax.random.PRNGKey(0), x)
        if mode == "int8_calib_packed":
            v = calibrate_act_scales(
                lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
                v, [x],
            )
            v = pack_int8_weights(
                lambda vv: net.apply(vv, x, mutable=["wscales"]), v
            )
        v = jax.device_put(v)

        if mode.startswith("int8"):
            def apply_fn(vv, xi):
                with quantized("int8"):
                    return net.apply(vv, xi)
        else:
            def apply_fn(vv, xi):
                return net.apply(vv, xi.astype(dtype))

        ms = chain(apply_fn, v, x)
        print(f"effdet-d0 1x512 {mode:20s} {ms:8.2f} ms")


def bench_yolo():
    from adas_tpu.models.yolo import YoloSpec, build_yolo
    from adas_tpu.tools.quantize import calibrate_act_scales, pack_int8_weights

    spec = YoloSpec(family="v8", scale="l", num_classes=80,
                    input_size=(640, 640))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 640, 640, 3)),
        jnp.float32,
    )
    for mode in ("bf16", "int8", "int8_calib_packed"):
        dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
        net = build_yolo(spec)
        v = net.init(jax.random.PRNGKey(0), x[:1])
        if mode == "int8_calib_packed":
            v = calibrate_act_scales(
                lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
                v, [x[:1]],
            )
            v = pack_int8_weights(
                lambda vv: net.apply(vv, x[:1], mutable=["wscales"]), v
            )
        v = jax.device_put(v)

        if mode.startswith("int8"):
            def apply_fn(vv, xi):
                with quantized("int8"):
                    return net.apply(vv, xi)
        else:
            def apply_fn(vv, xi):
                return net.apply(vv, xi.astype(dtype))

        ms = chain(apply_fn, v, x)
        print(f"yolov8l 8x640 {mode:20s} {ms:8.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "resnet"
    {"resnet": bench_resnet, "effdet": bench_effdet, "yolo": bench_yolo}[
        which
    ]()
