"""Dev A/B bench: s8-chain OFF vs ON per family trunk, int8 calib+packed.

Isolates what the whole-graph s8 chains (emit/consume + concat groups)
buy on the real TPU: same calibrated variables, same packed weights,
only layers._S8_CHAIN flipped between traces.

    timeout 1800 python tools_dev/chain_ab_bench.py v6 v7 v8
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

from adas_tpu.models import layers as L
from adas_tpu.models.layers import quantized
from adas_tpu.models.yolo import YoloSpec, build_yolo
from adas_tpu.tools.quantize import calibrate_act_scales, pack_int8_weights

ITERS = 20

SPECS = {
    "v6": ("v6", "s"),
    "v7": ("v7", "base"),
    "v8": ("v8", "l"),
    "v9": ("v9", "c"),
    "v5lite": ("v5lite", "g"),
}


def chain_ms(apply_fn, variables, x):
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
    return best / ITERS * 1000


def run(which):
    family, scale = SPECS[which]
    spec = YoloSpec(
        family=family, scale=scale, num_classes=80, input_size=(640, 640)
    )
    net = build_yolo(spec)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 640, 640, 3)),
        jnp.float32,
    )
    v = net.init(jax.random.PRNGKey(0), x[:1])
    if family == "v6":
        from adas_tpu.models.yolov6 import fuse_repvgg_variables

        v = fuse_repvgg_variables(v)
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

    prev = L._S8_CHAIN
    try:
        for on in (False, True):
            L.set_s8_chain(on)
            ms = chain_ms(apply_fn, v, x)
            print(
                f"{which:7s} 8x640 int8 chain={'on ' if on else 'off'}"
                f" {ms:8.2f} ms",
                flush=True,
            )
    finally:
        L.set_s8_chain(prev)


if __name__ == "__main__":
    for which in sys.argv[1:] or ["v6"]:
        run(which)
