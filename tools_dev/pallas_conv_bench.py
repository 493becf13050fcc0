"""Dev probe: Pallas fused int8 3x3 conv vs the XLA int8 conv, real chip.

The flagship's high-resolution bottleneck shapes (BASELINE.md round-3
roofline: 64-128 ch at >=80x80 bound int8 at ~31% of MXU peak), chained
iters inside one dispatch, both with the identical fused epilogue
(dequant * scale + bias, silu, requantize to s8).

    timeout 3600 python tools_dev/pallas_conv_bench.py

Decision rule: flip ADAS_PALLAS_CONV default on (models/layers.
_maybe_pallas_conv) only for shape classes where this shows a win.
"""
import time

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from adas_tpu.ops.pallas_conv import int8_conv3x3

ITERS = 30
rng = np.random.default_rng(0)


def chain_time(fn, x):
    def probe(xd):
        def body(i, s):
            # s8 carry perturbation: xor the low bit so the body cannot
            # be hoisted (LICM) while values stay valid s8
            xi = jnp.bitwise_xor(xd, (s % 2).astype(jnp.int8))
            out = fn(xi)
            return s + out[0, ::32, ::32, :].astype(jnp.int32).sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    p = jax.jit(probe)
    int(p(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(p(x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def bench(tag, n, h, w, cin, cout):
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w, cin)), jnp.int8)
    wq = jnp.asarray(
        rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8
    )
    scale = jnp.asarray(rng.uniform(1e-4, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (cout,)), jnp.float32)
    out_scale = jnp.float32(0.05)

    def xla_path(xi):
        acc = jax.lax.conv_general_dilated(
            xi, wq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = jax.nn.silu(acc.astype(jnp.float32) * scale + bias)
        return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(
            jnp.int8
        )

    def pallas_path(xi):
        return int8_conv3x3(
            xi, wq, scale, bias, "silu", out_scale=out_scale,
            interpret=False,
        )

    t_xla = chain_time(xla_path, xq)
    t_pl = chain_time(pallas_path, xq)
    ops = 2 * n * h * w * 9 * cin * cout
    print(
        f"{tag}: xla {t_xla:.3f} ms ({ops / (t_xla / 1e3) / 1e12:.1f} TOP/s)"
        f"  pallas {t_pl:.3f} ms ({ops / (t_pl / 1e3) / 1e12:.1f} TOP/s)"
    )


# YOLOv8l-640 trunk bottleneck bodies (8-stream batch)
bench("P2 c2f m: 8x160x160x64->64", 8, 160, 160, 64, 64)
bench("P3 c2f m: 8x80x80x128->128", 8, 80, 80, 128, 128)
bench("P4 c2f m: 8x40x40x256->256", 8, 40, 40, 256, 256)
# UFLD ResNet18 trunk block convs (320x1600 input -> stage maps)
bench("res s1: 8x80x400x64->64", 8, 80, 400, 64, 64)
bench("res s2: 8x40x200x128->128", 8, 40, 200, 128, 128)
