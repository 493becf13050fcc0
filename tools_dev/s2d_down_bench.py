"""Dev microbench: s8 stride-2 3x3 downsample conv — direct vs polyphase.

The round-5 quantize-attribution trace (tools_dev/quant_attrib.py)
showed v8l's ``down1`` (s8 3x3 stride-2, 8x320x320x64 -> 160x160x128)
running at 39.7 TF/s — ~10% of int8 MXU peak — while its dense
stride-1 and Cin>=128 siblings hit 200-350 TF/s.  Hypothesis: XLA's
strided s8 conv lowering underfills the MXU at Cin=64; the polyphase
space-to-depth rewrite (models/layers.polyphase_stride2_conv, already
used for tiny-Cin stems) should recover the dense rate at 1.78x the
FLOPs (2x2x4C taps vs 3x3xC).

Run on the real TPU:
    timeout 1800 python tools_dev/s2d_down_bench.py

VERDICT (round 5, real TPU): hypothesis REFUTED.  The direct strided
s8 conv is healthy in isolation (~126 TF/s on the down1 shape) and the
polyphase form is ~4x SLOWER (the s8 NHWC->planes transpose dominates).
The in-situ 39.7 TF/s therefore comes from the surrounding
fusion/layout context (planar block-kernel boundary), not from the
conv lowering itself — see BASELINE.md r05 attribution table.
"""
import time

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from adas_tpu.models.layers import polyphase_stride2_conv

#: two-point chained probe (bench.py's compute_fps method): per-iter
#: time = (t(N2) - t(N1)) / (N2 - N1), cancelling the ~30 ms tunnel
#: dispatch latency that would otherwise swamp these us-scale ops
N1, N2 = 50, 250

#: (label, (N,H,W,Cin), Cout) — down1 @640-input v8l, the lane
#: layer2_0 conv1, and the healthy down2 as control
SHAPES = [
    ("v8l_down1 320x320x64->128", (8, 320, 320, 64), 128),
    ("lane_l2 80x400x64->128", (8, 80, 400, 64), 128),
    ("v8l_down2 160x160x128->256", (8, 160, 160, 128), 256),
]


def direct(xq, wq):
    return jax.lax.conv_general_dilated(
        xq, wq, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def poly(xq, wq):
    return polyphase_stride2_conv(
        xq, wq, preferred_element_type=jnp.int32
    )


def time_fn(fn, xq, wq):
    def make(iters):
        def probe(x0, w):
            def body(i, s):
                xi = jnp.bitwise_xor(x0, i.astype(jnp.int8))
                return s + jnp.sum(fn(xi, w))

            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        p = jax.jit(probe)
        int(p(xq, wq))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(p(xq, wq))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = make(N1), make(N2)
    return (t2 - t1) / (N2 - N1) * 1e6  # us per iter


def main() -> None:
    rng = np.random.default_rng(0)
    for label, (n, h, w, cin), cout in SHAPES:
        xq = jnp.asarray(
            rng.integers(-127, 128, (n, h, w, cin)), jnp.int8
        )
        wq = jnp.asarray(
            rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8
        )
        a = jax.jit(direct)(xq, wq)
        b = jax.jit(poly)(xq, wq)
        exact = bool(jnp.array_equal(a, b))
        t_d = time_fn(direct, xq, wq)
        t_p = time_fn(poly, xq, wq)
        gf = 2.0 * n * (h // 2) * (w // 2) * cout * 9 * cin / 1e9
        print(
            f"{label:34s} exact={exact}  direct {t_d:7.1f} us"
            f" ({gf/t_d*1e3:6.1f} TF/s)   poly {t_p:7.1f} us"
            f" ({gf/t_p*1e3:6.1f} TF/s model)  poly/direct {t_p/t_d:5.2f}"
        )


if __name__ == "__main__":
    main()
