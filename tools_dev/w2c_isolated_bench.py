"""Isolated TPU bench: direct s8 3x3 s2 Cin=64 conv vs the w2c 3x2
rewrite vs the N->H batch-merge rewrite, at v8l down1's serving shape —
plus producer-chained variants (1x1 conv feeding the down conv) to
expose layout interactions without the full serving graph.

Timing is a TWO-POINT chained probe (ITERS_HI - ITERS_LO device-loop
iterations) and the scalar result is fetched with float(): through the
~30 ms axon tunnel, block_until_ready on an unused result returns
early and a single-point probe is dominated by the dispatch constant
(both CLAUDE.md gotchas — the first version of this file measured
62,000 TF/s).

    timeout 1800 python tools_dev/w2c_isolated_bench.py
"""
import time

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

ITERS_LO, ITERS_HI = 50, 450
N, H, W, C, COUT = 8, 320, 320, 64, 128


def direct_conv(x, wq):
    return jax.lax.conv_general_dilated(
        x, wq, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def w2c_conv(x, w2):
    c = x.shape[-1]
    x2 = x.reshape(x.shape[0], x.shape[1], x.shape[2] // 2, 2 * c)
    return jax.lax.conv_general_dilated(
        x2, w2, (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def w2c_weights(wq):
    c = wq.shape[2]
    w2 = jnp.zeros((3, 2, 2 * c, wq.shape[-1]), wq.dtype)
    w2 = w2.at[:, 0, c:, :].set(wq[:, 0])
    w2 = w2.at[:, 1, :c, :].set(wq[:, 1])
    w2 = w2.at[:, 1, c:, :].set(wq[:, 2])
    return w2


def nh_merge_conv(x, wq):
    """(N,H,W,C)->(1,N*H,W,C) bitcast merge (major dims only), SAME
    stride-2 conv at N=1 (the `{3,0,2,1}` N-interleave is degenerate),
    exact seam correction on the n-1 contaminated first output rows
    (K[0] tap read the previous image's last row instead of zero pad).
    Exactness pinned in tools_dev/nh_merge_proto.py."""
    n, h, w, c = x.shape
    cout = wq.shape[-1]
    xm = x.reshape(1, n * h, w, c)
    y = jax.lax.conv_general_dilated(
        xm, wq, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).reshape(n, h // 2, w // 2, cout)
    last = x[:-1, h - 1:h, :, :]
    bad = jax.lax.conv_general_dilated(
        last, wq[0:1], (1, 2), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.at[1:, 0:1].add(-bad)


def make_loop(conv, iters, chained):
    """iters x (optional 1x1 producer conv + requant ->) down conv."""

    def fn(xq, w0, wdn):
        def body(i, s):
            x = jnp.bitwise_xor(xq, i.astype(jnp.int8))
            if chained:
                p = jax.lax.conv_general_dilated(
                    x, w0, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                x = jnp.clip(p // 128, -127, 127).astype(jnp.int8)
            return s + jnp.sum(conv(x, wdn))

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (N, H, W, C)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C, COUT)), jnp.int8)
    w0 = jnp.asarray(rng.integers(-127, 128, (1, 1, C, C)), jnp.int8)
    xq, wq, w0 = jax.device_put((xq, wq, w0))
    w2 = jax.device_put(w2c_weights(np.asarray(wq)))

    flops = 2 * N * (H // 2) * (W // 2) * 9 * C * COUT
    variants = [
        ("direct", direct_conv, wq),
        ("w2c", lambda x, _w: w2c_conv(x, w2), wq),
        ("nh", nh_merge_conv, wq),
    ]
    for chained in (False, True):
        for name, conv, wdn in variants:
            lo = make_loop(conv, ITERS_LO, chained)
            hi = make_loop(conv, ITERS_HI, chained)
            float(lo(xq, w0, wdn))  # compile + warm
            float(hi(xq, w0, wdn))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(lo(xq, w0, wdn))
                t1 = time.perf_counter()
                float(hi(xq, w0, wdn))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)))
            us = best / (ITERS_HI - ITERS_LO) * 1e6
            tag = "chained " + name if chained else name
            print(
                f"{tag:16s} {us:8.1f} us  "
                f"{flops / (us * 1e-6) / 1e12:6.1f} TF/s(model)",
                flush=True,
            )


if __name__ == "__main__":
    main()
