"""Isolated A/B probe for the fused block kernel internals (TPU).

Times, at one block shape (default the lane-trunk layer1 body,
8x80x400x64):
  xla2      — two XLA int8 convs + requant epilogues + residual (the
              in-situ competitor, s8-chained)
  block     — ops/pallas_block.fused_block (one kernel)
  conv1x2   — two ops/pallas_conv.int8_conv3x3 calls (the r04 kernel,
              planar relayout per call) for orientation comparison
Usage: timeout 1800 python tools_dev/block_kernel_probe.py [N H W C]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

ITERS = 30


def timeit(fn, *args):
    p = jax.jit(fn)
    jax.block_until_ready(p(*args))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(p(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000


def main():
    n, h, w, c = (
        [int(v) for v in sys.argv[1:5]] if len(sys.argv) > 4 else (8, 80, 400, 64)
    )
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-100, 100, (n, h, w, c)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-80, 80, (3, 3, c, c)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-80, 80, (3, 3, c, c)), jnp.int8)
    s1 = jnp.asarray(rng.uniform(1e-4, 3e-4, (c,)), jnp.float32)
    s2 = jnp.asarray(rng.uniform(1e-4, 3e-4, (c,)), jnp.float32)
    b1 = jnp.zeros((c,), jnp.float32)
    sx, sm, so = (jnp.float32(v) for v in (0.02, 0.03, 0.025))

    def conv_s8(x, wq):
        return jax.lax.conv_general_dilated(
            x, wq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def xla2(x0):
        def body(i, carry):
            x = (carry + i).astype(jnp.int8)
            y1 = jax.nn.relu(
                conv_s8(x, w1).astype(jnp.float32) * s1 + b1
            )
            q1 = jnp.clip(jnp.round(y1 / sm), -127, 127).astype(jnp.int8)
            y2 = conv_s8(q1, w2).astype(jnp.float32) * s2
            y2 = y2 + x.astype(jnp.float32) * sx
            y = jax.nn.relu(y2)
            return jnp.clip(jnp.round(y / so), -127, 127).astype(jnp.int32)
        out = jax.lax.fori_loop(0, ITERS, body, x0.astype(jnp.int32))
        return jnp.sum(out)

    from adas_tpu.ops import pallas_block as PB

    def block(x0):
        def body(i, carry):
            x = (carry + i).astype(jnp.int8)
            p = PB.to_planar(x, sx)
            o = PB.fused_block(
                p, w1, s1, b1, sm, w2, s2, None, so,
                act1="relu", act2=None, act_post="relu", residual=True,
                interpret=False,
            )
            return PB.from_planar(o).astype(jnp.int32)
        out = jax.lax.fori_loop(0, ITERS, body, x0.astype(jnp.int32))
        return jnp.sum(out)

    def block_noconv(x0):
        """to_planar/from_planar only — bounds the chain-boundary cost."""
        def body(i, carry):
            x = (carry + i).astype(jnp.int8)
            p = PB.to_planar(x, sx)
            return PB.from_planar(p).astype(jnp.int32)
        out = jax.lax.fori_loop(0, ITERS, body, x0.astype(jnp.int32))
        return jnp.sum(out)

    def block_nhwc(x0):
        def body(i, carry):
            x = (carry + i).astype(jnp.int8)
            o = PB.fused_block_nhwc(
                x, sx, w1, s1, b1, sm, w2, s2, None, so,
                act1="relu", act2=None, act_post="relu", residual=True,
                interpret=False,
            )
            return o.astype(jnp.int32)
        out = jax.lax.fori_loop(0, ITERS, body, x0.astype(jnp.int32))
        return jnp.sum(out)

    from adas_tpu.ops import pallas_conv as PC

    def conv1x2(x0):
        def body(i, carry):
            x = (carry + i).astype(jnp.int8)
            q1 = PC.int8_conv3x3(
                x, w1, s1 * sx, None, "relu", out_scale=sm,
                interpret=False,
            )
            y2 = PC.int8_conv3x3(
                q1, w2, s2 * sm, None, None, out_scale=None,
                interpret=False,
            )
            y = jax.nn.relu(y2.astype(jnp.float32) + x.astype(jnp.float32) * sx)
            return jnp.clip(jnp.round(y / so), -127, 127).astype(jnp.int32)
        out = jax.lax.fori_loop(0, ITERS, body, x0.astype(jnp.int32))
        return jnp.sum(out)

    for name, fn in (
        ("xla2", xla2), ("block", block), ("boundary", block_noconv),
        ("block_nhwc", block_nhwc), ("conv1x2", conv1x2),
    ):
        try:
            ms = timeit(fn, xq)
            print(f"{n}x{h}x{w}x{c}  {name:10s} {ms:7.3f} ms/iter", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
