"""Dev probe: Pallas fused stem vs the XLA stem chain, real chip.

UFLD-CULane stem chain (conv7x7/2 + BN + relu + maxpool3x3/2, 8x320x1600)
and YOLO-640 stem (conv3x3/2 + BN + silu, 8x640x640), bf16, chained iters
inside one dispatch.

    timeout 3600 python tools_dev/stem_kernel_bench.py
"""
import time

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from adas_tpu.models.layers import max_pool, polyphase_stride2_conv
from adas_tpu.ops.pallas_stem import fused_stem, stem_margins
from adas_tpu.ops.preprocess import S2DInput

ITERS = 30
rng = np.random.default_rng(0)


def chain_time(fn, *args):
    def probe(*a):
        def body(i, s):
            # feed the carry back into the input: a loop-invariant body
            # would let XLA hoist the XLA-chain variant out of the loop
            # (LICM) while the Pallas custom call stays inside, biasing
            # the comparison by up to ITERS x
            # (x*0 would be algebraically folded away; 1e-30 is below
            # bf16 resolution so the values are unchanged)
            a0 = a[0] + (s * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            return s + jnp.sum(out[:, ::64, ::64, :].astype(jnp.float32)) * 1e-6

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    p = jax.jit(probe)
    float(p(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(p(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def bench(tag, n, h, w, k, pool, act):
    hs, ws = h // 2, w // 2
    margins = stem_margins(k, k, pool)
    (mt, mb), (ml, mr) = margins
    kern = jnp.asarray(
        (rng.standard_normal((k, k, 3, 64)) * 0.05).astype(np.float32)
    )
    gain = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    planes = jnp.asarray(
        rng.standard_normal((n, hs + mt + mb, 12, ws + ml + mr)).astype(
            np.float32
        ),
        dtype=jnp.bfloat16,
    )
    s2d = jnp.asarray(
        rng.standard_normal((n, hs, ws, 12)).astype(np.float32),
        dtype=jnp.bfloat16,
    )

    def xla_chain(xd):
        y = polyphase_stride2_conv(
            S2DInput(xd, (n, h, w, 3)), kern.astype(jnp.bfloat16)
        )
        y = y.astype(jnp.float32) * gain + bias
        y = jax.nn.relu(y) if act == "relu" else jax.nn.silu(y)
        y = y.astype(jnp.bfloat16)
        if pool:
            y = max_pool(y, 3, 2, pad=1)
        return y

    def pallas_path(xd):
        return fused_stem(
            xd, kern, gain, bias, logical_hw=(h, w), pool=pool, act=act,
            out_dtype=jnp.bfloat16,
        )

    t_xla = chain_time(xla_chain, s2d)
    t_pl = chain_time(pallas_path, planes)
    print(f"{tag}: xla-chain {t_xla:.3f} ms  pallas {t_pl:.3f} ms")


bench("UFLD stem 8x320x1600 k7+pool", 8, 320, 1600, 7, True, "relu")
bench("YOLO stem 8x640x640 k3", 8, 640, 640, 3, False, "silu")
