"""Fused W8A8 int8 3x3 convolution as a Pallas TPU kernel.

Computes  ``requant( act( conv3x3_s8(x_q, w_q) * scale + bias ) )``  in
ONE pass per output-row band: the s8 input tile is DMA'd to VMEM once,
the nine taps are contracted on the MXU as K-packed matmuls
(s8 x s8 -> s32), and the whole dequant epilogue — per-output-channel
scale (weight-scale x activation-scale x folded BN gain), bias,
activation, and the OPTIONAL s8 requantize of the chained output — runs
on the accumulator while it is still in VMEM.  Neither the s32
accumulator nor a bf16 intermediate ever reaches HBM; with requantize
the layer's entire HBM footprint is 1-byte in, 1-byte out.

This is the per-layer fused conv+requantize that TensorRT's int8 engine
builder emits for Conv+BN+act chains (the reference sketches that
engine at /root/reference/convertOnnxToTensorRT.py:28-99,150-173); the
graph-level s8 chaining in models/layers.py decides WHICH edges carry
s8 — this kernel owns the arithmetic of one hot layer shape: dense
3x3/stride-1/pad-1, the C2f/C3 bottleneck bodies and ResNet block convs
that dominate the flagship trunks at high spatial resolution
(BASELINE.md round-3 roofline: the 64-128ch >=80x80 stages under-fill
the MXU and bound int8 at ~31% of peak).

Serving policy: OFF by default until a measured on-TPU win
(``ADAS_PALLAS_CONV=1`` enables; ``tools_dev/pallas_conv_bench.py``
measures; bench.py records engagement provenance).  Correctness is
pinned against the XLA path bit-for-bit on the integer accumulator and
to f32 rounding on the epilogue (tests/test_pallas_conv.py) in
interpreter mode off-TPU.
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act_fn(act: Optional[str]):
    if act is None:
        return lambda v: v
    if act == "relu":
        return jax.nn.relu
    if act == "silu":
        return jax.nn.silu
    raise ValueError(f"unsupported activation: {act}")


def pack_w2(wq_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) s8 kernel -> (3, Cout, 3*Cin): per W-tap dx, a
    (Cout, K) matrix whose K axis is (dy, cin)-ordered — the layout that
    matches the planar scratch reshape in the kernel, so each output row
    contracts three K-packed matmuls (K = 3*Cin) instead of nine K=Cin
    ones.  K-packing the H taps (contiguous scratch rows — the stem
    kernel's trick) refills the 128-deep MXU contraction for the
    64-channel stages without any in-kernel concatenate (Mosaic cannot
    lane-concatenate shifted slices: "offset mismatch on non-concat
    dimension")."""
    kh, kw, cin, cout = wq_hwio.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    # (dy, dx, cin, cout) -> (dx, cout, dy, cin) -> (3, cout, 3cin)
    return wq_hwio.transpose(1, 3, 0, 2).reshape(3, cout, 3 * cin)


def _conv_kernel(
    *,
    band: int,
    wpad: int,
    w_out: int,
    cin: int,
    cout: int,
    act: Optional[str],
    out_dtype,
    requant: bool,
):
    """Kernel body: grid = (N, H_out/band).  Input HBM ref is the
    spatially pre-padded PLANAR s8 tensor (N, H+2, Cin, Wpad) where
    Wpad >= W+2 is 128-lane aligned (channel rides sublanes, W rides
    lanes — the stem kernel's orientation); weights (3, Cout, 3Cin) s8
    resident in VMEM; scale/bias (1, Cout) f32; out (N, H, W, Cout)
    natively NHWC."""
    act_f = _act_fn(act)
    rows_in = band + 2

    def kernel(x_hbm, w_ref, s_ref, b_ref, q_ref, o_ref, xt, sem):
        n = pl.program_id(0)
        bi = pl.program_id(1)
        nbands = pl.num_programs(1)
        total = pl.num_programs(0) * nbands

        def issue(n_, b_, slot, do_wait):
            dma = pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(b_ * band, rows_in), :, :],
                xt.at[slot],
                sem.at[slot],
            )
            if do_wait:
                dma.wait()
            else:
                dma.start()

        step = n * nbands + bi
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            issue(n, bi, slot, False)

        nxt = step + 1

        @pl.when(nxt < total)
        def _():
            issue(
                jax.lax.div(nxt, nbands),
                jax.lax.rem(nxt, nbands),
                jax.lax.rem(nxt, 2),
                False,
            )

        issue(n, bi, slot, True)

        scale = s_ref[:]  # (1, cout) f32
        bias = b_ref[:]

        def one_row(r):
            """Output row r of the band: three K-packed MXU dots, one
            per W-tap dx.

            The three dy taps are CONTIGUOUS rows of the planar scratch
            (rows_in, cin, wpad), so the (3, cin, wl) slab collapses to
            the (3cin, wl) operand by reshape alone — no in-kernel
            concatenate (Mosaic cannot lane-concatenate shifted slices;
            same trick as ops/pallas_stem.py conv_row).  The dx shifts
            ride the lane dimension of the slice.
            """
            acc = None
            for dx in range(3):
                a_mat = xt[slot, r : r + 3, :, dx : dx + w_out].reshape(
                    3 * cin, w_out
                )  # (3cin, w_out) s8
                part = jax.lax.dot_general(
                    a_mat,
                    w_ref[dx],
                    (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (w_out, cout) s32
                acc = part if acc is None else acc + part
            y = act_f(acc.astype(jnp.float32) * scale + bias)
            if requant:
                inv = q_ref[0, 0]  # 1/out_scale
                y = jnp.clip(jnp.round(y * inv), -127, 127)
            return y.astype(out_dtype)

        for r in range(band):
            o_ref[0, r, :, :] = one_row(r)

    return kernel


@functools.lru_cache(maxsize=64)
def _make_conv_fn(
    h_out: int,
    wpad: int,
    w_out: int,
    cin: int,
    cout: int,
    act: Optional[str],
    out_dtype_str: str,
    requant: bool,
    interpret: bool,
):
    out_dtype = jnp.dtype(out_dtype_str)

    def call(xq_pad, w2, scale, bias, qinv):
        n = xq_pad.shape[0]
        # band: largest divisor of H_out that keeps the double-buffered
        # input tile within ~2 MB of VMEM (rows_in * wpad * cin bytes)
        budget = 1 * 1024 * 1024
        band = 1
        for cand in range(min(h_out, 64), 0, -1):
            if h_out % cand == 0 and (cand + 2) * wpad * cin <= budget:
                band = cand
                break
        kernel = _conv_kernel(
            band=band, wpad=wpad, w_out=w_out, cin=cin, cout=cout,
            act=act, out_dtype=out_dtype, requant=requant,
        )
        grid = (n, h_out // band)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n, h_out, w_out, cout), out_dtype
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, band, w_out, cout),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, band + 2, cin, wpad), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xq_pad, w2, scale, bias, qinv)

    vcall = jax.custom_batching.custom_vmap(call)

    @vcall.def_vmap
    def _rule(axis_size, in_batched, xq_pad, w2, scale, bias, qinv):
        xb = in_batched[0]
        if any(in_batched[1:]) or not xb:
            raise NotImplementedError(
                "int8_conv3x3 vmap maps over the input only"
            )
        lead = xq_pad.shape[:2]
        flat = xq_pad.reshape((lead[0] * lead[1],) + xq_pad.shape[2:])
        out = call(flat, w2, scale, bias, qinv)
        return out.reshape(lead + out.shape[1:]), True

    return jax.jit(vcall)


@functools.lru_cache(maxsize=64)
def conv_compile_ok(
    n: int,
    h: int,
    w: int,
    wpad: int,
    cin: int,
    cout: int,
    act: Optional[str],
    out_dtype_str: str,
    requant: bool,
) -> bool:
    """AOT compile-probe on the real TPU backend (no execution): a
    Mosaic lowering failure degrades to the XLA conv, never crashes.
    Same scope caveat as the stem probe (ops/pallas_stem.py): under the
    multistream vmap this sees the per-example shape; the custom_vmap
    rule only grows grid dim 0."""
    try:
        fn = _make_conv_fn(
            h, wpad, w, cin, cout, act, out_dtype_str, requant, False
        )
        fn.lower(
            jax.ShapeDtypeStruct((n, h + 2, cin, wpad), jnp.int8),
            jax.ShapeDtypeStruct((3, cout, 3 * cin), jnp.int8),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ).compile()
        return True
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(
            f"pallas int8 conv failed to compile for ({n},{h},{w},{cin})"
            f"->{cout}; serving the XLA conv instead: {e}"
        )
        return False


def pallas_conv_policy() -> str:
    """Serving policy, measured on the v5e test chip (2026-08-18).

    Isolated layers (tools_dev/pallas_conv_bench.py, chained iters, both
    sides with the identical requant epilogue):

      8x160x160  64->64:  xla 1.400 ms   pallas 1.331 ms   (-5%)
      8x80x400   64->64:  xla 1.674 ms   pallas 1.490 ms   (-11%)
      8x80x80  128->128:  xla 0.988 ms   pallas 1.166 ms   (+18%)
      8x40x40  256->256:  xla 0.918 ms   pallas 1.086 ms   (+18%)

    — the kernel wins in isolation exactly where the roofline said XLA
    under-fills the MXU (Cin <= 64 high-res stages; K-packing the H taps
    trebles the contraction depth) and loses once Cin >= 128 fills the
    lanes anyway.  IN SITU, however, routing the 64-ch stages through
    the kernel made the whole YOLOv8l int8 trunk SLOWER
    (tools_dev/int8_microbench.py yolo: 12.30 ms all-XLA vs 14.07 ms
    with the kernel at P2): each custom call pays an NHWC->planar s8
    relayout and breaks the producer/consumer elementwise fusions XLA
    builds around its own convs, which costs more than the 5% isolated
    win.  Verdict recorded rather than hidden:

    "off" (default): XLA serves every conv.
    "all": every eligible dense 3x3 (ADAS_PALLAS_CONV=1 — the measuring
    and correctness-test mode).
    """
    v = os.environ.get("ADAS_PALLAS_CONV")
    if v == "1":
        return "all"
    return "off"


def int8_conv3x3(
    xq: jnp.ndarray,
    wq_hwio: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    act: Optional[str],
    out_scale: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused int8 3x3/s1/p1 conv + epilogue (+ s8 requantize).

    ``xq``: (N, H, W, Cin) s8.  ``wq_hwio``: (3, 3, Cin, Cout) s8.
    ``scale``: (Cout,) f32 — the FULL epilogue scale
    (wscale * xscale * bn_gain).  ``bias``: (Cout,) f32 or None.
    ``out_scale``: static scalar -> returns s8 data quantized with it
    (the caller wraps it in a QTensor); None -> bf16 output.

    Exactness contract vs the XLA path (models/layers.int8_conv_apply):
    the s32 accumulator is bit-identical (same integer math); the f32
    epilogue differs only by fusion rounding (<=1 ulp), and the requant
    round() can flip values sitting exactly on a rounding boundary.
    """
    n, h, w, cin = xq.shape
    _, _, _, cout = wq_hwio.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # spatial pre-pad (s8, cheap) + lane-align W, then transpose to the
    # planar (N, H+2, Cin, Wpad) layout the kernel reads (channel rides
    # sublanes, W rides lanes): one XLA relayout pass over 1-byte data
    wpad = w + 2 + (-(w + 2) % 128)
    xq_pad = jnp.pad(
        xq, ((0, 0), (1, 1), (1, wpad - w - 1), (0, 0))
    ).transpose(0, 1, 3, 2)
    w2 = pack_w2(wq_hwio)
    scale = jnp.asarray(scale, jnp.float32).reshape(1, cout)
    if bias is None:
        bias = jnp.zeros((1, cout), jnp.float32)
    else:
        bias = jnp.asarray(bias, jnp.float32).reshape(1, cout)
    requant = out_scale is not None
    if requant:
        qinv = (1.0 / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)
        out_dtype = jnp.int8
    else:
        qinv = jnp.ones((1, 1), jnp.float32)
        out_dtype = jnp.bfloat16
    fn = _make_conv_fn(
        h, wpad, w, cin, cout, act, jnp.dtype(out_dtype).name,
        requant, interpret,
    )
    return fn(xq_pad, w2, scale, bias, qinv)
