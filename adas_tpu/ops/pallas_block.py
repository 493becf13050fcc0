"""Fused W8A8 residual-block (conv3x3 -> conv3x3 [+add]) Pallas kernel.

Round 4's single-conv kernel (ops/pallas_conv.py) won isolated exactly
where the roofline predicted (Cin <= 64 high-res stages under-fill the
MXU; K-packing the H taps trebles the contraction depth) but LOST in
situ: every call paid an NHWC->planar s8 relayout and broke the
producer/consumer elementwise fusions XLA builds around its own convs.
This kernel amortizes both costs at the BLOCK level — the shape VERDICT
r4 #1 asked for:

- TWO convolutions run per call (a ResNet BasicBlock body or a YOLO
  C2f/C3 bottleneck body): the mid activation lives in VMEM scratch,
  requantized s8 by conv1's fused epilogue, and never touches HBM;
- the residual add + final activation + output requantize ride conv2's
  epilogue on the accumulator while it is still in VMEM;
- blocks CHAIN through a padded-planar s8 domain (:class:`PlanarQ`), so
  a stage of n blocks pays ONE NHWC->planar relayout at entry and ONE
  back at exit instead of one per conv.

Layout — the padded planar domain
---------------------------------
``(N, H+4, C, Wpad)`` int8, channel on sublanes, W on the 128 lanes
(the orientation of ops/pallas_conv.py / ops/pallas_stem.py: W >= 80 at
the target stages fills lanes that C=64 cannot).  Data occupies rows
``2..H+1`` and cols ``2..W+1``; everything else is zeros.  The double
halo lets conv2's 3x3 window read conv1 outputs one row/col beyond the
data without any clamped DMA: a band of ``band`` output rows needs
``band+2`` mid rows needs ``band+4`` input rows, always in range.

Epilogue math (identical to the XLA path, models/layers.py
``int8_conv_apply``):

    mid = clip(round(act1(conv_s8(x, w1) * scale1 + bias1) / s_mid))
    y   = act2(conv_s8(mid, w2) * scale2 + bias2)
    y   = act_post(y + x * s_x)          # residual blocks
    out = clip(round(y / s_out))         # s8, chained to the consumer

where ``scale1 = w1_scale * s_x * bn1_gain`` etc. — the s32
accumulators are bit-identical to the XLA convs; the f32 epilogues
differ only by fusion rounding.  This is the multi-layer int8 region a
TensorRT engine builds for Conv+BN+act->Conv+BN(+add) chains
(/root/reference/convertOnnxToTensorRT.py:150-173 sketches that
builder); the graph-level seams are models/resnet.py BasicBlock and
models/yolo.py Bottleneck.

Serving policy: ``pallas_block_policy()`` — "auto" routes eligible
blocks through the kernel on TPU after an AOT compile probe (interpret
mode off-TPU for tests); ``ADAS_PALLAS_BLOCK=0`` forces the XLA path.
bench.py provenance counts engagements (``pallas_blocks`` trace stat).
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import pack_w2  # (3,3,Cin,Cout) s8 -> (3, Cout, 3Cin)


class PlanarQ(NamedTuple):
    """An s8 activation in the padded planar domain (see module doc).

    ``data``: (N, H+4, C, Wpad) int8 — rows 2..H+1 / cols 2..W+1 hold
    the value, the rest is zero.  ``scale``: f32 per-tensor dequant
    scale.  ``hw``: the logical (H, W).  Blocks chain PlanarQ->PlanarQ;
    :func:`from_planar` converts back to an NHWC s8 tensor."""

    data: jnp.ndarray
    scale: jnp.ndarray
    hw: Tuple[int, int]


def planar_wpad(w: int) -> int:
    """Lane-aligned planar width for logical W (2+W+2 pad, 128-multiple)."""
    return w + 4 + (-(w + 4) % 128)


def to_planar(xq: jnp.ndarray, scale, hw=None) -> PlanarQ:
    """NHWC s8 (N, H, W, C) -> padded planar PlanarQ.  One XLA pad +
    transpose pass over 1-byte data, paid once per fused chain."""
    n, h, w, c = xq.shape
    wpad = planar_wpad(w)
    xp = jnp.pad(xq, ((0, 0), (2, 2), (2, wpad - w - 2), (0, 0)))
    return PlanarQ(xp.transpose(0, 1, 3, 2), scale, (h, w))


def from_planar(p: PlanarQ) -> jnp.ndarray:
    """Padded planar -> NHWC s8 (N, H, W, C)."""
    h, w = p.hw
    return p.data[:, 2 : 2 + h, :, 2 : 2 + w].transpose(0, 1, 3, 2)


def _act(act: Optional[str]):
    if act is None:
        return lambda v: v
    if act == "relu":
        return jax.nn.relu
    if act == "silu":
        return jax.nn.silu
    raise ValueError(f"unsupported activation: {act}")


def _block_kernel(
    *,
    band: int,
    h: int,
    w: int,
    wpad: int,
    cin: int,
    cmid: int,
    cout: int,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
):
    """Kernel body: grid = (N, H/band).  Refs:

    x_hbm   (N, H+4, cin, wpad) s8   padded planar input (ANY/HBM)
    w1_ref  (3, cmid, 3cin)     s8   conv1 taps (pack_w2 layout, VMEM)
    s1_ref  (cmid, 1)           f32  conv1 epilogue scale
    b1_ref  (cmid, 1)           f32  conv1 epilogue bias
    w2_ref  (3, cout, 3cmid)    s8   conv2 taps
    s2_ref  (cout, 1)           f32  conv2 epilogue scale
    b2_ref  (cout, 1)           f32  conv2 epilogue bias
    q_ref   (1, 3)              f32  [1/s_mid, s_x, 1/s_out]  (SMEM)
    o_ref   (1, H+4, cout, wpad) s8  padded planar output (persistent
                                     VMEM block per n, zeroed at j==0)
    xt      (2, band+4, cin, wpad)   double-buffered input scratch
    mt      (band+2, cmid, wpad)     mid (conv1 out, s8) scratch
    sem     DMA semaphores
    """
    a1, a2, ap = _act(act1), _act(act2), _act(act_post)
    rows_in = band + 4
    wmid = w + 2

    def kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               q_ref, o_ref, xt, mt, sem):
        n = pl.program_id(0)
        j = pl.program_id(1)
        nbands = pl.num_programs(1)
        total = pl.num_programs(0) * nbands

        def issue(n_, j_, slot, do_wait):
            dma = pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(j_ * band, rows_in), :, :],
                xt.at[slot],
                sem.at[slot],
            )
            if do_wait:
                dma.wait()
            else:
                dma.start()

        step = n * nbands + j
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            issue(n, j, slot, False)

        nxt = step + 1

        @pl.when(nxt < total)
        def _():
            issue(
                jax.lax.div(nxt, nbands), jax.lax.rem(nxt, nbands),
                jax.lax.rem(nxt, 2), False,
            )

        issue(n, j, slot, True)

        # the output block persists across j (same block index): zero
        # its pad rows/cols once per n — VMEM-local stores
        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        s1 = s1_ref[:]  # (cmid, 1) f32 — channel scale rides sublanes
        b1 = b1_ref[:]
        s2 = s2_ref[:]
        b2 = b2_ref[:]
        qinv_mid = q_ref[0, 0]
        res_scale = q_ref[0, 1]
        qinv_out = q_ref[0, 2]

        # conv1: mid rows for this band.  Mid tile row k holds mid data
        # row m = j*band - 1 + k (k = 0..band+1); m = -1 and m = H are
        # conv2's zero padding (computed then masked — only the first/
        # last band have one such row).  Mid tile col t holds mid data
        # col t-1 (t = 0..wmid-1); cols t=0 and t=w+1 are padding.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wmid), 1)
        col_ok = (col >= 1) & (col <= w)

        for k in range(band + 2):
            acc = None
            for dx in range(3):
                a_mat = xt[slot, k : k + 3, :, dx : dx + wmid].reshape(
                    3 * cin, wmid
                )
                part = jax.lax.dot_general(
                    w1_ref[dx], a_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (cmid, wmid) s32
                acc = part if acc is None else acc + part
            y1 = a1(acc.astype(jnp.float32) * s1 + b1)
            q1 = jnp.clip(jnp.round(y1 * qinv_mid), -127, 127)
            m = j * band - 1 + k
            row_ok = jnp.logical_and(m >= 0, m <= h - 1)
            mt[k, :, :wmid] = jnp.where(
                jnp.logical_and(row_ok, col_ok), q1, 0.0
            ).astype(jnp.int8)

        # conv2 (+ residual + requantize): output rows of this band
        for i in range(band):
            acc = None
            for dx in range(3):
                a_mat = mt[i : i + 3, :, dx : dx + w].reshape(
                    3 * cmid, w
                )
                part = jax.lax.dot_general(
                    w2_ref[dx], a_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (cout, w) s32
                acc = part if acc is None else acc + part
            y = a2(acc.astype(jnp.float32) * s2 + b2)
            if residual:
                xres = xt[slot, i + 2, :, 2 : 2 + w].astype(jnp.float32)
                y = y + xres * res_scale
            y = ap(y)
            q = jnp.clip(jnp.round(y * qinv_out), -127, 127)
            o_ref[0, j * band + i + 2, :, 2 : 2 + w] = q.astype(jnp.int8)

    return kernel


@functools.lru_cache(maxsize=64)
def _make_block_fn(
    h: int,
    w: int,
    wpad: int,
    cin: int,
    cmid: int,
    cout: int,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
    interpret: bool,
):
    def call(xp, w1, s1, b1, w2, s2, b2, qvec):
        n = xp.shape[0]
        # band: largest divisor of H whose working set (double-buffered
        # input + mid + persistent output plane) fits a ~10 MB budget
        # (VMEM is ~16 MB/core; a small band pays 4 halo DMA rows and 2
        # recomputed mid rows per band — band 10 costs ~40% extra input
        # reads where band 40 costs ~10%).  The conv loops unroll per
        # band row, and Mosaic's scoped-vmem STACK grows with the live
        # unrolled intermediates — at cin >= 128 a band of 40 blew the
        # 16 MB scoped limit (measured 2026-08-19: 18.99M for
        # 40x200x128; the compile probe degraded it to XLA).  Cap the
        # unroll where channels are wide; ``ADAS_PALLAS_BLOCK_BAND``
        # overrides for measurement.
        budget = 10 * 1024 * 1024
        cap = os.environ.get("ADAS_PALLAS_BLOCK_BAND")
        if cap is not None:
            cap = int(cap)
        else:
            cap = 64 if cin <= 64 else 10
        out_bytes = (h + 4) * cout * wpad
        band = 1
        for cand in range(min(h, cap), 0, -1):
            tile = 2 * (cand + 4) * cin * wpad + (cand + 2) * cmid * wpad
            if h % cand == 0 and tile + out_bytes <= budget:
                band = cand
                break
        kernel = _block_kernel(
            band=band, h=h, w=w, wpad=wpad, cin=cin, cmid=cmid,
            cout=cout, act1=act1, act2=act2, act_post=act_post,
            residual=residual,
        )
        grid = (n, h // band)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n, h + 4, cout, wpad), jnp.int8
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, h + 4, cout, wpad),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, band + 4, cin, wpad), jnp.int8),
                pltpu.VMEM((band + 2, cmid, wpad), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xp, w1, s1, b1, w2, s2, b2, qvec)

    vcall = jax.custom_batching.custom_vmap(call)

    @vcall.def_vmap
    def _rule(axis_size, in_batched, xp, w1, s1, b1, w2, s2, b2, qvec):
        if any(in_batched[1:]) or not in_batched[0]:
            raise NotImplementedError(
                "fused_block vmap maps over the input only"
            )
        lead = xp.shape[:2]
        flat = xp.reshape((lead[0] * lead[1],) + xp.shape[2:])
        out = call(flat, w1, s1, b1, w2, s2, b2, qvec)
        return out.reshape(lead + out.shape[1:]), True

    return jax.jit(vcall)


@functools.lru_cache(maxsize=128)
def block_compile_ok(
    n: int,
    h: int,
    w: int,
    cin: int,
    cmid: int,
    cout: int,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
) -> bool:
    """AOT compile-probe on the real TPU backend (no execution): a
    Mosaic lowering failure degrades to the XLA block, never crashes.
    Under the multistream vmap this sees the per-example shape; the
    custom_vmap rule only grows grid dim 0."""
    wpad = planar_wpad(w)
    try:
        fn = _make_block_fn(
            h, w, wpad, cin, cmid, cout, act1, act2, act_post,
            residual, False,
        )
        s8 = jnp.int8
        f32 = jnp.float32
        fn.lower(
            jax.ShapeDtypeStruct((n, h + 4, cin, wpad), s8),
            jax.ShapeDtypeStruct((3, cmid, 3 * cin), s8),
            jax.ShapeDtypeStruct((cmid, 1), f32),
            jax.ShapeDtypeStruct((cmid, 1), f32),
            jax.ShapeDtypeStruct((3, cout, 3 * cmid), s8),
            jax.ShapeDtypeStruct((cout, 1), f32),
            jax.ShapeDtypeStruct((cout, 1), f32),
            jax.ShapeDtypeStruct((1, 3), f32),
        ).compile()
        return True
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(
            f"pallas fused block failed to compile for ({n},{h},{w},"
            f"{cin}->{cmid}->{cout}); serving the XLA block instead: {e}"
        )
        return False


def _block_kernel_nhwc(
    *,
    band: int,
    h: int,
    w: int,
    wpad: int,
    cin: int,
    cmid: int,
    cout: int,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
):
    """NHWC-I/O variant: reads row-padded NHWC s8 (N, H+4, W, C) and
    writes plain NHWC s8 (N, H, W, Cout).

    The profile of the planar variant showed the kernel 2x faster than
    XLA's convs but the XLA-side planar boundary costing 3x the win
    (transposes + upstream layout poisoning + unfused pool).  Here the
    NHWC->planar relayout happens IN VMEM, per band: each DMA'd input
    row transposes once into the planar scratch the K-packed dots want,
    and each output row (cout, w) transposes back before the store —
    two small relayouts per row against six K=3C dots, with no XLA
    transpose anywhere.

    Mosaic/axon constraints shaped two details (bisected 2026-08-19):
    a DMA into a VMEM scratch whose lane dim is < 128 crashes the
    compile helper, and a reshape that changes the lane count of s8
    data crashes it too — so the input arrives CHANNEL-PADDED to 128
    lanes (cheap XLA s8 pad), the tile transposes whole (128, w), and
    the value is SLICED back to cin rows for the compact planar scratch
    (slicing a value is free; K stays 3*cin on the MXU).
    """
    a1, a2, ap = _act(act1), _act(act2), _act(act_post)
    rows_in = band + 4
    wmid = w + 2
    cpad = max(cin, 128)

    def kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               q_ref, o_ref, xt, xpl, mt, sem):
        n = pl.program_id(0)
        j = pl.program_id(1)
        nbands = pl.num_programs(1)
        total = pl.num_programs(0) * nbands

        def issue(n_, j_, slot, do_wait):
            dma = pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(j_ * band, rows_in), :, :],
                xt.at[slot],
                sem.at[slot],
            )
            if do_wait:
                dma.wait()
            else:
                dma.start()

        step = n * nbands + j
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            issue(n, j, slot, False)
            # planar scratch pad columns (0,1 and w+2..) are never
            # written by the per-row transpose: zero once — the scratch
            # persists across grid steps
            xpl[...] = jnp.zeros_like(xpl)

        nxt = step + 1

        @pl.when(nxt < total)
        def _():
            issue(
                jax.lax.div(nxt, nbands), jax.lax.rem(nxt, nbands),
                jax.lax.rem(nxt, 2), False,
            )

        issue(n, j, slot, True)

        # VMEM relayout: NHWC row (w, cpad) -> planar; the channel pad
        # drops in the value slice (cin rows of the transpose)
        for k in range(rows_in):
            xpl[k, :, 2 : 2 + w] = xt[slot, k].T[:cin]

        s1 = s1_ref[:]
        b1 = b1_ref[:]
        s2 = s2_ref[:]
        b2 = b2_ref[:]
        qinv_mid = q_ref[0, 0]
        res_scale = q_ref[0, 1]
        qinv_out = q_ref[0, 2]

        col = jax.lax.broadcasted_iota(jnp.int32, (1, wmid), 1)
        col_ok = (col >= 1) & (col <= w)

        for k in range(band + 2):
            acc = None
            for dx in range(3):
                a_mat = xpl[k : k + 3, :, dx : dx + wmid].reshape(
                    3 * cin, wmid
                )
                part = jax.lax.dot_general(
                    w1_ref[dx], a_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = part if acc is None else acc + part
            y1 = a1(acc.astype(jnp.float32) * s1 + b1)
            q1 = jnp.clip(jnp.round(y1 * qinv_mid), -127, 127)
            m = j * band - 1 + k
            row_ok = jnp.logical_and(m >= 0, m <= h - 1)
            mt[k, :, :wmid] = jnp.where(
                jnp.logical_and(row_ok, col_ok), q1, 0.0
            ).astype(jnp.int8)

        for i in range(band):
            acc = None
            for dx in range(3):
                a_mat = mt[i : i + 3, :, dx : dx + w].reshape(
                    3 * cmid, w
                )
                part = jax.lax.dot_general(
                    w2_ref[dx], a_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = part if acc is None else acc + part
            y = a2(acc.astype(jnp.float32) * s2 + b2)
            if residual:
                xres = xpl[i + 2, :, 2 : 2 + w].astype(jnp.float32)
                y = y + xres * res_scale
            y = ap(y)
            q = jnp.clip(jnp.round(y * qinv_out), -127, 127)
            # planar (cout, w) -> NHWC row store
            o_ref[0, i, :, :] = q.astype(jnp.int8).T

    return kernel


@functools.lru_cache(maxsize=64)
def _make_block_nhwc_fn(
    h: int,
    w: int,
    cin: int,
    cmid: int,
    cout: int,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
    interpret: bool,
):
    wpad = planar_wpad(w)
    cpad = max(cin, 128)

    def call(xp, w1, s1, b1, w2, s2, b2, qvec):
        n = xp.shape[0]
        # band: largest divisor of H within a conservative VMEM budget
        # (NHWC tiles double-buffered + planar relayout + mid + banded
        # output; no persistent full plane here)
        budget = 9 * 1024 * 1024
        band = 1
        for cand in range(min(h, 64), 0, -1):
            tile = (
                2 * (cand + 4) * w * cpad         # xt (s8)
                + (cand + 4) * cin * wpad         # xpl (s8)
                + (cand + 2) * cmid * wpad        # mt (s8)
                + 2 * cand * w * cout             # out block (dbl-buf)
            )
            if h % cand == 0 and tile <= budget:
                band = cand
                break
        kernel = _block_kernel_nhwc(
            band=band, h=h, w=w, wpad=wpad, cin=cin, cmid=cmid,
            cout=cout, act1=act1, act2=act2, act_post=act_post,
            residual=residual,
        )
        grid = (n, h // band)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.int8),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, band, w, cout),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, band + 4, w, cpad), jnp.int8),
                pltpu.VMEM((band + 4, cin, wpad), jnp.int8),
                pltpu.VMEM((band + 2, cmid, wpad), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xp, w1, s1, b1, w2, s2, b2, qvec)

    vcall = jax.custom_batching.custom_vmap(call)

    @vcall.def_vmap
    def _rule(axis_size, in_batched, xp, w1, s1, b1, w2, s2, b2, qvec):
        if any(in_batched[1:]) or not in_batched[0]:
            raise NotImplementedError(
                "fused_block_nhwc vmap maps over the input only"
            )
        lead = xp.shape[:2]
        flat = xp.reshape((lead[0] * lead[1],) + xp.shape[2:])
        out = call(flat, w1, s1, b1, w2, s2, b2, qvec)
        return out.reshape(lead + out.shape[1:]), True

    return jax.jit(vcall)


@functools.lru_cache(maxsize=128)
def block_nhwc_compile_ok(
    n: int,
    h: int,
    w: int,
    cin: int,
    cmid: int,
    cout: int,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
) -> bool:
    """AOT compile-probe for the NHWC-I/O block kernel."""
    try:
        fn = _make_block_nhwc_fn(
            h, w, cin, cmid, cout, act1, act2, act_post, residual, False
        )
        s8 = jnp.int8
        f32 = jnp.float32
        fn.lower(
            jax.ShapeDtypeStruct((n, h + 4, w, max(cin, 128)), s8),
            jax.ShapeDtypeStruct((3, cmid, 3 * cin), s8),
            jax.ShapeDtypeStruct((cmid, 1), f32),
            jax.ShapeDtypeStruct((cmid, 1), f32),
            jax.ShapeDtypeStruct((3, cout, 3 * cmid), s8),
            jax.ShapeDtypeStruct((cout, 1), f32),
            jax.ShapeDtypeStruct((cout, 1), f32),
            jax.ShapeDtypeStruct((1, 3), f32),
        ).compile()
        return True
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(
            f"pallas NHWC fused block failed to compile for ({n},{h},{w},"
            f"{cin}->{cmid}->{cout}); serving the XLA block instead: {e}"
        )
        return False


def fused_block_nhwc(
    xq: jnp.ndarray,
    xscale,
    w1q: jnp.ndarray,
    scale1: jnp.ndarray,
    bias1: Optional[jnp.ndarray],
    mid_scale: jnp.ndarray,
    w2q: jnp.ndarray,
    scale2: jnp.ndarray,
    bias2: Optional[jnp.ndarray],
    out_scale: jnp.ndarray,
    *,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """NHWC-I/O fused block: (N, H, W, C) s8 in -> (N, H, W, Cout) s8
    out (quantized at ``out_scale``).  The only XLA-side prep is a
    2-row zero pad on H plus a channel pad to 128 lanes (both cheap
    same-layout s8 pads — no transposes, no layout poisoning; the lane
    pad exists because a DMA into a <128-lane VMEM scratch crashes the
    Mosaic compile helper).  Scales as in :func:`fused_block`."""
    n, h, w, cin = xq.shape
    cmid = w1q.shape[-1]
    cout = w2q.shape[-1]
    if residual and cout != cin:
        raise ValueError("residual fused_block requires cout == cin")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cp = max(cin, 128) - cin
    xp = jnp.pad(xq, ((0, 0), (2, 2), (0, 0), (0, cp)))
    w1p = pack_w2(w1q)
    w2p = pack_w2(w2q)
    f32 = jnp.float32
    s1 = jnp.asarray(scale1, f32).reshape(cmid, 1)
    b1 = (
        jnp.zeros((cmid, 1), f32)
        if bias1 is None
        else jnp.asarray(bias1, f32).reshape(cmid, 1)
    )
    s2 = jnp.asarray(scale2, f32).reshape(cout, 1)
    b2 = (
        jnp.zeros((cout, 1), f32)
        if bias2 is None
        else jnp.asarray(bias2, f32).reshape(cout, 1)
    )
    qvec = jnp.stack(
        [
            1.0 / jnp.asarray(mid_scale, f32).reshape(()),
            jnp.asarray(xscale, f32).reshape(()),
            1.0 / jnp.asarray(out_scale, f32).reshape(()),
        ]
    ).reshape(1, 3)
    fn = _make_block_nhwc_fn(
        h, w, cin, cmid, cout, act1, act2, act_post, residual, interpret
    )
    return fn(xp, w1p, s1, b1, w2p, s2, b2, qvec)


def block_layout() -> str:
    """Which fused-block I/O layout serves: "planar" (default) or "nhwc"
    (``ADAS_PALLAS_BLOCK_LAYOUT=nhwc``).

    Measured on the REAL serving path (tools_dev/serving_block_ab.py,
    8-stream YOLOv8l+UFLDv2 int8 compute probe, one tunnel window,
    2026-08-19): off 490.7 fps / nhwc 516.9 / PLANAR 526.8 (+7.4% over
    off, 5 blocks engaged at the c<=64 gate).  The earlier "planar
    boundary costs 3x its win" verdict was a MICROBENCH artifact: with
    the XLA stem, the NHWC->planar relayout poisons the upstream layout
    chain, but serving runs the Pallas fused stem, and the planar
    boundary there is one cheap s8 pad+transpose per fused chain.  The
    NHWC-I/O variant's in-kernel per-row transposes price it between
    the two."""
    return os.environ.get("ADAS_PALLAS_BLOCK_LAYOUT", "planar")


def block_shape_wins(h: int, w: int, cin: int) -> bool:
    """Roofline gate: the K-packed planar formulation beats XLA where
    the 128-lane MXU is channel-starved — Cin <= 64 at high spatial
    resolution (BASELINE.md round-3/4 roofline + isolated kernel bench;
    Cin >= 128 filled the lanes and lost isolated).  The serving A/B
    confirmed the gate end-to-end: maxc 64 = 526.8 fps vs maxc 128 =
    419.8 (15 blocks, the wide ones all losses).  Measurement knob:
    ``ADAS_PALLAS_BLOCK_MAXC`` widens the channel bound."""
    maxc = int(os.environ.get("ADAS_PALLAS_BLOCK_MAXC", "64"))
    return cin <= maxc and h * w >= 80 * 80 and h >= 8


def pallas_block_policy() -> str:
    """Serving policy for the fused block kernel.

    "auto" (default): eligible blocks route through the kernel on the
    REAL TPU backend after a per-shape compile probe — default-ON in
    serving.  Off-TPU, auto serves the XLA path: interpret-mode Pallas
    is orders of magnitude slower than the XLA CPU conv, and every int8
    test would pay it.  "force" (``ADAS_PALLAS_BLOCK=1``): engage even
    off-TPU in interpreter mode — the correctness-test mode.  "off"
    (``ADAS_PALLAS_BLOCK=0``): XLA serves every block — the measuring
    baseline."""
    v = os.environ.get("ADAS_PALLAS_BLOCK")
    if v == "0":
        return "off"
    if v == "1":
        return "force"
    return "auto"


def block_enabled() -> bool:
    """True when the fused block kernel may serve on this backend."""
    policy = pallas_block_policy()
    if policy == "off":
        return False
    if policy == "force":
        return True
    return jax.default_backend() == "tpu"


def fused_block(
    x: PlanarQ,
    w1q: jnp.ndarray,
    scale1: jnp.ndarray,
    bias1: Optional[jnp.ndarray],
    mid_scale: jnp.ndarray,
    w2q: jnp.ndarray,
    scale2: jnp.ndarray,
    bias2: Optional[jnp.ndarray],
    out_scale: jnp.ndarray,
    *,
    act1: Optional[str],
    act2: Optional[str],
    act_post: Optional[str],
    residual: bool,
    interpret: Optional[bool] = None,
) -> PlanarQ:
    """Run one fused two-conv block in the planar s8 domain.

    ``x``: PlanarQ input (scale s_x already folded into ``scale1``).
    ``w1q``/``w2q``: (3, 3, C, C') s8 HWIO kernels.  ``scale1`` =
    w1_scale * s_x * bn1_gain (per conv1 output channel); ``bias1`` the
    folded BN bias; ``mid_scale`` the calibrated conv1 output scale
    (ymax/127); ``scale2`` = w2_scale * mid_scale * bn2_gain;
    ``out_scale`` the static s8 output scale (the consumer reads the
    returned PlanarQ at it).  ``residual`` adds ``x`` (dequantized at
    ``x.scale``) before ``act_post``."""
    h, w = x.hw
    n, hp, cin, wpad = x.data.shape
    assert hp == h + 4 and wpad == planar_wpad(w), (x.data.shape, x.hw)
    cmid = w1q.shape[-1]
    cout = w2q.shape[-1]
    if residual and cout != cin:
        raise ValueError("residual fused_block requires cout == cin")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w1p = pack_w2(w1q)
    w2p = pack_w2(w2q)
    f32 = jnp.float32
    s1 = jnp.asarray(scale1, f32).reshape(cmid, 1)
    b1 = (
        jnp.zeros((cmid, 1), f32)
        if bias1 is None
        else jnp.asarray(bias1, f32).reshape(cmid, 1)
    )
    s2 = jnp.asarray(scale2, f32).reshape(cout, 1)
    b2 = (
        jnp.zeros((cout, 1), f32)
        if bias2 is None
        else jnp.asarray(bias2, f32).reshape(cout, 1)
    )
    qvec = jnp.stack(
        [
            1.0 / jnp.asarray(mid_scale, f32).reshape(()),
            jnp.asarray(x.scale, f32).reshape(()),
            1.0 / jnp.asarray(out_scale, f32).reshape(()),
        ]
    ).reshape(1, 3)
    fn = _make_block_fn(
        h, w, wpad, cin, cmid, cout, act1, act2, act_post, residual,
        interpret,
    )
    out = fn(x.data, w1p, s1, b1, w2p, s2, b2, qvec)
    return PlanarQ(out, out_scale, (h, w))
