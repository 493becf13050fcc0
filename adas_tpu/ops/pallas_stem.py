"""Fused polyphase stem as a Pallas TPU kernel.

Computes  ``maxpool3x3/2( act( conv_stride2(x) * gain + bias ) )``  (the
ResNet stem chain, reference TrafficLaneDetector resnet ``conv1 -> bn1 ->
relu -> maxpool``) or ``act( conv_stride2(x) * gain + bias )`` (the YOLO
3x3/2 stem, ObjectDetector yoloDetector backbones) in ONE pass, consuming
the planar pre-space-to-depth input (``ops.preprocess.S2DPlanes``) that
the phase-split resize dots emit directly.

Why (profiler trace, BASELINE.md round 3): the XLA chain materializes the
full-resolution stem activation (131 MB bf16 for UFLD-CULane x8) with
half-empty 128-lane tiles, pays a relayout copy of the space-to-depth
input, and reads it all back for the maxpool — ~1.9 ms of an ~15 ms step
for the UFLD stem chain, ~0.9 ms for the YOLO stem.  Here each band of
output rows is produced from a VMEM-resident tile: the polyphase taps are
gathered as lane-shifted slices of the planar tile (W stays in the
128-lane dimension end to end — the layout the resize dot already
produces), contracted on the MXU against the folded tap matrix, and the
conv activation never touches HBM.

Semantics match ``models.layers.polyphase_stride2_conv`` (torch
``pad=k//2`` stride-2 conv) + the BN affine + act + ``nn.max_pool``
(pad 1, -inf) bit-for-bit in f32; the maxpool's -inf padding is realized
as zero-padding, which is exact because the pooled values are
post-ReLU (>= 0) and every 3x3/2 pool window overlaps the valid range.

Falls back to interpreter mode off-TPU so tests run on CPU.
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


#: trace-time serving provenance (bench.py embeds it): how many stem
#: sites compiled into the Pallas kernel vs the XLA fallback chain, and
#: any probe failures.  Reset before tracing a pipeline, read after.
STEM_STATS = {"pallas_served": 0, "xla_fallback": 0, "probe_failed": 0}


def reset_stem_stats() -> None:
    for k in STEM_STATS:
        STEM_STATS[k] = 0


def polyphase_tap_params(kh: int, kw: int) -> Tuple[int, int, int, int]:
    """(na, nb, pad_a, pad_b): tap counts and cell-grid padding of the
    2x2-polyphase evaluation of an odd (kh, kw) stride-2 conv — same
    derivation as models.layers.polyphase_stride2_conv."""
    da, db = (kh // 2) & 1, (kw // 2) & 1
    na, nb = (kh + da + 1) // 2, (kw + db + 1) // 2
    return na, nb, (kh // 2 + da) // 2, (kw // 2 + db) // 2


def stem_margins(kh: int, kw: int, pool: bool) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Zero-halo margins ((top, bottom), (left, right)) in s2d-cell
    coordinates that S2DPlanes must carry for this stem: the union of the
    conv's cell-grid padding and (with ``pool``) the extra conv
    row/column the maxpool's pad-1 window reaches."""
    na, nb, pad_a, pad_b = polyphase_tap_params(kh, kw)
    e = 1 if pool else 0
    return (
        (pad_a + e, na - 1 - pad_a + e),
        (pad_b + e, nb - 1 - pad_b + e),
    )


def polyphase_w2t(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (kh, kw, c, f) stride-2 kernel -> per-b-tap matrices
    (nb, f, na*16): tap order (a, ch16) per W-tap b, with the 4C=12
    polyphase channels zero-padded to 16 — the sublane tile the kernel's
    scratch carries, so the (na, 16, wl) -> (na*16, wl) collapse is
    layout-trivial.  Same zero-padding/tap split as
    polyphase_stride2_conv."""
    kh, kw, c, f = kernel.shape
    da, db = (kh // 2) & 1, (kw // 2) & 1
    na, nb = (kh + da + 1) // 2, (kw + db + 1) // 2
    wp = jnp.pad(
        kernel,
        ((da, 2 * na - kh - da), (db, 2 * nb - kw - db), (0, 0), (0, 0)),
    )
    w2 = wp.reshape(na, 2, nb, 2, c, f).transpose(
        2, 0, 1, 3, 4, 5
    )  # (b, a, r, t, c, f)
    w2 = w2.reshape(nb, na, 4 * c, f)
    w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, 16 - 4 * c), (0, 0)))
    return w2.reshape(nb, na * 16, f).transpose(0, 2, 1)  # (nb, f, na*16)


def _act_fn(act: Optional[str]):
    if act is None:
        return lambda x: x
    if act == "relu":
        return jax.nn.relu
    if act == "silu":
        return jax.nn.silu
    raise ValueError(f"unsupported stem activation: {act}")


def _stem_kernel(
    *,
    cs2d: int,
    na: int,
    nb: int,
    feat: int,
    hs: int,
    ws: int,
    band: int,
    pool: bool,
    act: Optional[str],
    out_dtype,
    compute_dtype,
):
    """Kernel body builder.  ``band`` = output rows per grid step (pool
    rows if ``pool`` else conv rows); all other sizes static."""
    k_dim = na * nb * cs2d
    act_f = _act_fn(act)
    # computed conv-column lanes per row: pool needs cols -1..ws (lane
    # l <-> conv col l-1), plain covers 0..ws-1 (lane l <-> col l)
    wl = ws + 2 if pool else ws
    wo = ws // 2 if pool else ws

    rows_in = (2 * band + na) if pool else (band + na - 1)
    stride = 2 * band if pool else band

    def kernel(x_hbm, w_ref, g_ref, b_ref, o_ref, xt, sem):
        n = pl.program_id(0)
        bi = pl.program_id(1)
        nbands = pl.num_programs(1)
        total = pl.num_programs(0) * nbands

        # double-buffered input DMA: slot ``step % 2`` holds this
        # band's tile, the next band's copy is issued before compute
        def issue(n_, b_, slot, do_wait):
            dma = pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(b_ * stride, rows_in), :, :],
                xt.at[slot], sem.at[slot],
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
                jax.lax.div(nxt, nbands), jax.lax.rem(nxt, nbands),
                jax.lax.rem(nxt, 2), False,
            )

        issue(n, bi, slot, True)

        g = g_ref[:]  # (1, feat) f32
        b = b_ref[:]
        if pool:
            # conv row validity for the pool's pad row: sublane s is
            # conv col s-1; valid conv cols 0..ws-1
            col = jax.lax.broadcasted_iota(jnp.int32, (wl, 1), 0)
            col_ok = (col >= 1) & (col <= ws)
            # stride-2 pick as a one-hot matmul: Mosaic has no strided
            # slice (sublane or lane); a single nonzero per row makes
            # the selection exact in any precision
            ji = jax.lax.broadcasted_iota(jnp.int32, (wo, ws), 0)
            li = jax.lax.broadcasted_iota(jnp.int32, (wo, ws), 1)
            sel = (li == 2 * ji).astype(compute_dtype)

        def conv_row(cy):
            """One conv row in (pixels, feat) orientation: for each
            W-tap b, the (na, 16, wl) slab of the scratch collapses to
            the (na*16, wl) operand and one full-M MXU dot accumulates
            its contribution; then the folded affine + activation.  The
            orientation makes the output natively NHWC — no transposes
            anywhere in or after the kernel."""
            acc = None
            for bb in range(nb):
                a_mat = xt[slot, cy : cy + na, :, bb : bb + wl].reshape(
                    na * 16, wl
                )
                part = jax.lax.dot_general(
                    a_mat, w_ref[bb], (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (wl, feat)
                acc = part if acc is None else acc + part
            return act_f(acc * g + b)

        for i in range(band):
            if pool:
                parts = []
                for dy in range(3):
                    row = conv_row(2 * i + dy)
                    # global conv row: gy = 2*(bi*band + i) + dy - 1
                    gy = 2 * (bi * band + i) + dy - 1
                    ok = (gy >= 0) & (gy < hs)
                    row = jnp.where(ok & col_ok, row, 0.0)
                    parts.append(row)
                rm = jnp.maximum(jnp.maximum(parts[0], parts[1]), parts[2])
                # W pool: window-start max with contiguous sublane
                # slices, then the stride-2 pick as a strided sublane
                # slice (W rides sublanes in this orientation)
                m3 = jnp.maximum(
                    jnp.maximum(rm[0 : wl - 2], rm[1 : wl - 1]),
                    rm[2:wl],
                )  # (ws, feat): row s = max over conv cols s-1..s+1
                out_row = jax.lax.dot_general(
                    sel, m3.astype(compute_dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (wo, feat)
            else:
                out_row = conv_row(i)
            o_ref[0, i, :, :] = out_row.astype(out_dtype)

    return kernel, wl, wo


@functools.lru_cache(maxsize=64)
def _make_stem_fn(
    hs: int,
    ws: int,
    na: int,
    nb: int,
    pool: bool,
    act: Optional[str],
    out_dtype,
    interpret: bool,
):
    """Build the (custom-vmapped) pallas entry for one static config.

    jax.vmap of a pallas_call with an ANY-memory-space input is
    unsupported on TPU (the batching rule blocks the batch dim, but ANY
    requires a full-array trivial block) — and the multistream pipeline
    vmaps the step over streams.  The custom_vmap rule instead folds
    the mapped axis into the kernel's OWN leading grid dimension
    (reshape (B, n, ...) -> (B*n, ...)), which is exactly what the grid
    iterates anyway."""

    def call(planes, w2t, gain, bias):
        return _stem_call_impl(
            planes, w2t, gain, bias, hs, ws, na, nb, pool, act,
            out_dtype, interpret,
        )

    vcall = jax.custom_batching.custom_vmap(call)

    @vcall.def_vmap
    def _rule(axis_size, in_batched, planes, w2t, gain, bias):
        pb, wb, gb, bb = in_batched
        if wb or gb or bb or not pb:
            raise NotImplementedError(
                "fused_stem vmap supports mapping over the planes input "
                "only (weights must be broadcast)"
            )
        lead = planes.shape[:2]
        flat = planes.reshape((lead[0] * lead[1],) + planes.shape[2:])
        out = call(flat, w2t, gain, bias)
        return out.reshape(lead + out.shape[1:]), True

    return jax.jit(vcall)


def _fused_stem_call(planes, w2t, gain, bias, hs, ws, na, nb, pool, act,
                     out_dtype, interpret):
    fn = _make_stem_fn(hs, ws, na, nb, pool, act, out_dtype, interpret)
    return fn(planes, w2t, gain, bias)


def _stem_call_impl(
    planes: jnp.ndarray,
    w2t: jnp.ndarray,
    gain: jnp.ndarray,
    bias: jnp.ndarray,
    hs: int,
    ws: int,
    na: int,
    nb: int,
    pool: bool,
    act: Optional[str],
    out_dtype,
    interpret: bool,
):
    n, hp, cs2d, wp = planes.shape
    wp_pad = -wp % 128
    if cs2d != 16 or wp_pad:
        # the (channel, W) dims ride the (sublane, lane) tiling: DMA
        # slices must be tile-aligned, so pad 4C=12 -> 16 with zero
        # planes (their tap weights in w2t are zero too) and W to a
        # 128-lane multiple.  One small XLA pad pass.
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, 16 - cs2d), (0, wp_pad))
        )
        cs2d = 16
        wp = wp + wp_pad
    feat = w2t.shape[1]
    ho = hs // 2 if pool else hs
    # band size: largest divisor of ho within the VMEM budget that the
    # TPU block layout accepts (multiple of 8 sublanes, or the full dim)
    band = ho
    for cand in range(min(ho, 32), 0, -1):
        if ho % cand == 0 and cand % 8 == 0:
            band = cand
            break
    rows_in = (2 * band + na) if pool else (band + na - 1)
    kernel, wl, wo = _stem_kernel(
        cs2d=cs2d, na=na, nb=nb, feat=feat, hs=hs, ws=ws, band=band,
        pool=pool, act=act, out_dtype=out_dtype,
        compute_dtype=planes.dtype,
    )
    grid = (n, ho // band)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, feat), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, band, wo, feat),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, 16, wp), planes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(planes, w2t, gain, bias)


@functools.lru_cache(maxsize=64)
def _stem_compile_ok(
    planes_shape: Tuple[int, ...],
    cdtype_str: str,
    feat: int,
    hs: int,
    ws: int,
    na: int,
    nb: int,
    pool: bool,
    act: Optional[str],
    odtype_str: str,
) -> bool:
    """Compile-probe the Pallas stem for one exact serving config on the
    real TPU backend (AOT lower+compile, no execution, cached).  A
    Mosaic lowering regression (op support, layout, VMEM) must degrade
    serving to the XLA chain — never crash the pipeline build.

    Scope caveat: under the multistream vmap the probe sees the
    PER-EXAMPLE planes shape; the custom_vmap rule then folds the
    stream axis into grid dim 0 (same per-step program, more grid
    iterations), so a failure that only reproduces at the larger grid
    would not be caught here."""
    try:
        cdtype = jnp.dtype(cdtype_str)
        odtype = jnp.dtype(odtype_str)
        fn = _make_stem_fn(hs, ws, na, nb, pool, act, odtype, False)
        fn.lower(
            jax.ShapeDtypeStruct(planes_shape, cdtype),
            jax.ShapeDtypeStruct((nb, feat, na * 16), cdtype),
            jax.ShapeDtypeStruct((1, feat), jnp.float32),
            jax.ShapeDtypeStruct((1, feat), jnp.float32),
        ).compile()
        return True
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(
            "Pallas fused stem failed to compile for "
            f"planes{planes_shape} k_taps=({na},{nb}) pool={pool}; "
            f"serving the XLA stem chain instead: {e}"
        )
        return False


def _xla_stem_chain(
    planes_data, kernel_hwio, gain, bias, *, logical_hw, pool, act,
    out_dtype, margins,
):
    """The identical stem chain in plain XLA ops, consumed when the
    Pallas kernel is unavailable (non-compiling config or
    ``ADAS_DISABLE_PALLAS_STEM=1``): slice the zero halo off the planes,
    transpose to the polyphase NHWC-cell layout, and run
    ``polyphase_stride2_conv`` + folded affine + act (+ maxpool) — the
    exact chain the kernel is parity-tested against
    (tests/test_pallas_stem.py)."""
    from ..models.layers import max_pool, polyphase_stride2_conv
    from ..ops.preprocess import S2DInput

    h, w = logical_hw
    hs, ws = h // 2, w // 2
    (mt, _mb), (ml, _mr) = margins
    core = planes_data[:, mt : mt + hs, :, ml : ml + ws]
    xs = core.transpose(0, 1, 3, 2)  # (n, hs, ws, 4c)
    n = xs.shape[0]
    x = S2DInput(xs, (n, h, w, kernel_hwio.shape[2]))
    y = polyphase_stride2_conv(x, kernel_hwio)
    y = y.astype(jnp.float32) * gain.reshape(-1) + bias.reshape(-1)
    y = _act_fn(act)(y)
    y = y.astype(out_dtype)
    if pool:
        y = max_pool(y, 3, 2, pad=1)
    return y


def fused_stem(
    planes_data: jnp.ndarray,
    kernel_hwio: jnp.ndarray,
    gain: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    logical_hw: Tuple[int, int],
    pool: bool,
    act: Optional[str],
    out_dtype=jnp.bfloat16,
    expect_margins=None,
) -> jnp.ndarray:
    """Run the fused stem on S2DPlanes data.

    ``planes_data``: (B, 4C, Hs+mh, Ws+mw) with the margins of
    :func:`stem_margins` for ``kernel_hwio``'s size and ``pool``.
    ``gain``/``bias``: folded per-channel affine (BNFoldParams; identity
    for a bias-only conv).  Returns NHWC (B, Ho, Wo, F) natively: the
    kernel's dots run in (pixels, feat) orientation, so each output row
    lands in the consumer's layout with no transpose in or after the
    kernel (the earlier (B, Ho, F, Wo) orientation left ~1 ms of XLA
    relayout/convert passes on the output side — profiled round 3).
    """
    kh, kw, cin, feat = kernel_hwio.shape
    h, w = logical_hw
    hs, ws = h // 2, w // 2
    na, nb, pad_a, pad_b = polyphase_tap_params(kh, kw)
    (mt, mb), (ml, mr) = stem_margins(kh, kw, pool)
    if expect_margins is not None and tuple(
        tuple(m) for m in expect_margins
    ) != ((mt, mb), (ml, mr)):
        # a margin SPLIT that disagrees with stem_margins can pass the
        # total-shape check below but shifts every conv window — always
        # a build bug, never silently servable
        raise ValueError(
            f"S2DPlanes margins {expect_margins} != "
            f"{((mt, mb), (ml, mr))} required for k={kh}x{kw} pool={pool}"
        )
    exp = (planes_data.shape[0], hs + mt + mb, 4 * cin, ws + ml + mr)
    if tuple(planes_data.shape) != exp:
        raise ValueError(
            f"S2DPlanes shape {tuple(planes_data.shape)} != {exp} expected "
            f"for k={kh}x{kw} pool={pool}"
        )
    compute_dtype = planes_data.dtype
    gain = jnp.asarray(gain, jnp.float32).reshape(1, feat)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, feat)
    interpret = jax.default_backend() != "tpu"
    use_kernel = os.environ.get("ADAS_DISABLE_PALLAS_STEM") != "1"
    if pool and (act != "relu" or hs % 2 or ws % 2):
        # the kernel realizes the maxpool's -inf padding as zeros (only
        # exact post-ReLU) and computes ho = hs//2 (nn.max_pool emits
        # ceil(hs/2) rows for odd hs) — both cases serve the exact XLA
        # chain instead
        use_kernel = False
    if use_kernel and not interpret:
        use_kernel = _stem_compile_ok(
            tuple(planes_data.shape), jnp.dtype(compute_dtype).name,
            feat, hs, ws, na, nb, pool, act,
            jnp.dtype(out_dtype).name,
        )
        if not use_kernel:
            STEM_STATS["probe_failed"] += 1
    if not use_kernel:
        STEM_STATS["xla_fallback"] += 1
        return _xla_stem_chain(
            planes_data, kernel_hwio, gain, bias,
            logical_hw=logical_hw, pool=pool, act=act,
            out_dtype=out_dtype, margins=((mt, mb), (ml, mr)),
        )
    STEM_STATS["pallas_served"] += 1
    w2t = polyphase_w2t(kernel_hwio).astype(compute_dtype)
    return _fused_stem_call(
        planes_data, w2t, gain, bias, hs, ws, na, nb, pool, act,
        out_dtype, interpret,
    )
