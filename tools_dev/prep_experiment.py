"""Dev probe: preprocess→stem formulations, measured on the real chip.

The round-3 trace (BASELINE.md MFU section) shows ~3.7 ms/step of
data formatting: the two stems' space-to-depth transposes+reshapes
(~2.1 ms), full-frame f32→bf16 converts (~1.0 ms), and — in the planar
variant — an un-fused letterbox pad (0.74 ms).  Hypothesis: emitting
the stem's s2d layout DIRECTLY from the width-resize dot (phase-split
interp matrices, pad as zero rows + mask bias, normalize on the small
source-side tensor, bf16 out) lets XLA absorb the relayout into the
dot's output fusion the way it already absorbs `wt,...htc->...hwc`.

    timeout 3600 python tools_dev/prep_experiment.py
"""
import time

import numpy as np

from adas_tpu.engine.xla_engine import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from adas_tpu.models.layers import polyphase_stride2_conv
from adas_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    PAD_VALUE,
    LetterboxGeometry,
    S2DInput,
    _interp_matrix,
    i420_to_bgr,
    i420_to_bgr_planar,
    ufld_v2_preprocess,
    ufld_v2_preprocess_planar,
    yolo_preprocess,
    yolo_preprocess_planar,
)

N = 8
SRC = (324, 576)
ITERS = 20


def phase_matrices(src: int, new: int, pad_before: int, total: int):
    """(2, total//2, src) phase-split interp matrix with letterbox pad
    folded in as zero rows, plus the (2, total//2) pad mask."""
    m = np.zeros((total, src), dtype=np.float32)
    m[pad_before : pad_before + new] = _interp_matrix(src, new)
    mask = np.ones((total,), dtype=np.float32)
    mask[pad_before : pad_before + new] = 0.0
    m2 = np.stack([m[0::2], m[1::2]])
    mask2 = np.stack([mask[0::2], mask[1::2]])
    return jnp.asarray(m2), jnp.asarray(mask2)


def crop_matrix(src: int, new: int, crop_top: int):
    """(2, (new-crop_top)//2, src) phase-split interp matrix with the
    UFLD bottom-crop folded in (rows crop_top..new-1 only)."""
    m = _interp_matrix(src, new)[crop_top:]
    return jnp.asarray(np.stack([m[0::2], m[1::2]]))


def yolo_prep_fused(yuv, geom, prec):
    """i420 → YOLO stem s2d input, everything in two phase-split dots."""
    bgr = i420_to_bgr_planar(yuv, *SRC)  # (3, H, W) f32
    rgb = bgr[::-1] * (1.0 / 255.0)
    newh, neww = geom.new_shape
    padh, padw = geom.pad
    ah, mh = phase_matrices(SRC[0], newh, padh, geom.dst_h)
    aw, mw = phase_matrices(SRC[1], neww, padw, geom.dst_w)
    tmp = jnp.einsum("ris,csu->criu", ah, rgb,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.einsum("tju,criu->ijrtc", aw, tmp,
                     preferred_element_type=jnp.float32, precision=prec)
    pv = PAD_VALUE / 255.0
    pad_mask = (
        mh.transpose(1, 0)[:, None, :, None, None]
        + mw.transpose(1, 0)[None, :, None, :, None]
        - mh.transpose(1, 0)[:, None, :, None, None]
        * mw.transpose(1, 0)[None, :, None, :, None]
    )
    out = out + pv * pad_mask
    i, j = geom.dst_h // 2, geom.dst_w // 2
    data = out.astype(jnp.bfloat16).reshape(i, j, 12)
    return S2DInput(data[None], (1, geom.dst_h, geom.dst_w, 3))


def ufld_prep_fused(yuv, input_h, input_w, crop_ratio, prec):
    bgr = i420_to_bgr_planar(yuv, *SRC)
    rgb = bgr[::-1]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None] * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None] * 255.0
    rgb = (rgb - mean) / std
    resize_h = int(input_h / crop_ratio)
    ah = crop_matrix(SRC[0], resize_h, resize_h - input_h)
    aw = crop_matrix(SRC[1], input_w, 0)
    tmp = jnp.einsum("ris,csu->criu", ah, rgb,
                     preferred_element_type=jnp.float32, precision=prec)
    out = jnp.einsum("tju,criu->ijrtc", aw, tmp,
                     preferred_element_type=jnp.float32, precision=prec)
    data = out.astype(jnp.bfloat16).reshape(input_h // 2, input_w // 2, 12)
    return S2DInput(data[None], (1, input_h, input_w, 3))


def main():
    rng = np.random.default_rng(0)
    import cv2

    frames = rng.integers(0, 255, (N, *SRC, 3), dtype=np.uint8)
    yuv = jnp.asarray(
        np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in frames])
    )
    geom = LetterboxGeometry(*SRC, 640, 640)
    ky = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.1, jnp.bfloat16)
    kl = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.bfloat16)
    HI = jax.lax.Precision.HIGHEST
    HIGH = jax.lax.Precision.HIGH

    def v_current(yuv1):
        bgr = i420_to_bgr(yuv1, *SRC)
        x = yolo_preprocess(bgr[None], geom, dtype=jnp.bfloat16)
        y = polyphase_stride2_conv(x, ky)
        lx = ufld_v2_preprocess(bgr[None], 320, 1600, 0.6, dtype=jnp.bfloat16)
        ly = polyphase_stride2_conv(lx, kl)
        return y, ly

    def v_planar(yuv1):
        bgr = i420_to_bgr_planar(yuv1, *SRC)
        x = yolo_preprocess_planar(bgr[None], geom, dtype=jnp.bfloat16, s2d=True)
        y = polyphase_stride2_conv(x, ky)
        lx = ufld_v2_preprocess_planar(
            bgr[None], 320, 1600, 0.6, dtype=jnp.bfloat16, s2d=True
        )
        ly = polyphase_stride2_conv(lx, kl)
        return y, ly

    def make_fused(prec):
        def v_fused(yuv1):
            x = yolo_prep_fused(yuv1, geom, prec)
            y = polyphase_stride2_conv(x, ky)
            lx = ufld_prep_fused(yuv1, 320, 1600, 0.6, prec)
            ly = polyphase_stride2_conv(lx, kl)
            return y, ly
        return v_fused

    variants = {
        "current(nhwc)": v_current,
        "planar+s2d": v_planar,
        "fused-dot HIGHEST": make_fused(HI),
        "fused-dot HIGH": make_fused(HIGH),
    }

    ref = None
    for name, fn in variants.items():
        vm = jax.vmap(fn)

        def probe(y):
            def body(c, s):
                a, b = vm(y + (c % 2).astype(y.dtype))
                return c + 1, (
                    s
                    + jnp.sum(a.astype(jnp.float32))
                    + jnp.sum(b.astype(jnp.float32))
                )
            return jax.lax.fori_loop(
                0, ITERS, lambda i, cs: body(cs[0], cs[1]), (jnp.uint8(0), jnp.float32(0))
            )[1]

        pj = jax.jit(probe)
        float(pj(yuv))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(pj(yuv))
            best = min(best, time.perf_counter() - t0)
        outs = jax.vmap(fn)(yuv)
        if ref is None:
            ref = outs
            err = (0.0, 0.0)
        else:
            err = tuple(
                float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32))))
                for o, r in zip(outs, ref)
            )
        print(
            f"{name:>20}: {best / ITERS * 1000:7.3f} ms/iter "
            f"(8 frames, both stems)  maxerr vs current: yolo {err[0]:.4f} lane {err[1]:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
