"""Image preprocessing: letterbox geometry + on-device resize/normalize.

Design (TPU-first, SURVEY.md §7): the reference letterboxes with cv2 on host
then uploads (ObjectDetector/utils.py:42-63, yoloDetector.py:96-102).  Here
the raw uint8 frame is uploaded once and everything else happens on device
inside the jitted step:

* Bilinear resize is expressed as two small matmuls with precomputed
  interpolation matrices (``A_h @ img @ A_w^T``) — each row of A has at most
  two non-zeros, so this is exact bilinear with half-pixel centers (the
  cv2.INTER_LINEAR convention), and it runs on the MXU instead of a gather.
* Padding + normalization fuse into the surrounding XLA graph.

All shapes are static: the source frame size and model input size are fixed
per stream, so geometry is computed in Python at trace time.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
PAD_VALUE = 114.0


@dataclass(frozen=True)
class LetterboxGeometry:
    """Static letterbox geometry for a (source, target) shape pair.

    Matches the reference ``Scaler`` arithmetic exactly, including the ``+1``
    on the scaled height when the image is wider than tall
    (ObjectDetector/utils.py:45-52).
    """

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int
    keep_ratio: bool = True

    @property
    def new_shape(self) -> Tuple[int, int]:
        if not self.keep_ratio or self.src_h == self.src_w:
            return self.dst_h, self.dst_w
        hw_scale = self.src_h / self.src_w
        if hw_scale > 1:
            return self.dst_h, int(self.dst_w / hw_scale)
        return int(self.dst_h * hw_scale) + 1, self.dst_w

    @property
    def pad(self) -> Tuple[int, int]:
        newh, neww = self.new_shape
        return int((self.dst_h - newh) * 0.5), int((self.dst_w - neww) * 0.5)

    @property
    def scale_ratio(self) -> Tuple[float, float]:
        newh, neww = self.new_shape
        return self.src_h / newh, self.src_w / neww

    def boxes_to_original(self, boxes: np.ndarray) -> np.ndarray:
        """Map xyxy boxes from letterboxed coords back to the source image."""
        boxes = np.asarray(boxes, dtype=np.float64).copy()
        if boxes.size == 0:
            return boxes
        ratioh, ratiow = self.scale_ratio
        padh, padw = self.pad
        boxes[..., [0, 2]] = (boxes[..., [0, 2]] - padw) * ratiow
        boxes[..., [1, 3]] = (boxes[..., [1, 3]] - padh) * ratioh
        return boxes

    def points_to_original(self, pts: np.ndarray) -> np.ndarray:
        """Map (x, y) points from letterboxed coords back to the source."""
        pts = np.asarray(pts, dtype=np.float64).copy()
        if pts.size == 0:
            return pts
        ratioh, ratiow = self.scale_ratio
        padh, padw = self.pad
        pts[..., 0] = (pts[..., 0] - padw) * ratiow
        pts[..., 1] = (pts[..., 1] - padh) * ratioh
        return pts

    def boxes_to_original_jnp(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """Same as ``boxes_to_original`` but traceable (device-side)."""
        ratioh, ratiow = self.scale_ratio
        padh, padw = self.pad
        shift = jnp.array([padw, padh, padw, padh], jnp.float32)
        scale = jnp.array([ratiow, ratioh, ratiow, ratioh], jnp.float32)
        return (boxes - shift) * scale


@functools.lru_cache(maxsize=64)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation matrix, half-pixel centers.

    Row d holds the two weights for source samples around
    ``(d + 0.5) * src/dst - 0.5`` with edge clamping — the cv2.INTER_LINEAR
    sampling convention.
    """
    m = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for d in range(dst):
        x = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        lo = min(max(x0, 0), src - 1)
        hi = min(max(x0 + 1, 0), src - 1)
        m[d, lo] += 1.0 - frac
        m[d, hi] += frac
    return m


def resize_bilinear(img: jnp.ndarray, dst_h: int, dst_w: int) -> jnp.ndarray:
    """Exact bilinear resize of an (H, W, C) or (B, H, W, C) float image via
    two MXU matmuls."""
    import jax

    src_h, src_w = img.shape[-3], img.shape[-2]
    ah = jnp.asarray(_interp_matrix(src_h, dst_h))
    aw = jnp.asarray(_interp_matrix(src_w, dst_w))
    # HIGHEST precision: the interp matmuls are tiny but parity-critical;
    # default TPU bf16 multiplies cost ~0.3% pixel error.
    out = jnp.einsum(
        "hs,...swc->...hwc", ah, img,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "wt,...htc->...hwc", aw, out,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


def letterbox(
    frame: jnp.ndarray,
    geom: LetterboxGeometry,
    pad_value: float = PAD_VALUE,
) -> jnp.ndarray:
    """Device letterbox: resize keeping aspect, center-pad to target.

    Input (..., src_h, src_w, 3) uint8/float; output float32
    (..., dst_h, dst_w, 3) in [0, 255].
    """
    newh, neww = geom.new_shape
    padh, padw = geom.pad
    img = resize_bilinear(frame.astype(jnp.float32), newh, neww)
    pads = [(0, 0)] * (img.ndim - 3) + [
        (padh, geom.dst_h - newh - padh),
        (padw, geom.dst_w - neww - padw),
        (0, 0),
    ]
    return jnp.pad(img, pads, constant_values=pad_value)


def yolo_preprocess(
    frame_bgr: jnp.ndarray,
    geom: LetterboxGeometry,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """BGR uint8 frame -> letterboxed RGB tensor scaled to [0, 1], NHWC.

    Mirrors reference yoloDetector.py:96-102 (letterbox, 1/255, swapRB)
    but stays on device and keeps NHWC layout for TPU convs.
    """
    canvas = letterbox(frame_bgr, geom)
    rgb = canvas[..., ::-1]
    return (rgb * (1.0 / 255.0)).astype(dtype)


def imagenet_preprocess(
    frame_bgr: jnp.ndarray,
    geom: Optional[LetterboxGeometry] = None,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
    dtype=jnp.float32,
    swap_rb: bool = True,
) -> jnp.ndarray:
    """BGR frame -> (letterboxed) RGB, ImageNet-normalized, NHWC.

    ``swap_rb=False`` keeps BGR channel order for models trained that way
    (zylo117 EfficientDet: the reference normalizes BGR with BGR-ordered
    means, efficientdetDetector.py:58) — pass the matching BGR-ordered
    ``mean``/``std`` then.
    """
    img = letterbox(frame_bgr, geom) if geom is not None else frame_bgr
    img = img.astype(jnp.float32)
    if swap_rb:
        img = img[..., ::-1]
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return ((img - mean) / std).astype(dtype)


def ufld_v2_preprocess(
    frame_bgr: jnp.ndarray,
    input_h: int,
    input_w: int,
    crop_ratio: float,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """UFLDv2 input prep: resize to (input_w, input_h/crop_ratio), keep the
    bottom ``input_h`` rows, ImageNet-normalize (reference
    ultrafastLaneDetectorV2.py:96-112), NHWC on device."""
    resize_h = int(input_h / crop_ratio)
    img = resize_bilinear(frame_bgr.astype(jnp.float32), resize_h, input_w)
    img = img[..., resize_h - input_h :, :, :]
    rgb = img[..., ::-1]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return ((rgb - mean) / std).astype(dtype)


def ufld_v1_preprocess(
    frame_bgr: jnp.ndarray, input_h: int, input_w: int, dtype=jnp.float32
) -> jnp.ndarray:
    """UFLD v1 input prep: plain resize + ImageNet normalize (reference
    ultrafastLaneDetector.py:79-95), NHWC on device."""
    img = resize_bilinear(frame_bgr.astype(jnp.float32), input_h, input_w)
    rgb = img[..., ::-1]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return ((rgb - mean) / std).astype(dtype)


def i420_to_bgr(yuv: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Device-side I420 (YUV 4:2:0 planar, cv2 layout) → BGR float32.

    Transport optimization for tunneled/remote TPUs: an I420 buffer is
    1.5 bytes/px vs 3 for BGR, halving host→device upload bytes.  Inverse
    of ``cv2.COLOR_BGR2YUV_I420`` (studio-swing BT.601; matches cv2's own
    decode to ±1).  ``yuv`` is the (H*3/2, W) uint8 plane stack.
    """
    h, w = height, width
    y = yuv[:h].astype(jnp.float32)
    u = yuv[h : h + h // 4].reshape(h // 2, w // 2).astype(jnp.float32)
    v = yuv[h + h // 4 :].reshape(h // 2, w // 2).astype(jnp.float32)

    def up2(p):
        # measured on v5e (8 frames, chained): repeat 1.57 ms vs
        # broadcast-reshape 3.22 — XLA lowers this repeat better than
        # the broadcast/reshape form, so keep it.  The op's floor is the
        # channel-minor (H, W, 3) f32 output layout (minor dim 3 defeats
        # 128-lane vectorization), not the upsample.
        return jnp.repeat(jnp.repeat(p, 2, axis=0), 2, axis=1)

    uu = up2(u) - 128.0
    vv = up2(v) - 128.0
    yy = 1.164 * (y - 16.0)
    r = yy + 1.596 * vv
    g = yy - 0.391 * uu - 0.813 * vv
    b = yy + 2.018 * uu
    return jnp.clip(
        jnp.round(jnp.stack([b, g, r], axis=-1)), 0.0, 255.0
    )


def bgr_to_i420(frame: "np.ndarray") -> "np.ndarray":
    """Host-side encode (cv2); counterpart of :func:`i420_to_bgr`."""
    import cv2

    return cv2.cvtColor(frame, cv2.COLOR_BGR2YUV_I420)


# ---- planar (channel-major) preprocessing path ----------------------------
#
# The channel-minor (H, W, 3) layout above puts 3 in the 128-lane minor
# dimension, wasting ~97% of every VPU lane and forcing XLA to relayout
# around the resize matmuls.  The I420 transport buffer is ALREADY planar,
# so the serving path keeps planes (3, H, W) — W in lanes — through color
# conversion, resize, and normalization.
#
# With ``s2d=True`` the resize itself EMITS the stem's 2x2 space-to-depth
# (polyphase) layout: the interp matrices are split into even/odd-row
# phases (letterbox pad folded in as zero rows + a mask bias, the UFLD
# bottom-crop as dropped rows), normalization runs on the small
# source-side tensor (linear, so it commutes with the resize), and the
# final width einsum writes (..., H/2, W/2, r, t, c) directly — XLA
# absorbs the relayout into the dot's output fusion, so the stem's
# space-to-depth transpose, the full-frame dtype convert, and the
# letterbox pad never materialize as their own HBM passes.  Measured on
# v5e (8 frames, both flagship stems, chained): 7.76 ms NHWC path,
# 8.07 ms naive planar+transpose, 4.23 ms this formulation.
#
# Divergence from the reference (and from the NHWC path): the s2d resize
# matmuls run at ``Precision.HIGH`` (3-pass bf16) instead of HIGHEST —
# measured error vs the HIGHEST NHWC path is ≤2 bf16 ulps of the stem
# input, i.e. below the compute dtype's own rounding, for 2x resize
# throughput.  CPU (tests) ignores precision flags entirely.


def i420_to_bgr_planar(yuv: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """I420 plane stack → planar BGR float32 (3, H, W).

    Same BT.601 math as :func:`i420_to_bgr` but emits channel-major
    planes (W stays the minor/lane dimension end to end)."""
    h, w = height, width
    y = yuv[:h].astype(jnp.float32)
    u = yuv[h : h + h // 4].reshape(h // 2, w // 2).astype(jnp.float32)
    v = yuv[h + h // 4 :].reshape(h // 2, w // 2).astype(jnp.float32)

    def up2(p):
        return jnp.repeat(jnp.repeat(p, 2, axis=0), 2, axis=1)

    uu = up2(u) - 128.0
    vv = up2(v) - 128.0
    yy = 1.164 * (y - 16.0)
    r = yy + 1.596 * vv
    g = yy - 0.391 * uu - 0.813 * vv
    b = yy + 2.018 * uu
    return jnp.clip(
        jnp.round(jnp.stack([b, g, r], axis=0)), 0.0, 255.0
    )


def resize_bilinear_planar(
    img: jnp.ndarray, dst_h: int, dst_w: int
) -> jnp.ndarray:
    """Bilinear resize of planar (..., C, H, W) via the same two interp
    matmuls as :func:`resize_bilinear`, lanes = W throughout."""
    import jax

    src_h, src_w = img.shape[-2], img.shape[-1]
    ah = jnp.asarray(_interp_matrix(src_h, dst_h))
    aw = jnp.asarray(_interp_matrix(src_w, dst_w))
    out = jnp.einsum(
        "hs,...csw->...chw", ah, img,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "wt,...cht->...chw", aw, out,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


def _planar_to_nhwc(img: jnp.ndarray) -> jnp.ndarray:
    """(..., C, H, W) → (..., H, W, C)."""
    return jnp.moveaxis(img, -3, -1)


class S2DInput:
    """A stem input already in 2x2 space-to-depth (polyphase) layout.

    ``data`` holds (..., H/2, W/2, 4C) with channel order (r, t, c) —
    exactly the ``xs`` that ``models.layers.polyphase_stride2_conv``
    would build from the logical (..., H, W, C) NHWC tensor, whose
    shape ``.shape`` still reports so ConvBN's polyphase-eligibility
    checks and kernel parameter shapes are computed unchanged.  Built
    by the planar preprocessing path (``s2d=True``) so the stem's
    space-to-depth transpose never materializes as its own HBM pass
    (measured 0.6-0.8 ms per 8-frame step per stem on v5e).  Only a
    polyphase-capable stem may consume it; any other op raises."""

    __slots__ = ("data", "_shape")

    def __init__(self, data: jnp.ndarray, logical_shape):
        self.data = data
        self._shape = tuple(logical_shape)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndim(self) -> int:
        return len(self._shape)


class S2DPlanes:
    """Planar pre-space-to-depth stem input for the Pallas fused stem.

    ``data`` holds (..., Hs+mh, 4C, Ws+mw): per-row channel-major
    polyphase planes (channel order (r, t, c) — matching S2DInput's
    layout and ``ops.pallas_stem.polyphase_w2t``) with zero halo margins
    ``margins = ((top, bottom), (left, right))`` in s2d-cell coordinates
    (``ops.pallas_stem.stem_margins``) folded into the resize matrices,
    so neither the conv's zero padding nor the pool's edge column ever
    costs a separate pad pass.  W stays the minor (128-lane) dimension —
    the layout the phase-split resize dot naturally emits, so no
    relayout copy either.  ``.shape`` reports the logical NHWC shape.
    Only a Pallas-fused-stem-capable stem may consume it."""

    __slots__ = ("data", "_shape", "margins")

    def __init__(self, data: jnp.ndarray, logical_shape, margins):
        self.data = data
        self._shape = tuple(logical_shape)
        self.margins = tuple(tuple(m) for m in margins)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndim(self) -> int:
        return len(self._shape)


@functools.lru_cache(maxsize=64)
def _phase_matrices(src: int, new: int, pad_before: int, total: int):
    """Phase-split interp matrix with the letterbox pad folded in.

    Returns ``(m2, mask2)``: ``m2`` (2, total//2, src) — rows
    ``2i + r`` of the (total, src) matrix whose rows outside
    ``[pad_before, pad_before+new)`` are zero; ``mask2`` (2, total//2)
    — 1.0 exactly on those zeroed (pad) rows, or None when there is no
    pad.  ``total`` must be even."""
    assert total % 2 == 0, total
    m = np.zeros((total, src), dtype=np.float32)
    m[pad_before : pad_before + new] = _interp_matrix(src, new)
    m2 = np.stack([m[0::2], m[1::2]])
    if new == total:
        return m2, None
    mask = np.ones((total,), dtype=np.float32)
    mask[pad_before : pad_before + new] = 0.0
    return m2, np.stack([mask[0::2], mask[1::2]])


@functools.lru_cache(maxsize=64)
def _phase_crop_matrix(src: int, new: int, crop_top: int) -> np.ndarray:
    """(2, (new-crop_top)//2, src) phase-split interp matrix keeping
    only rows ``crop_top..new-1`` (the UFLD bottom-crop, folded into
    the resize so the cropped rows are never computed)."""
    m = _interp_matrix(src, new)[crop_top:]
    assert m.shape[0] % 2 == 0, m.shape
    return np.stack([m[0::2], m[1::2]])


_HIGH = None


def _resize_precision():
    """Serving-path (s2d) resize precision — see the divergence note in
    the section comment above."""
    global _HIGH
    if _HIGH is None:
        import jax

        _HIGH = jax.lax.Precision.HIGH
    return _HIGH


def _phase_resize_to_s2d(
    chw: jnp.ndarray,
    ah: np.ndarray,
    aw: np.ndarray,
    pad_bias: Optional[jnp.ndarray],
    dtype,
) -> S2DInput:
    """Planar (..., C, Hs, Ws) → S2DInput via two phase-split einsums;
    the final dot emits (..., i, j, r, t, c) directly (relayout absorbed
    into its output fusion)."""
    prec = _resize_precision()
    ahj, awj = jnp.asarray(ah), jnp.asarray(aw)
    tmp = jnp.einsum(
        "ris,...csu->...criu", ahj, chw,
        preferred_element_type=jnp.float32, precision=prec,
    )
    out = jnp.einsum(
        "tju,...criu->...ijrtc", awj, tmp,
        preferred_element_type=jnp.float32, precision=prec,
    )
    if pad_bias is not None:
        out = out + pad_bias
    lead = list(chw.shape[:-3])
    i, j = ah.shape[1], aw.shape[1]
    data = out.astype(dtype).reshape(*lead, i, j, 4 * chw.shape[-3])
    return S2DInput(data, (*lead, 2 * i, 2 * j, chw.shape[-3]))


def _pad_bias(
    mh: Optional[np.ndarray], mw: Optional[np.ndarray], value: float
) -> Optional[jnp.ndarray]:
    """Broadcastable (i, j, r, t, 1) additive mask worth ``value`` on
    letterbox-pad rows/cols (union of the two phase masks)."""
    if mh is None and mw is None:
        return None
    one_h = mh.T[:, None, :, None, None] if mh is not None else 0.0
    one_w = mw.T[None, :, None, :, None] if mw is not None else 0.0
    mask = one_h + one_w - one_h * one_w
    return jnp.asarray(value * mask, jnp.float32)


def yolo_preprocess_planar(
    bgr_chw: jnp.ndarray,
    geom: LetterboxGeometry,
    dtype=jnp.float32,
    s2d: bool = False,
) -> jnp.ndarray:
    """Planar-BGR counterpart of :func:`yolo_preprocess`: letterbox +
    1/255 + swapRB in channel-major layout.  ``s2d=True`` (even target
    dims only) emits the stem's space-to-depth layout straight from the
    phase-split resize dots — see the section comment."""
    newh, neww = geom.new_shape
    padh, padw = geom.pad
    if s2d:
        rgb = bgr_chw[..., ::-1, :, :].astype(jnp.float32) * (1.0 / 255.0)
        ah, mh = _phase_matrices(bgr_chw.shape[-2], newh, padh, geom.dst_h)
        aw, mw = _phase_matrices(bgr_chw.shape[-1], neww, padw, geom.dst_w)
        return _phase_resize_to_s2d(
            rgb, ah, aw, _pad_bias(mh, mw, PAD_VALUE / 255.0), dtype
        )
    img = resize_bilinear_planar(bgr_chw.astype(jnp.float32), newh, neww)
    img = img[..., ::-1, :, :]  # BGR planes -> RGB planes
    img = (img * (1.0 / 255.0)).astype(dtype)
    pads = [(0, 0)] * (img.ndim - 2) + [
        (padh, geom.dst_h - newh - padh),
        (padw, geom.dst_w - neww - padw),
    ]
    img = jnp.pad(
        img, pads, constant_values=jnp.asarray(PAD_VALUE / 255.0, dtype)
    )
    return _planar_to_nhwc(img)


def imagenet_preprocess_planar(
    bgr_chw: jnp.ndarray,
    geom: LetterboxGeometry,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
    dtype=jnp.float32,
    swap_rb: bool = True,
) -> jnp.ndarray:
    """Planar-BGR counterpart of :func:`imagenet_preprocess`: letterbox
    + ImageNet normalize in channel-major layout (W stays in the 128-lane
    minor dim through the resize dots), NHWC transpose once at the end on
    the model-input-sized tensor.  Serves EfficientDet in the batched
    multi-stream pipeline's I420 transport (reference preprocess:
    ObjectDetector/efficientdetDetector.py:57-65)."""
    newh, neww = geom.new_shape
    padh, padw = geom.pad
    img = resize_bilinear_planar(bgr_chw.astype(jnp.float32), newh, neww)
    pads = [(0, 0)] * (img.ndim - 2) + [
        (padh, geom.dst_h - newh - padh),
        (padw, geom.dst_w - neww - padw),
    ]
    img = jnp.pad(img, pads, constant_values=PAD_VALUE)
    if swap_rb:
        img = img[..., ::-1, :, :]
    mean_a = jnp.asarray(mean, jnp.float32)[:, None, None] * 255.0
    std_a = jnp.asarray(std, jnp.float32)[:, None, None] * 255.0
    out = ((img - mean_a) / std_a).astype(dtype)
    return _planar_to_nhwc(out)


def ufld_v2_preprocess_planar(
    bgr_chw: jnp.ndarray,
    input_h: int,
    input_w: int,
    crop_ratio: float,
    dtype=jnp.float32,
    s2d: bool = False,
) -> jnp.ndarray:
    """Planar-BGR counterpart of :func:`ufld_v2_preprocess`.  With
    ``s2d=True`` the bottom-crop folds into the phase-split resize (the
    cropped-away rows are never computed) and the width dot emits the
    stem's space-to-depth layout directly."""
    resize_h = int(input_h / crop_ratio)
    if s2d:
        rgb = bgr_chw[..., ::-1, :, :].astype(jnp.float32)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None] * 255.0
        std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None] * 255.0
        rgb = (rgb - mean) / std
        ah = _phase_crop_matrix(
            bgr_chw.shape[-2], resize_h, resize_h - input_h
        )
        aw = _phase_crop_matrix(bgr_chw.shape[-1], input_w, 0)
        return _phase_resize_to_s2d(rgb, ah, aw, None, dtype)
    img = resize_bilinear_planar(
        bgr_chw.astype(jnp.float32), resize_h, input_w
    )
    img = img[..., resize_h - input_h :, :]
    rgb = img[..., ::-1, :, :]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None] * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None] * 255.0
    out = ((rgb - mean) / std).astype(dtype)
    return _planar_to_nhwc(out)


# ---- planar S2D "planes" emission (Pallas fused-stem input) ---------------


def _planes_pad_bias(mh, mw, value, margins, core_hw):
    """Letterbox pad bias broadcastable to the planes einsum output
    (..., i, r, t, c, j); margin cells stay 0 (conv zero padding).
    ``value`` is a scalar, or a per-channel (C,) vector (the YUV-direct
    path pads with ``target - mix_offset`` per RGB channel)."""
    if mh is None and mw is None:
        return None
    (mt, mb), (ml, mr) = margins
    ci, cj = core_hw
    if mh is not None:
        mh = np.pad(mh, ((0, 0), (mt, mb)))
    if mw is not None:
        mw = np.pad(mw, ((0, 0), (ml, mr)))
    one_h = mh.T[:, :, None, None, None] if mh is not None else 0.0
    one_w = mw[None, None, :, None, :] if mw is not None else 0.0
    mask = one_h + one_w - one_h * one_w
    # confine the bias to the core: margin cells are the CONV's zero
    # padding, not letterbox padding — they must stay exactly 0
    core_i = np.pad(np.ones((ci,), np.float32), (mt, mb))
    core_j = np.pad(np.ones((cj,), np.float32), (ml, mr))
    mask = mask * core_i[:, None, None, None, None]
    mask = mask * core_j[None, None, None, None, :]
    val = np.asarray(value, np.float32).reshape(1, 1, 1, -1, 1)
    return jnp.asarray(val * mask, jnp.float32)


def _phase_resize_to_planes(
    chw: jnp.ndarray,
    ah: np.ndarray,
    aw: np.ndarray,
    pad_bias,
    dtype,
    margins,
) -> S2DPlanes:
    """Planar (..., C, Hsrc, Wsrc) -> S2DPlanes: the phase-split einsums
    emit channel-major polyphase planes with W in the minor (lane) dim —
    the dot's natural output layout, so no relayout — and the zero halo
    margins are extra zero rows of the (numpy, cached) matrices."""
    (mt, mb), (ml, mr) = margins
    ah = np.pad(ah, ((0, 0), (mt, mb), (0, 0)))
    aw = np.pad(aw, ((0, 0), (ml, mr), (0, 0)))
    prec = _resize_precision()
    tmp = jnp.einsum(
        "ris,...csu->...criu", jnp.asarray(ah), chw,
        preferred_element_type=jnp.float32, precision=prec,
    )
    out = jnp.einsum(
        "tju,...criu->...irtcj", jnp.asarray(aw), tmp,
        preferred_element_type=jnp.float32, precision=prec,
    )
    if pad_bias is not None:
        out = out + pad_bias
    lead = list(chw.shape[:-3])
    i, j = ah.shape[1], aw.shape[1]
    c = chw.shape[-3]
    data = out.astype(dtype).reshape(*lead, i, 4 * c, j)
    hs, ws = i - mt - mb, j - ml - mr
    return S2DPlanes(data, (*lead, 2 * hs, 2 * ws, c), margins)


def yolo_preprocess_planes(
    bgr_chw: jnp.ndarray,
    geom: LetterboxGeometry,
    dtype=jnp.float32,
    margins=((1, 0), (1, 0)),
) -> S2DPlanes:
    """:func:`yolo_preprocess` emitting S2DPlanes for the Pallas fused
    stem (letterbox + 1/255 + swapRB; margins per
    ``pallas_stem.stem_margins`` of the consuming stem)."""
    newh, neww = geom.new_shape
    padh, padw = geom.pad
    rgb = bgr_chw[..., ::-1, :, :].astype(jnp.float32) * (1.0 / 255.0)
    ah, mh = _phase_matrices(bgr_chw.shape[-2], newh, padh, geom.dst_h)
    aw, mw = _phase_matrices(bgr_chw.shape[-1], neww, padw, geom.dst_w)
    bias = _planes_pad_bias(
        mh, mw, PAD_VALUE / 255.0, margins,
        (geom.dst_h // 2, geom.dst_w // 2),
    )
    return _phase_resize_to_planes(rgb, ah, aw, bias, dtype, margins)


def ufld_v2_preprocess_planes(
    bgr_chw: jnp.ndarray,
    input_h: int,
    input_w: int,
    crop_ratio: float,
    dtype=jnp.float32,
    margins=((3, 2), (3, 2)),
) -> S2DPlanes:
    """:func:`ufld_v2_preprocess` emitting S2DPlanes (bottom-crop folded
    into the phase matrices; normalization on the source-side tensor)."""
    resize_h = int(input_h / crop_ratio)
    rgb = bgr_chw[..., ::-1, :, :].astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None] * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None] * 255.0
    rgb = (rgb - mean) / std
    ah = _phase_crop_matrix(bgr_chw.shape[-2], resize_h, resize_h - input_h)
    aw = _phase_crop_matrix(bgr_chw.shape[-1], input_w, 0)
    return _phase_resize_to_planes(rgb, ah, aw, None, dtype, margins)


# ---- YUV-direct planes emission (skip the full-res color conversion) -------
#
# ``i420_to_bgr_planar`` materializes full-resolution f32 BGR planes (plus
# the nearest-2x chroma upsample) only for the resize dots to immediately
# re-read them — ~1.8 ms of an 8-frame step in the round-3 profile.  The
# whole chain is affine, so it folds into the dots instead: Y resizes at
# full resolution with the standard phase matrices, U/V resize at their
# native HALF resolution with the matrices composed with the nearest-2x
# upsample (exact: ah_uv[r,i,t] = ah[r,i,2t] + ah[r,i,2t+1]), and the
# BT.601 mix + model normalization run as one per-channel 3-tap combine at
# TARGET resolution.  Channel offsets (-16/-128 and the ImageNet mean,
# mapped through the mix inverse) are subtracted on the tiny SOURCE
# tensors: interp-matrix rows sum to 1 on image cells and 0 on letterbox
# pad rows and halo margins, so offsets appear exactly where they belong
# and margins stay exact zeros with no mask tensors at all.
#
# Divergence from the reference (and from ``i420_to_bgr_planar``): the
# full-res ``round``/``clip`` that mimicked cv2's uint8 decode is dropped
# (non-linear, cannot ride a matrix).  For in-gamut video the difference
# is bounded by the resize of +-0.5 rounding, i.e. <=0.5/255 of input
# scale — below the bf16 stem input's own quantization step.

#: BT.601 studio-swing YUV->RGB (rows R,G,B; cols Y,U,V) — the same
#: coefficients as :func:`i420_to_bgr`.
_BT601_RGB = np.array(
    [
        [1.164, 0.0, 1.596],
        [1.164, -0.391, -0.813],
        [1.164, 2.018, 0.0],
    ],
    np.float32,
)
_I420_OFF = np.array([16.0, 128.0, 128.0], np.float32)


def _split_i420(yuv: jnp.ndarray, h: int, w: int):
    """(H*3/2, W) uint8 I420 stack -> f32 Y (1, H, W) and UV (2, H/2,
    W/2) plane stacks (vmap-compatible: shapes are per-example)."""
    y = yuv[:h].astype(jnp.float32)[None]
    u = yuv[h : h + h // 4].reshape(h // 2, w // 2).astype(jnp.float32)
    v = yuv[h + h // 4 :].reshape(h // 2, w // 2).astype(jnp.float32)
    return y, jnp.stack([u, v])


def _halve_phase(m2: np.ndarray) -> np.ndarray:
    """Compose a phase-split interp matrix with the nearest-2x chroma
    upsample: sampling ``repeat(p, 2)`` with weights ``m2`` equals
    sampling ``p`` with adjacent weight pairs summed."""
    assert m2.shape[-1] % 2 == 0, m2.shape
    return (m2[..., 0::2] + m2[..., 1::2]).astype(np.float32)


def _phase_resize_planes_yuv(
    yuv: jnp.ndarray,
    src_h: int,
    src_w: int,
    src_off: np.ndarray,
    ah: np.ndarray,
    aw: np.ndarray,
    mmat: np.ndarray,
    pad_bias,
    dtype,
    margins,
) -> S2DPlanes:
    """Shared YUV-direct emission: two phase-dot chains (Y full-res,
    UV half-res) + the folded 3x3 mix at target resolution."""
    (mt, mb), (ml, mr) = margins
    ah = np.pad(ah, ((0, 0), (mt, mb), (0, 0)))
    aw = np.pad(aw, ((0, 0), (ml, mr), (0, 0)))
    prec = _resize_precision()
    y, uv = _split_i420(yuv, src_h, src_w)
    y = y - src_off[0]
    uv = uv - jnp.asarray(src_off[1:], jnp.float32)[:, None, None]

    def dots(p, ahx, awx):
        tmp = jnp.einsum(
            "ris,csu->criu", jnp.asarray(ahx), p,
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.einsum(
            "tju,criu->irtcj", jnp.asarray(awx), tmp,
            preferred_element_type=jnp.float32, precision=prec,
        )

    oy = dots(y, ah, aw)  # (i, r, t, 1, j)
    ouv = dots(uv, _halve_phase(ah), _halve_phase(aw))  # (i, r, t, 2, j)
    yy = oy[..., 0:1, :]
    uu, vv = ouv[..., 0:1, :], ouv[..., 1:2, :]
    out = jnp.concatenate(
        [
            float(mmat[d, 0]) * yy
            + float(mmat[d, 1]) * uu
            + float(mmat[d, 2]) * vv
            for d in range(3)
        ],
        axis=-2,
    )  # (i, r, t, 3, j), RGB
    if pad_bias is not None:
        out = out + pad_bias
    i, j = ah.shape[1], aw.shape[1]
    data = out.astype(dtype).reshape(i, 12, j)[None]
    hs, ws = i - mt - mb, j - ml - mr
    return S2DPlanes(data, (1, 2 * hs, 2 * ws, 3), margins)


def yolo_preprocess_planes_yuv(
    yuv: jnp.ndarray,
    src_h: int,
    src_w: int,
    geom: LetterboxGeometry,
    dtype=jnp.float32,
    margins=((1, 0), (1, 0)),
) -> S2DPlanes:
    """:func:`yolo_preprocess_planes` straight from the I420 transport
    buffer — color conversion folded into the resize dots (see section
    comment).  Takes one frame's (H*3/2, W) stack; batch via vmap."""
    newh, neww = geom.new_shape
    padh, padw = geom.pad
    ah, mh = _phase_matrices(src_h, newh, padh, geom.dst_h)
    aw, mw = _phase_matrices(src_w, neww, padw, geom.dst_w)
    bias = _planes_pad_bias(
        mh, mw, PAD_VALUE / 255.0, margins,
        (geom.dst_h // 2, geom.dst_w // 2),
    )
    return _phase_resize_planes_yuv(
        yuv, src_h, src_w, _I420_OFF, ah, aw, _BT601_RGB / 255.0,
        bias, dtype, margins,
    )


def ufld_v2_preprocess_planes_yuv(
    yuv: jnp.ndarray,
    src_h: int,
    src_w: int,
    input_h: int,
    input_w: int,
    crop_ratio: float,
    dtype=jnp.float32,
    margins=((3, 2), (3, 2)),
) -> S2DPlanes:
    """:func:`ufld_v2_preprocess_planes` straight from the I420 stack.
    The ImageNet mean rides the source-side offset through the mix
    inverse (``M·(off - base) = mean255``); std scales the mix rows."""
    resize_h = int(input_h / crop_ratio)
    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    std255 = np.asarray(IMAGENET_STD, np.float32) * 255.0
    off = _I420_OFF + np.linalg.solve(
        _BT601_RGB.astype(np.float64), mean255.astype(np.float64)
    ).astype(np.float32)
    ah = _phase_crop_matrix(src_h, resize_h, resize_h - input_h)
    aw = _phase_crop_matrix(src_w, input_w, 0)
    return _phase_resize_planes_yuv(
        yuv, src_h, src_w, off, ah, aw,
        _BT601_RGB / std255[:, None], None, dtype, margins,
    )
