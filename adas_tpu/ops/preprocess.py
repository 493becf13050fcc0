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
