"""Perspective (homography) warp as a jit-able device op.

TPU-native replacement for the reference's ``cv2.warpPerspective`` /
``cv2.getPerspectiveTransform`` calls (perspectiveTransformation.py:36-117).
The 3x3 homography is a *traced argument*, not a compile-time constant, so
the dynamic BEV recalibration (updateTransformParams) never recompiles —
only the output size is static.

The warp itself is a bilinear gather over the source image.  A gather is
the right tool here (the sampling grid is spatially varying, so the
matmul-resize trick from ops/preprocess.py does not apply); XLA lowers it
to efficient dynamic-slices in VMEM.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Solve the 3x3 homography mapping 4 src points to 4 dst points.

    Host-side 8x8 linear solve (tiny); same contract as
    ``cv2.getPerspectiveTransform``.
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    if src.shape != (4, 2) or dst.shape != (4, 2):
        raise ValueError("need exactly 4 source and 4 destination points")
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i, ((x, y), (u, v)) in enumerate(zip(src, dst)):
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_perspective(
    img: jnp.ndarray, matrix: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear homography warp: ``out[y, x] = img[M⁻¹·(x, y)]``.

    ``matrix`` maps source->destination (the cv2 convention); sampling
    inverts it on device.  Out-of-bounds samples are zero, matching
    cv2's default BORDER_CONSTANT.
    """
    out_h, out_w = out_hw
    m_inv = jnp.linalg.inv(matrix.astype(jnp.float32))

    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    dst_pts = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3)
    src_pts = dst_pts @ m_inv.T
    sx = src_pts[..., 0] / src_pts[..., 2]
    sy = src_pts[..., 1] / src_pts[..., 2]

    h, w = img.shape[:2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def sample(yi, xi):
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc].astype(jnp.float32)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(img.dtype)


def transform_points(points: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    """Apply a homography to (N, 2) points (host-side, tiny N)."""
    points = np.asarray(points, dtype=np.float64)
    if points.size == 0:
        return points.reshape(0, 2)
    homo = np.concatenate(
        [points, np.ones((*points.shape[:-1], 1))], axis=-1
    )
    out = homo @ np.asarray(matrix, dtype=np.float64).T
    return out[..., :2] / out[..., 2:3]
