"""Frontal ↔ bird's-eye-view geometry for LDWS/LKAS.

Behavior parity with reference
TrafficLaneDetector/ufldDetector/perspectiveTransformation.py: default
source trapezoid at image fractions, dynamic re-estimation from detected
ego lanes with "Top"/"Bottom"/"Default" modes, world-space curvature
radius (ym=30/720, xm=3.7/700 m/px) and center offset from a 2nd-order
polyfit of each ego lane.

TPU-first: the image warp runs as a jitted device op (ops/warp.py) with
the homography as a traced argument — recalibration updates the 3x3
without recompiling; point transforms and the 4-point solve stay host-side
(SURVEY.md §7 "Dynamic homography").
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..ops.warp import (
    get_perspective_transform,
    transform_points,
    warp_perspective,
)
from ..utils.types import LANE_COLORS, OffsetType

YM_PER_PIX = 30 / 720
XM_PER_PIX = 3.7 / 700


class PerspectiveTransformation:
    """Maintains src/dst quads + homographies; warps images and points."""

    def __init__(self, img_size=(1280, 720), logger=None):
        self.img_size = img_size
        self.logger = logger
        w, h = img_size
        self.src = np.float32(
            [(w * 0.3, h * 0.7), (w * 0.2, h), (w * 0.95, h), (w * 0.8, h * 0.7)]
        )
        offset_x = w / 4
        self.dst = np.float32(
            [(offset_x, 0), (offset_x, h), (w - offset_x, h), (w - offset_x, 0)]
        )
        self._update_matrices()

    def _update_matrices(self) -> None:
        self.M = get_perspective_transform(self.src, self.dst)
        self.M_inv = get_perspective_transform(self.dst, self.src)

    def updateTransformParams(
        self,
        left_lanes: Union[list, np.ndarray],
        right_lanes: Union[list, np.ndarray],
        type: str = "Default",
    ) -> None:
        """Re-fit the source trapezoid to the detected ego-lane extents."""
        left = np.asarray(left_lanes, dtype=np.float64).reshape(-1, 2)
        right = np.asarray(right_lanes, dtype=np.float64).reshape(-1, 2)
        if len(left) == 0 or len(right) == 0:
            return
        if type == "Top":
            top_y = min(left[:, 1].min(), right[:, 1].min())
            top_left = (left[:, 0].max() - 20, top_y)
            bottom_left = (self.src[1][0] - 10, self.src[1][1])
            bottom_right = (self.src[2][0] + 10, self.src[2][1])
            top_right = (right[:, 0].min() + 20, top_y)
        elif type == "Bottom":
            top_left = tuple(self.src[0])
            bottom_left = (left[:, 0].min() - 20, self.src[1][1])
            bottom_right = (right[:, 0].max() + 20, self.src[2][1])
            top_right = tuple(self.src[3])
        elif type == "Default":
            top_y = min(left[:, 1].min(), right[:, 1].min())
            top_left = (left[:, 0].max() - 20, top_y)
            bottom_left = (left[:, 0].min() - 5, self.src[1][1])
            bottom_right = (right[:, 0].max() + 5, self.src[2][1])
            top_right = (right[:, 0].min() + 20, top_y)
        else:
            return
        if self.logger is not None:
            self.logger.debug(
                f"Transform Type : {type} {top_left} {bottom_left} "
                f"{bottom_right} {top_right}"
            )
        self.src = np.float32([top_left, bottom_left, bottom_right, top_right])
        self._update_matrices()

    def transformToBirdView(self, img: np.ndarray) -> np.ndarray:
        """Warp a frontal frame to bird view on device."""
        w, h = self.img_size
        out = warp_perspective(
            jnp.asarray(img), jnp.asarray(self.M, jnp.float32), (h, w)
        )
        # copy: device fetches are read-only, downstream cv2 draws in place
        return np.array(out)

    def transformToFrontalView(self, img: np.ndarray) -> np.ndarray:
        w, h = self.img_size
        out = warp_perspective(
            jnp.asarray(img), jnp.asarray(self.M_inv, jnp.float32), (h, w)
        )
        return np.array(out)

    def transformToBirdViewPoints(self, points) -> np.ndarray:
        """Project frontal-view lane points into bird view (host, tiny)."""
        if points is None or len(points) == 0:
            return np.zeros((0, 2), dtype=int)
        out = transform_points(np.asarray(points), self.M)
        # near-horizon points blow up through the homography; keep ints
        # representable (cv2 drawing rejects values beyond int32)
        out = np.nan_to_num(out, posinf=2**30, neginf=-(2**30))
        return np.clip(out, -(2**30), 2**30).astype(np.int64)

    def calcCurveAndOffset(
        self, img: np.ndarray, left_lanes, right_lanes, draw: bool = True
    ) -> Tuple[Tuple[Optional[str], Optional[float]], Optional[float]]:
        """Curvature radius (m), direction ("L"/"R"/"F") and center offset.

        Divergence from the reference (perspectiveTransformation.py:198-201):
        lane width samples the *bottom row of the bird image* rather than
        hard-coded row 719, so non-720p frames are handled.
        """
        left = np.asarray(left_lanes, dtype=np.float64).reshape(-1, 2)
        right = np.asarray(right_lanes, dtype=np.float64).reshape(-1, 2)
        if len(left) < 3 or len(right) < 3:
            return (None, None), None

        left_fit = np.polyfit(left[:, 1], left[:, 0], 2)
        right_fit = np.polyfit(right[:, 1], right[:, 0], 2)
        side_cr = (
            left_fit[0]
            if abs(left_fit[0]) > abs(right_fit[0])
            else right_fit[0]
        )
        if side_cr < -0.00015 and left[0, 0] <= left[len(left) // 2, 0]:
            direction = "L"
        elif side_cr > 0.00015 and right[0, 0] >= right[len(right) // 2, 0]:
            direction = "R"
        else:
            direction = "F"

        h = img.shape[0]
        ploty = np.arange(h, dtype=np.float64)
        leftx = np.polyval(left_fit, ploty)
        rightx = np.polyval(right_fit, ploty)
        y_eval = ploty[-1]

        left_fit_cr = np.polyfit(ploty * YM_PER_PIX, leftx * XM_PER_PIX, 2)
        right_fit_cr = np.polyfit(ploty * YM_PER_PIX, rightx * XM_PER_PIX, 2)

        def radius(fit):
            return ((1 + (2 * fit[0] * y_eval * YM_PER_PIX + fit[1]) ** 2)
                    ** 1.5) / abs(2 * fit[0])

        curvature = (radius(left_fit_cr) + radius(right_fit_cr)) / 2
        lane_width = abs(leftx[-1] - rightx[-1])
        lane_xm_per_pix = 3.7 / lane_width if lane_width > 0 else 0.0
        veh_pos = (leftx[-1] + rightx[-1]) / 2.0
        cen_pos = img.shape[1] / 2.0
        offset = (veh_pos - cen_pos) * lane_xm_per_pix

        if draw:
            import cv2

            # degenerate fits (noise/colinear lanes) can put veh_pos far
            # outside int32 — cv2 5.0 then fails overload resolution
            # with a misleading img-layout error; clamp to the canvas
            def _cx(v):
                if not np.isfinite(v):
                    return int(cen_pos)
                return int(np.clip(v, -img.shape[1], 2 * img.shape[1]))

            cv2.arrowedLine(
                img, (_cx(veh_pos), int(y_eval)),
                (_cx(veh_pos), int(img.shape[1] / 3)),
                (255, 255, 255), 5, 0, 0, 0.2,
            )
            cv2.arrowedLine(
                img, (int(cen_pos), int(y_eval)),
                (int(cen_pos), int(img.shape[0] / 1.3)),
                (150, 150, 150), 10, 0, 0, 0.5,
            )
            cv2.putText(
                img, "Offset: %.1f m" % offset, (20, 80),
                cv2.FONT_HERSHEY_SIMPLEX, 3, (0, 0, 255), 5,
            )
            cv2.putText(
                img, "R : %.1f m" % curvature, (20, 180),
                cv2.FONT_HERSHEY_SIMPLEX, 3, (0, 0, 255), 5,
            )
        return (direction, curvature), offset

    def DrawDetectedOnBirdView(
        self, image: np.ndarray, lanes_points: List,
        type: OffsetType = OffsetType.UNKNOWN,
    ) -> None:
        import cv2

        for lane_num, lane_points in enumerate(lanes_points):
            if lane_num == 1 and type == OffsetType.RIGHT:
                color = (0, 0, 255)
            elif lane_num == 2 and type == OffsetType.LEFT:
                color = (0, 0, 255)
            else:
                color = LANE_COLORS[lane_num]
            h, w = image.shape[:2]
            for x, y in lane_points:
                # points behind the horizon project to huge/non-finite
                # coordinates; skip anything far outside the canvas
                # (cv2 5.0 rejects extreme values with a misleading
                # "img layout" overload error)
                if not (
                    np.isfinite(x) and np.isfinite(y)
                    and -w <= x <= 2 * w and -h <= y <= 2 * h
                ):
                    continue
                try:
                    cv2.circle(image, (int(x), int(y)), 10, color, -1)
                except cv2.error:
                    continue

    def DrawTransformFrontalViewArea(self, image: np.ndarray) -> None:
        import cv2

        pts = self.src.astype(int)
        for a, b in ((0, 1), (1, 2), (2, 3), (3, 0)):
            cv2.line(image, tuple(pts[a]), tuple(pts[b]), (0, 0, 255), 5)
