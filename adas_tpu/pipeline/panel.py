"""HUD control panel: bird-view inset, signs panel, collision panel.

Behavior parity with reference demo.py:32-214 (ControlPanel): rolling
30-frame FPS counter, curve-status hysteresis on the signs panel,
per-stage inference times on the collision panel.  The reference loads
PNG icon assets (demo.py:56-74) that are not shipped in the snapshot;
icons here are generated procedurally with the same RGBA overlay
contract (alpha-nonzero scatter onto the frame).
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

from ..utils.types import CollisionType, CurvatureType, OffsetType


def _blank(w: int, h: int) -> np.ndarray:
    return np.zeros((h, w, 4), dtype=np.uint8)


def _arrow_icon(size: int = 200, direction: str = "up") -> np.ndarray:
    """Procedural turn-arrow icon (RGBA), white on transparent."""
    import cv2

    img = _blank(size, size)
    s = size
    shaft = np.array(
        [[s // 2 - s // 12, int(s * 0.85)], [s // 2 + s // 12, int(s * 0.85)],
         [s // 2 + s // 12, int(s * 0.45)], [s // 2 - s // 12, int(s * 0.45)]]
    )
    head = np.array(
        [[s // 2 - s // 5, int(s * 0.45)], [s // 2 + s // 5, int(s * 0.45)],
         [s // 2, int(s * 0.18)]]
    )
    cv2.fillPoly(img, [shaft], (255, 255, 255, 255))
    cv2.fillPoly(img, [head], (255, 255, 255, 255))
    if direction == "left":
        m = cv2.getRotationMatrix2D((s / 2, s / 2), 90, 1.0)
        img = cv2.warpAffine(img, m, (s, s))
        # curve hint: bend the top toward the left
    elif direction == "right":
        m = cv2.getRotationMatrix2D((s / 2, s / 2), -90, 1.0)
        img = cv2.warpAffine(img, m, (s, s))
    return img


def _warn_icon(size: int = 200) -> np.ndarray:
    """Yellow warning triangle with '!' (RGBA)."""
    import cv2

    img = _blank(size, size)
    s = size
    tri = np.array(
        [[s // 2, int(s * 0.1)], [int(s * 0.08), int(s * 0.9)],
         [int(s * 0.92), int(s * 0.9)]]
    )
    cv2.fillPoly(img, [tri], (0, 215, 255, 255))
    cv2.putText(
        img, "!", (s // 2 - s // 12, int(s * 0.78)),
        cv2.FONT_HERSHEY_TRIPLEX, s / 70, (0, 0, 0, 255), max(2, s // 40),
    )
    return img


def _collision_icon(size: int = 100, color=(0, 255, 0)) -> np.ndarray:
    """Car-ahead FCWS icon (RGBA): colored disc + car glyph."""
    import cv2

    img = _blank(size, size)
    s = size
    cv2.circle(img, (s // 2, s // 2), int(s * 0.45), (*color, 255), -1)
    cv2.rectangle(
        img, (int(s * 0.3), int(s * 0.42)), (int(s * 0.7), int(s * 0.62)),
        (255, 255, 255, 255), -1,
    )
    cv2.rectangle(
        img, (int(s * 0.37), int(s * 0.3)), (int(s * 0.63), int(s * 0.44)),
        (255, 255, 255, 255), -1,
    )
    for cx in (0.37, 0.63):
        cv2.circle(
            img, (int(s * cx), int(s * 0.66)), int(s * 0.06),
            (40, 40, 40, 255), -1,
        )
    return img


def _lane_departure_icon(w: int = 300, h: int = 200, side: str = "left"):
    """Lane-keeping-assist icon: two lane lines + red arrow to one side."""
    import cv2

    img = _blank(w, h)
    cv2.line(img, (w // 3, h - 10), (w // 2 - 20, 10), (255, 255, 255, 255), 8)
    cv2.line(
        img, (2 * w // 3, h - 10), (w // 2 + 20, 10), (255, 255, 255, 255), 8
    )
    y = h // 2
    if side == "left":
        cv2.arrowedLine(
            img, (w // 2 + 40, y), (w // 2 - 70, y), (0, 0, 255, 255), 10,
            tipLength=0.4,
        )
    else:
        cv2.arrowedLine(
            img, (w // 2 - 40, y), (w // 2 + 70, y), (0, 0, 255, 255), 10,
            tipLength=0.4,
        )
    return img


class ControlPanel:
    """Renders the three HUD widgets onto the output frame."""

    CollisionDict = {
        CollisionType.UNKNOWN: (0, 255, 255),
        CollisionType.NORMAL: (0, 255, 0),
        CollisionType.PROMPT: (0, 102, 255),
        CollisionType.WARNING: (0, 0, 255),
    }
    OffsetDict = {
        OffsetType.UNKNOWN: (0, 255, 255),
        OffsetType.RIGHT: (0, 0, 255),
        OffsetType.LEFT: (0, 0, 255),
        OffsetType.CENTER: (0, 255, 0),
    }
    CurvatureDict = {
        CurvatureType.UNKNOWN: (0, 255, 255),
        CurvatureType.STRAIGHT: (0, 255, 0),
        CurvatureType.EASY_LEFT: (0, 102, 255),
        CurvatureType.EASY_RIGHT: (0, 102, 255),
        CurvatureType.HARD_LEFT: (0, 0, 255),
        CurvatureType.HARD_RIGHT: (0, 0, 255),
    }

    def __init__(self):
        import cv2

        self.collision_warning_img = _collision_icon(100, (0, 0, 255))
        self.collision_prompt_img = _collision_icon(100, (0, 102, 255))
        self.collision_normal_img = _collision_icon(100, (0, 255, 0))
        self.left_curve_img = _arrow_icon(200, "left")
        self.right_curve_img = _arrow_icon(200, "right")
        self.keep_straight_img = _arrow_icon(200, "up")
        self.determined_img = _warn_icon(200)
        self.left_lanes_img = _lane_departure_icon(300, 200, "left")
        self.right_lanes_img = _lane_departure_icon(300, 200, "right")

        self.fps = 0.0
        self.frame_count = 0
        self.start = time.time()
        self.curve_status: Optional[str] = None

    def _updateFPS(self) -> None:
        self.frame_count += 1
        if self.frame_count >= 30:
            end = time.time()
            self.fps = self.frame_count / (end - self.start)
            self.frame_count = 0
            self.start = time.time()

    @staticmethod
    def _overlay(main_show, icon, dy, dx, alpha_ch=3):
        """Scatter icon pixels where the given channel is non-zero, with
        bounds clipping (the reference indexes the frame directly)."""
        y, x = icon[:, :, alpha_ch].nonzero()
        yy = y + dy
        xx = x + dx
        ok = (
            (yy >= 0) & (yy < main_show.shape[0])
            & (xx >= 0) & (xx < main_show.shape[1])
        )
        main_show[yy[ok], xx[ok]] = icon[y[ok], x[ok], :3]

    def DisplayBirdViewPanel(self, main_show, min_show, show_ratio=0.25):
        import cv2

        w = int(main_show.shape[1] * show_ratio)
        h = int(main_show.shape[0] * show_ratio)
        inset = cv2.resize(min_show, (w, h))
        inset = cv2.copyMakeBorder(
            inset, 10, 10, 10, 10, cv2.BORDER_CONSTANT, value=[0, 0, 0]
        )
        main_show[: inset.shape[0], -inset.shape[1]:] = inset

    def DisplaySignsPanel(self, main_show, offset_type, curvature_type):
        import cv2

        w, h = 400, 365
        widget = main_show[:h, :w].copy()
        widget //= 2
        widget[0:3, :] = [0, 0, 255]
        widget[-3:-1, :] = [0, 0, 255]
        widget[:, 0:3] = [0, 0, 255]
        widget[:, -3:-1] = [0, 0, 255]
        main_show[:h, :w] = widget

        if curvature_type == CurvatureType.UNKNOWN and offset_type in {
            OffsetType.UNKNOWN, OffsetType.CENTER,
        }:
            self._overlay(main_show, self.determined_img, 10, w // 2 - 100)
            self.curve_status = None
        elif (
            curvature_type == CurvatureType.HARD_LEFT
            or self.curve_status == "Left"
        ) and curvature_type not in {
            CurvatureType.EASY_RIGHT, CurvatureType.HARD_RIGHT,
        }:
            self._overlay(main_show, self.left_curve_img, 10, w // 2 - 100)
            self.curve_status = "Left"
        elif (
            curvature_type == CurvatureType.HARD_RIGHT
            or self.curve_status == "Right"
        ) and curvature_type not in {
            CurvatureType.EASY_LEFT, CurvatureType.HARD_LEFT,
        }:
            self._overlay(main_show, self.right_curve_img, 10, w // 2 - 100)
            self.curve_status = "Right"

        if offset_type == OffsetType.RIGHT:
            self._overlay(
                main_show, self.left_lanes_img, 10, w // 2 - 150, alpha_ch=2
            )
        elif offset_type == OffsetType.LEFT:
            self._overlay(
                main_show, self.right_lanes_img, 10, w // 2 - 150, alpha_ch=2
            )
        elif (
            curvature_type == CurvatureType.STRAIGHT
            or self.curve_status == "Straight"
        ):
            self._overlay(main_show, self.keep_straight_img, 10, w // 2 - 100)
            self.curve_status = "Straight"

        self._updateFPS()
        cv2.putText(
            main_show, "LDWS : " + offset_type.value, (10, 240),
            fontFace=cv2.FONT_HERSHEY_SIMPLEX, fontScale=0.7,
            color=self.OffsetDict[offset_type], thickness=2,
        )
        cv2.putText(
            main_show, "LKAS : " + curvature_type.value, (10, 280),
            fontFace=cv2.FONT_HERSHEY_SIMPLEX, fontScale=0.7,
            color=self.CurvatureDict[curvature_type], thickness=2,
        )
        cv2.putText(
            main_show, "FPS  : %.2f" % self.fps, (10, widget.shape[0] - 20),
            cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 2, cv2.LINE_AA,
        )

    def DisplayCollisionPanel(
        self, main_show, collision_type,
        object_infer_time, lane_infer_time, show_ratio=0.25,
    ):
        import cv2

        w = int(main_show.shape[1] * show_ratio)
        h = int(main_show.shape[0] * show_ratio)
        widget = main_show[h + 20 : 2 * h, -w - 20 :].copy()
        widget //= 2
        widget[0:3, :] = [0, 0, 255]
        widget[-3:-1, :] = [0, 0, 255]
        widget[:, -3:-1] = [0, 0, 255]
        widget[:, 0:3] = [0, 0, 255]
        main_show[h + 20 : 2 * h, -w - 20 :] = widget

        icon = {
            CollisionType.WARNING: self.collision_warning_img,
            CollisionType.PROMPT: self.collision_prompt_img,
            CollisionType.NORMAL: self.collision_normal_img,
        }.get(collision_type)
        if icon is not None:
            self._overlay(
                main_show, icon, h + 50, main_show.shape[1] - w - 5
            )

        cv2.putText(
            main_show, "FCWS : " + collision_type.value,
            (main_show.shape[1] - w + 100, 240),
            fontFace=cv2.FONT_HERSHEY_SIMPLEX, fontScale=0.6,
            color=self.CollisionDict[collision_type], thickness=2,
        )
        cv2.putText(
            main_show, "object-infer : %.2f s" % object_infer_time,
            (main_show.shape[1] - w + 100, 300),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (230, 230, 230), 1, cv2.LINE_AA,
        )
        cv2.putText(
            main_show, "lane-infer : %.2f s" % lane_infer_time,
            (main_show.shape[1] - w + 100, 320),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (230, 230, 230), 1, cv2.LINE_AA,
        )
