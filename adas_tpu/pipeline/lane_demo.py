"""Standalone lane-detection demos (no tracker/analytics).

Parity with reference TrafficLaneDetector/videoDetection.py:12-64 and
imageDetection.py:14-37: run just the lane detector on a video/image and
render points + ego-lane area via ``AutoDrawLanes``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..perception.lane_detector import (
    UltrafastLaneDetector,
    UltrafastLaneDetectorV2,
)
from ..utils.types import LaneModelType


def make_lane_detector(config: dict, logger=None):
    if "UFLDV2" in config["model_type"].name:
        return UltrafastLaneDetectorV2(logger=logger, **config)
    return UltrafastLaneDetector(logger=logger, **config)


def run_lane_image(
    image_path: str,
    output_path: Optional[str] = None,
    config: Optional[dict] = None,
) -> np.ndarray:
    """Detect + draw lanes on one image; returns the annotated array."""
    import cv2

    config = config or {
        "model_path": None, "model_type": LaneModelType.UFLDV2_CULANE,
    }
    img = cv2.imread(image_path)
    if img is None:
        raise FileNotFoundError(image_path)
    detector = make_lane_detector(config)
    out = detector.AutoDrawLanes(img)
    if output_path:
        cv2.imwrite(output_path, out)
    return out


def run_lane_video(
    video_path: str,
    output_path: Optional[str] = None,
    config: Optional[dict] = None,
    display: bool = False,
    max_frames: Optional[int] = None,
) -> int:
    """Lane-only video loop; returns processed frame count.

    Frame-read errors are logged and skipped (the reference swallows them
    silently, videoDetection.py:35-39)."""
    import cv2

    config = config or {
        "model_path": None, "model_type": LaneModelType.UFLDV2_CULANE,
    }
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise Exception("video path is error. please check it.")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    vout = None
    if output_path:
        fourcc = cv2.VideoWriter_fourcc("m", "p", "4", "v")
        vout = cv2.VideoWriter(output_path, fourcc, 30.0, (width, height))
    detector = make_lane_detector(config)
    n = 0
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        try:
            shown = detector.AutoDrawLanes(frame)
        except Exception:  # keep the stream alive on a bad frame
            continue
        if vout is not None:
            vout.write(shown)
        if display:
            cv2.imshow("Lane Detection", shown)
            if cv2.waitKey(1) == ord("q"):
                break
        n += 1
        if max_frames is not None and n >= max_frames:
            break
    if vout is not None:
        vout.release()
    cap.release()
    return n


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Standalone lane detection")
    ap.add_argument("-i", "--input", required=True, help="video or image")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--display", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()
    if args.input.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
        run_lane_image(args.input, args.output)
    else:
        run_lane_video(
            args.input, args.output,
            display=args.display, max_frames=args.max_frames,
        )
