"""The full ADAS pipeline: detect → track → lanes → geometry → signals →
render, one frame per step.

Structure parity with reference demo.py:217-320, repackaged as a class so
it is importable/testable (the reference is a __main__ script).  The two
device round-trips per frame each run a single fused jitted step
(SURVEY.md §7); tracker/analytics stay host-side.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

import numpy as np

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # Honor a CPU pin BEFORE any backend initializes: with the tunneled
    # TPU plugin resident, the env var alone is not enough (the plugin's
    # register() still runs and destabilizes the CPU backend — sporadic
    # corrupt buffer fetches that surface as cv2 "img layout" errors in
    # the draw code).  Same guard as __graft_entry__ / tests/conftest.
    import jax as _jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    _jax.config.update("jax_platforms", "cpu")

from ..analytics import (
    PerspectiveTransformation,
    SingleCamDistanceMeasure,
    TaskConditions,
)
from ..perception.lane_detector import (
    UltrafastLaneDetector,
    UltrafastLaneDetectorV2,
)
from ..perception.object_detector import YoloDetector
from ..tracking import BYTETracker
from ..utils.logger import Logger
from ..utils.profiling import FPSCounter, StageTimers
from ..utils.types import LaneModelType, ObjectModelType
from .panel import ControlPanel

DEFAULT_LANE_CONFIG = {
    "model_path": None,
    "model_type": LaneModelType.UFLDV2_CULANE,
}
DEFAULT_OBJECT_CONFIG = {
    "model_path": None,
    "model_type": ObjectModelType.YOLOV8,
    "classes_path": None,
    "box_score": 0.4,
    "box_nms_iou": 0.5,
}


class ADASPipeline:
    """Wires every layer together and processes frames one at a time."""

    def __init__(
        self,
        frame_size=(1280, 720),
        lane_config: Optional[dict] = None,
        object_config: Optional[dict] = None,
        logger: Optional[Logger] = None,
        enable_tracker: bool = True,
        use_fused: bool = True,
    ):
        self.logger = logger or Logger(None, logging.INFO, logging.INFO)
        lane_config = {**DEFAULT_LANE_CONFIG, **(lane_config or {})}
        object_config = {**DEFAULT_OBJECT_CONFIG, **(object_config or {})}

        if "UFLDV2" in lane_config["model_type"].name:
            self.laneDetector = UltrafastLaneDetectorV2(
                logger=self.logger, **lane_config
            )
        else:
            self.laneDetector = UltrafastLaneDetector(
                logger=self.logger, **lane_config
            )
        self.transformView = PerspectiveTransformation(
            frame_size, logger=self.logger
        )
        if object_config["model_type"] == ObjectModelType.EfficientDet:
            from ..perception.efficientdet_detector import (
                EfficientdetDetector,
            )

            self.objectDetector = EfficientdetDetector(
                logger=self.logger, **object_config
            )
        else:
            self.objectDetector = YoloDetector(
                logger=self.logger, **object_config
            )
        self.distanceDetector = SingleCamDistanceMeasure()
        self.objectTracker = (
            BYTETracker(names=self.objectDetector.colors_dict)
            if enable_tracker
            else None
        )
        self.displayPanel = ControlPanel()
        self.analyzeMsg = TaskConditions()
        self.object_infer_time = 0.0
        self.lane_infer_time = 0.0
        # observability: per-stage p50/p95 + rolling FPS (SURVEY.md §5)
        self.timers = StageTimers()
        self.fps = FPSCounter()

        # Fused single-graph path (pipeline/fused.py) when the model pair
        # supports it: one dispatch + one fetch per frame instead of two.
        self.fused = None
        if use_fused and isinstance(self.laneDetector, UltrafastLaneDetectorV2) \
                and isinstance(self.objectDetector, YoloDetector):
            from .fused import FusedADASStep

            self.fused = FusedADASStep(self.objectDetector, self.laneDetector)

    def process_frame(
        self, frame: np.ndarray, draw: bool = True
    ) -> np.ndarray:
        """Run the full per-frame stack; returns the annotated frame."""
        frame_show = frame.copy()

        self.fps.tick()
        if self.fused is not None:
            t0 = time.time()
            with self.timers.stage("fused_infer"):
                self.fused.run(frame)
            self.object_infer_time = round(time.time() - t0, 2)
            self.lane_infer_time = self.object_infer_time
            with self.timers.stage("tracker"):
                self._update_tracker(frame)
            with self.timers.stage("analytics_render"):
                return self._analyze_and_render(frame, frame_show, draw)

        t0 = time.time()
        with self.timers.stage("object_infer"):
            self.objectDetector.DetectFrame(frame)
        self.object_infer_time = round(time.time() - t0, 2)

        with self.timers.stage("tracker"):
            self._update_tracker(frame)

        t0 = time.time()
        with self.timers.stage("lane_infer"):
            self.laneDetector.DetectFrame(frame)
        self.lane_infer_time = round(time.time() - t0, 4)
        with self.timers.stage("analytics_render"):
            return self._analyze_and_render(frame, frame_show, draw)

    def _update_tracker(self, frame: np.ndarray) -> None:
        if self.objectTracker is None:
            return
        boxes = [
            obj.tolist(format_type="xyxy")
            for obj in self.objectDetector.object_info
        ]
        scores = [obj.conf for obj in self.objectDetector.object_info]
        ids = [obj.label for obj in self.objectDetector.object_info]
        self.objectTracker.update(
            np.asarray(boxes, dtype=np.float64).reshape(-1, 4),
            np.asarray(scores, dtype=np.float64),
            ids,
            frame,
        )

    def _analyze_and_render(
        self, frame: np.ndarray, frame_show: np.ndarray, draw: bool
    ) -> np.ndarray:
        # ---- analytics ----
        self.distanceDetector.updateDistance(self.objectDetector.object_info)
        lane_info = self.laneDetector.lane_info
        vehicle_distance = self.distanceDetector.calcCollisionPoint(
            lane_info.area_points
        )
        if self.analyzeMsg.CheckStatus() and lane_info.area_status:
            self.transformView.updateTransformParams(
                *lane_info.lanes_points[1:3],
                self.analyzeMsg.transform_status,
            )
        birdview_show = self.transformView.transformToBirdView(frame_show)
        birdview_lanes = [
            self.transformView.transformToBirdViewPoints(pts)
            for pts in lane_info.lanes_points
        ]
        (direction, curvature), offset = self.transformView.calcCurveAndOffset(
            birdview_show, *birdview_lanes[1:3], draw=draw
        )
        self.analyzeMsg.UpdateCollisionStatus(
            vehicle_distance, lane_info.area_status
        )
        self.analyzeMsg.UpdateOffsetStatus(offset)
        self.analyzeMsg.UpdateRouteStatus(direction, curvature)

        if not draw:
            return frame_show

        # ---- render ----
        self.transformView.DrawDetectedOnBirdView(
            birdview_show, birdview_lanes, self.analyzeMsg.offset_msg
        )
        if self.logger and self.logger.clevel == logging.DEBUG:
            self.transformView.DrawTransformFrontalViewArea(frame_show)
        self.laneDetector.DrawDetectedOnFrame(
            frame_show, self.analyzeMsg.offset_msg
        )
        self.laneDetector.DrawAreaOnFrame(
            frame_show,
            self.displayPanel.CollisionDict[self.analyzeMsg.collision_msg],
        )
        self.objectDetector.DrawDetectedOnFrame(frame_show)
        if self.objectTracker is not None:
            self.objectTracker.DrawTrackedOnFrame(frame_show, False)
        self.distanceDetector.DrawDetectedOnFrame(frame_show)

        self.displayPanel.DisplayBirdViewPanel(frame_show, birdview_show)
        self.displayPanel.DisplaySignsPanel(
            frame_show, self.analyzeMsg.offset_msg, self.analyzeMsg.curvature_msg
        )
        self.displayPanel.DisplayCollisionPanel(
            frame_show, self.analyzeMsg.collision_msg,
            self.object_infer_time, self.lane_infer_time,
        )
        return frame_show


def run_video(
    video_path: str,
    output_path: Optional[str] = None,
    lane_config: Optional[dict] = None,
    object_config: Optional[dict] = None,
    display: bool = False,
    max_frames: Optional[int] = None,
) -> int:
    """Process a video end to end; returns the number of frames written."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise Exception("video path is error. please check it.")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    vout = None
    if output_path:
        fourcc = cv2.VideoWriter_fourcc("m", "p", "4", "v")
        vout = cv2.VideoWriter(output_path, fourcc, 30.0, (width, height))

    pipeline = ADASPipeline(
        frame_size=(width, height),
        lane_config=lane_config,
        object_config=object_config,
    )
    n = 0
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frame_show = pipeline.process_frame(frame)
        if vout is not None:
            vout.write(frame_show)
        if display:
            cv2.imshow("ADAS Simulation", frame_show)
            if cv2.waitKey(1) == ord("q"):
                break
        n += 1
        if max_frames is not None and n >= max_frames:
            break
    if vout is not None:
        vout.release()
    cap.release()
    return n


def run_synthetic(
    output_path: str, frames: int = 16, frame_hw=(720, 1280)
) -> int:
    """Headless smoke run on synthetic noise frames (no video asset
    needed — the reference's demo requires files its repo never ships,
    demo.py:220-228); exercises the full pipeline + HUD and writes an
    annotated mp4."""
    import cv2
    import numpy as np

    h, w = frame_hw
    fourcc = cv2.VideoWriter_fourcc("m", "p", "4", "v")
    vout = cv2.VideoWriter(output_path, fourcc, 30.0, (w, h))
    pipeline = ADASPipeline(frame_size=(w, h))
    rng = np.random.default_rng(0)
    for _ in range(frames):
        frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        vout.write(pipeline.process_frame(frame))
    vout.release()
    return frames


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="ADAS demo pipeline")
    ap.add_argument("-i", "--input", default=None, help="input video")
    ap.add_argument("-o", "--output", default=None, help="output video")
    ap.add_argument("--display", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument(
        "--synthetic", action="store_true",
        help="run on synthetic noise frames (no input video needed)",
    )
    ap.add_argument("--frames", type=int, default=16,
                    help="frame count for --synthetic")
    args = ap.parse_args()
    if args.synthetic:
        out = args.output or "synthetic_out.mp4"
        n = run_synthetic(out, frames=args.frames)
        print(f"wrote {n} frames to {out}")
        return
    if not args.input:
        ap.error("-i/--input is required unless --synthetic")
    out = args.output or args.input[:-4] + "_out.mp4"
    frames = run_video(
        args.input, out, display=args.display, max_frames=args.max_frames
    )
    print(f"wrote {frames} frames to {out}")


if __name__ == "__main__":
    main()
