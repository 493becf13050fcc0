"""L1 perception facades: object + lane detectors (DetectFrame API)."""
from .lane_detector import (
    LaneDetectBase,
    UltrafastLaneDetector,
    UltrafastLaneDetectorV2,
)
from .object_detector import ObjectDetectBase, YoloDetector

__all__ = [
    "ObjectDetectBase",
    "YoloDetector",
    "EfficientdetDetector",
    "LaneDetectBase",
    "UltrafastLaneDetector",
    "UltrafastLaneDetectorV2",
]


def __getattr__(name):
    if name == "EfficientdetDetector":
        from .efficientdet_detector import EfficientdetDetector

        return EfficientdetDetector
    raise AttributeError(name)
