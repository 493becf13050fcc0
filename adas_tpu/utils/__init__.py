from .limited import LimitedList
from .logger import Logger
from .types import (
    LANE_COLORS,
    LANE_KEYS,
    CollisionType,
    CurvatureType,
    LaneInfo,
    LaneModelType,
    ObjectModelType,
    OffsetType,
    RectInfo,
    hex_to_rgb,
)

__all__ = [
    "LimitedList",
    "Logger",
    "LANE_COLORS",
    "LANE_KEYS",
    "CollisionType",
    "CurvatureType",
    "LaneInfo",
    "LaneModelType",
    "ObjectModelType",
    "OffsetType",
    "RectInfo",
    "hex_to_rgb",
]
