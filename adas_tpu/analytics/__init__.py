"""L3 analytics: FCWS distance, BEV geometry, ADAS decision state machine."""
from .conditions import TaskConditions
from .distance import SingleCamDistanceMeasure
from .perspective import PerspectiveTransformation

__all__ = [
    "TaskConditions",
    "SingleCamDistanceMeasure",
    "PerspectiveTransformation",
]
