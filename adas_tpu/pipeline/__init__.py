"""L4 application: per-frame ADAS orchestration + HUD rendering."""
from .app import ADASPipeline, run_video
from .panel import ControlPanel

__all__ = ["ADASPipeline", "run_video", "ControlPanel"]
