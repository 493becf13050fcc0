"""Small shared helpers."""
from __future__ import annotations


def _norm_frame_hws(frame_hw):
    """Normalize an export geometry arg: one ``(h, w)`` or a list of
    them (multi-geometry fused artifacts — the TRT optimization-profile
    analogue, reference coreEngine.py:120-157)."""
    if len(frame_hw) and not hasattr(frame_hw[0], "__len__"):
        return [(int(frame_hw[0]), int(frame_hw[1]))]
    return [(int(h), int(w)) for h, w in frame_hw]
