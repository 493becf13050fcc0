"""Model registry: one place that maps a model-type name to a built flax
graph + canonical input shape.

The L0 "engine" role from SURVEY.md §7: detectors, the engine-builder CLI
(tools/build_engine.py) and tests all resolve models through here instead
of hand-wiring constructors.  Registered names are the reference's enum
vocabulary (ObjectModelType / LaneModelType) plus EfficientDet compounds.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple


@dataclass(frozen=True)
class ModelEntry:
    """A built graph: flax module + NCHW input shape + metadata."""

    net: object
    input_shape_nchw: Tuple[int, int, int, int]
    meta: dict


_BUILDERS: Dict[str, Callable[..., ModelEntry]] = {}


def register(name: str):
    def deco(fn):
        _BUILDERS[name.upper()] = fn
        return fn

    return deco


def available() -> list:
    return sorted(_BUILDERS)


def build(name: str, **kwargs) -> ModelEntry:
    """Build a registered model; kwargs forwarded to the builder
    (scale=, height=, width=, num_classes=, compound=...)."""
    key = name.upper()
    if key not in _BUILDERS:
        raise KeyError(
            f"unknown model '{name}'; available: {', '.join(available())}"
        )
    return _BUILDERS[key](**kwargs)


def _yolo(family: str, name: str):
    @register(name)
    def _build(
        scale: str = "n",
        height: int = 640,
        width: int = 640,
        num_classes: int = 80,
        **_,
    ) -> ModelEntry:
        from ..models.yolo import YoloSpec, build_yolo

        spec = YoloSpec(
            family=family, scale=scale, num_classes=num_classes,
            input_size=(height, width),
        )
        return ModelEntry(
            net=build_yolo(spec),
            input_shape_nchw=(1, 3, height, width),
            meta={"model": name, "scale": scale, "family": family},
        )

    return _build


for _name, _family in (
    ("YOLOV5", "v5"), ("YOLOV5_LITE", "v5lite"), ("YOLOV6", "v6"),
    ("YOLOV7", "v7"), ("YOLOV8", "v8"), ("YOLOV9", "v9"),
    ("YOLOV10", "v10"),
):
    _yolo(_family, _name)


@register("EFFICIENTDET")
def _efficientdet(
    compound: int = 0, num_classes: int = 90, scale: Optional[str] = None, **_
) -> ModelEntry:
    from ..models.efficientdet import EfficientDet, EfficientDetSpec

    if scale is not None:
        compound = int(scale)
    spec = EfficientDetSpec(compound=compound, num_classes=num_classes)
    s = spec.input_size
    return ModelEntry(
        net=EfficientDet(spec),
        input_shape_nchw=(1, 3, s, s),
        meta={"model": "EFFICIENTDET", "compound": compound},
    )


def _ufld(name: str):
    @register(name)
    def _build(**_) -> ModelEntry:
        from ..models.ufld import (
            UFLDV1_SPECS,
            UFLDV2_SPECS,
            UFLDv1Net,
            UFLDv2Net,
        )
        from ..utils.types import LaneModelType

        lane_type = LaneModelType[name]
        if "V2" in name:
            spec = UFLDV2_SPECS[lane_type]
            if name == "UFLDV2_CURVELANES":
                # 20-lane-token conv head (model_curvelanes.py:34-75) —
                # buildable/exportable; the runtime facade still rejects
                # CURVELANES for parity with the reference
                from ..models.ufld import UFLDv2CurveLanesNet

                net = UFLDv2CurveLanesNet(spec)
            else:
                net = UFLDv2Net(spec)
        else:
            spec = UFLDV1_SPECS[lane_type]
            net = UFLDv1Net(spec)
        return ModelEntry(
            net=net,
            input_shape_nchw=(1, 3, spec.input_height, spec.input_width),
            meta={"model": name},
        )

    return _build


for _name in (
    "UFLD_TUSIMPLE", "UFLD_CULANE",
    "UFLDV2_TUSIMPLE", "UFLDV2_CULANE", "UFLDV2_CURVELANES",
):
    _ufld(_name)
