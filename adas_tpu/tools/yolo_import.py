"""Ultralytics YOLO checkpoint ingestion: torch/ONNX tensors → flax tree.

Maps the public ultralytics module-index layout (``model.{i}.*`` state-
dict keys, identical names inside their ONNX exports) onto the native
graphs in models/yolo.py, so pretrained v5/v8 weights load directly.
ONNX files go through tools/onnx_import.read_onnx_initializers first.

The DFL conv (``model.22.dfl.conv.weight`` — a frozen arange kernel) is
skipped: models/yolo.py computes the distribution expectation
analytically (_dfl_decode), which is the same operator.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np

from ..models.yolo import YoloSpec
from .torch_import import _conv  # OIHW->HWIO transform


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convbn_entries(src: str, dst: Tuple[str, ...]):
    """Ultralytics ``Conv`` (conv+bn+act) -> ConvBN params/batch_stats."""
    return [
        (f"{src}.conv.weight", "params", dst + ("conv", "kernel"), _conv),
        (f"{src}.bn.weight", "params", dst + ("bn", "scale"), None),
        (f"{src}.bn.bias", "params", dst + ("bn", "bias"), None),
        (f"{src}.bn.running_mean", "batch_stats", dst + ("bn", "mean"), None),
        (f"{src}.bn.running_var", "batch_stats", dst + ("bn", "var"), None),
    ]


def _plain_conv_entries(src: str, dst: Tuple[str, ...]):
    """Bare nn.Conv2d with bias -> flax nn.Conv."""
    return [
        (f"{src}.weight", "params", dst + ("kernel",), _conv),
        (f"{src}.bias", "params", dst + ("bias",), None),
    ]


def _c2f_entries(src: str, dst: str, n: int):
    out = _convbn_entries(f"{src}.cv1", (dst, "cv1"))
    out += _convbn_entries(f"{src}.cv2", (dst, "cv2"))
    for i in range(n):
        out += _convbn_entries(f"{src}.m.{i}.cv1", (dst, f"m{i}", "cv1"))
        out += _convbn_entries(f"{src}.m.{i}.cv2", (dst, f"m{i}", "cv2"))
    return out


def _c3_entries(src: str, dst: str, n: int):
    out = _convbn_entries(f"{src}.cv1", (dst, "cv1"))
    out += _convbn_entries(f"{src}.cv2", (dst, "cv2"))
    out += _convbn_entries(f"{src}.cv3", (dst, "cv3"))
    for i in range(n):
        out += _convbn_entries(f"{src}.m.{i}.cv1", (dst, f"m{i}", "cv1"))
        out += _convbn_entries(f"{src}.m.{i}.cv2", (dst, f"m{i}", "cv2"))
    return out


def _sppf_entries(src: str, dst: str):
    return _convbn_entries(f"{src}.cv1", (dst, "cv1")) + _convbn_entries(
        f"{src}.cv2", (dst, "cv2")
    )


def yolov8_mapping(spec: YoloSpec) -> List[tuple]:
    """(src_key, collection, dst_path, transform) table for YOLOv8."""
    d = spec.depths
    m = []
    net = lambda *p: ("net",) + p  # noqa: E731
    m += _convbn_entries("model.0", net("stem"))
    m += _convbn_entries("model.1", net("down1"))
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.2", "stage1", d[0])
    ]
    m += _convbn_entries("model.3", net("down2"))
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.4", "stage2", d[1])
    ]
    m += _convbn_entries("model.5", net("down3"))
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.6", "stage3", d[2])
    ]
    m += _convbn_entries("model.7", net("down4"))
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.8", "stage4", d[3])
    ]
    m += [
        (s, c, net(*p), t) for s, c, p, t in _sppf_entries("model.9", "sppf")
    ]
    # PAN neck (10/13 upsample, 11/14/17/20 concat: no params)
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.12", "fpn4", d[0])
    ]
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.15", "fpn3", d[0])
    ]
    m += _convbn_entries("model.16", net("pan3"))
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.18", "pan4", d[0])
    ]
    m += _convbn_entries("model.19", net("pan5_down"))
    m += [
        (s, c, net(*p), t)
        for s, c, p, t in _c2f_entries("model.21", "pan5", d[0])
    ]
    # Detect head 22: cv2 = box branch, cv3 = cls branch, per level
    for li in range(3):
        m += _convbn_entries(
            f"model.22.cv2.{li}.0", ("head", f"box{li}_0")
        )
        m += _convbn_entries(
            f"model.22.cv2.{li}.1", ("head", f"box{li}_1")
        )
        m += _plain_conv_entries(
            f"model.22.cv2.{li}.2", ("head", f"box{li}_2")
        )
        m += _convbn_entries(
            f"model.22.cv3.{li}.0", ("head", f"cls{li}_0")
        )
        m += _convbn_entries(
            f"model.22.cv3.{li}.1", ("head", f"cls{li}_1")
        )
        m += _plain_conv_entries(
            f"model.22.cv3.{li}.2", ("head", f"cls{li}_2")
        )
    return m


def yolov5_mapping(spec: YoloSpec) -> List[tuple]:
    """(src_key, collection, dst_path, transform) table for YOLOv5 (v6.x
    layout: SPPF at 9, Detect at 24)."""
    d = spec.depths
    m = []
    net = lambda *p: ("net",) + p  # noqa: E731
    m += _convbn_entries("model.0", net("stem"))
    m += _convbn_entries("model.1", net("down1"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.2", "stage1", d[0])]
    m += _convbn_entries("model.3", net("down2"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.4", "stage2", d[1])]
    m += _convbn_entries("model.5", net("down3"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.6", "stage3", d[2])]
    m += _convbn_entries("model.7", net("down4"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.8", "stage4", d[3])]
    m += [(s, c, net(*p), t) for s, c, p, t in _sppf_entries("model.9", "sppf")]
    m += _convbn_entries("model.10", net("lat5"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.13", "fpn4", d[0])]
    m += _convbn_entries("model.14", net("lat4"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.17", "fpn3", d[0])]
    m += _convbn_entries("model.18", net("pan3"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.20", "pan4", d[0])]
    m += _convbn_entries("model.21", net("pan5_down"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c3_entries("model.23", "pan5", d[0])]
    for li in range(3):
        m += _plain_conv_entries(f"model.24.m.{li}", (f"head{li}",))
    return m


_SKIP_SUFFIXES = (
    "num_batches_tracked", "anchors", "anchor_grid", "dfl.conv.weight",
    "stride",
)


def yolo_variables(
    state: Dict[str, np.ndarray], spec: YoloSpec
) -> dict:
    """torch/ONNX state tensors -> flax variables for build_yolo(spec).

    Accepts keys with or without a leading ``model.`` wrapper prefix
    (ultralytics full checkpoints nest the detection model once more).
    """
    if spec.family == "v8":
        mapping = yolov8_mapping(spec)
    elif spec.family == "v5":
        mapping = yolov5_mapping(spec)
    elif spec.family == "v10":
        mapping = yolov10_mapping(spec)
    else:
        raise NotImplementedError(
            f"no checkpoint mapping for family {spec.family!r} yet"
        )
    # normalize double-model prefix: "model.model.3..." -> "model.3..."
    norm = {}
    for k, v in state.items():
        if k.startswith("model.model."):
            k = k[len("model.") :]
        norm[k] = np.asarray(v)

    variables: dict = {"params": {}, "batch_stats": {}}
    used = set()
    for src, collection, dst, transform in mapping:
        if src not in norm:
            raise KeyError(f"checkpoint missing tensor {src}")
        value = norm[src]
        if transform is not None:
            value = transform(value)
        _set(variables[collection], dst, value)
        used.add(src)
    leftover = [
        k for k in norm
        if k not in used and not k.endswith(_SKIP_SUFFIXES)
    ]
    if leftover:
        raise KeyError(f"unmapped checkpoint tensors: {leftover[:8]} ...")
    return variables


def inverse_mapping(spec: YoloSpec) -> Iterator[tuple]:
    """Expose the mapping table (for tests / export back to torch names)."""
    if spec.family == "v8":
        return iter(yolov8_mapping(spec))
    return iter(yolov5_mapping(spec))


def _scdown_entries(src: str, dst: Tuple[str, ...]):
    return _convbn_entries(f"{src}.cv1", dst + ("cv1",)) + _convbn_entries(
        f"{src}.cv2", dst + ("cv2",)
    )


def _cib_entries(src: str, dst: Tuple[str, ...]):
    """CIB = 5-conv inverted block; ultralytics nests them under cv1.{j}."""
    out = []
    for j in range(5):
        out += _convbn_entries(f"{src}.cv1.{j}", dst + (f"cv{j}",))
    return out


def _c2fcib_entries(src: str, dst: str, n: int):
    out = _convbn_entries(f"{src}.cv1", (dst, "cv1"))
    out += _convbn_entries(f"{src}.cv2", (dst, "cv2"))
    for i in range(n):
        out += _cib_entries(f"{src}.m.{i}", (dst, f"m{i}"))
    return out


def _psa_entries(src: str, dst: Tuple[str, ...]):
    pairs = [
        ("cv1", "cv1"), ("cv2", "cv2"),
        ("attn.qkv", "attn_qkv"), ("attn.proj", "attn_proj"),
        ("attn.pe", "attn_pe"), ("ffn.0", "ffn1"), ("ffn.1", "ffn2"),
    ]
    out = []
    for s_name, d_name in pairs:
        out += _convbn_entries(f"{src}.{s_name}", dst + (d_name,))
    return out


def _v10_cls_entries(src: str, head: str, suffix: str, li: int):
    """v10Detect depthwise cls branch: {0,1} are Sequential(dw, pw)."""
    out = _convbn_entries(
        f"{src}.0.0", (head, f"cls{suffix}{li}_0a")
    )
    out += _convbn_entries(f"{src}.0.1", (head, f"cls{suffix}{li}_0b"))
    out += _convbn_entries(f"{src}.1.0", (head, f"cls{suffix}{li}_1a"))
    out += _convbn_entries(f"{src}.1.1", (head, f"cls{suffix}{li}_1b"))
    out += _plain_conv_entries(f"{src}.2", (head, f"cls{suffix}{li}_2"))
    return out


def yolov10_mapping(spec: YoloSpec) -> List[tuple]:
    """(src, collection, dst, transform) table for YOLOv10 n/s.

    Larger scales use RepVGGDW inside CIB and C2fCIB in the FPN, which
    this table does not cover yet.
    """
    if spec.scale not in ("n", "s"):
        raise NotImplementedError(
            "v10 checkpoint mapping covers scales n/s (larger scales use "
            "RepVGGDW blocks not yet modeled)"
        )
    d = spec.depths
    m = []
    net = lambda *p: ("net",) + p  # noqa: E731
    m += _convbn_entries("model.0", net("stem"))
    m += _convbn_entries("model.1", net("down1"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.2", "stage1", d[0])]
    m += _convbn_entries("model.3", net("down2"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.4", "stage2", d[1])]
    m += _scdown_entries("model.5", net("down3"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.6", "stage3", d[2])]
    m += _scdown_entries("model.7", net("down4"))
    if spec.scale == "n":
        m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.8", "stage4", d[3])]
    else:
        m += [(s, c, net(*p), t) for s, c, p, t in _c2fcib_entries("model.8", "stage4", d[3])]
    m += [(s, c, net(*p), t) for s, c, p, t in _sppf_entries("model.9", "sppf")]
    m += _psa_entries("model.10", net("psa"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.13", "fpn4", d[0])]
    m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.16", "fpn3", d[0])]
    m += _convbn_entries("model.17", net("pan3"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c2f_entries("model.19", "pan4", d[0])]
    m += _scdown_entries("model.20", net("pan5_down"))
    m += [(s, c, net(*p), t) for s, c, p, t in _c2fcib_entries("model.22", "pan5", d[0])]
    for li in range(3):
        for src_head, head, suffix in (
            ("model.23.cv2", "head_o2m", "m"),
            ("model.23.one2one_cv2", "head_o2o", "o"),
        ):
            m += _convbn_entries(
                f"{src_head}.{li}.0", (head, f"box{suffix}{li}_0")
            )
            m += _convbn_entries(
                f"{src_head}.{li}.1", (head, f"box{suffix}{li}_1")
            )
            m += _plain_conv_entries(
                f"{src_head}.{li}.2", (head, f"box{suffix}{li}_2")
            )
        m += _v10_cls_entries(f"model.23.cv3.{li}", "head_o2m", "m", li)
        m += _v10_cls_entries(
            f"model.23.one2one_cv3.{li}", "head_o2o", "o", li
        )
    return m
