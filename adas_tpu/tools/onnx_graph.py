"""Full ONNX graph parsing (nodes + attributes + I/O), no onnx package.

Extends the initializer-only reader (onnx_import.py) to the complete
``ModelProto`` surface the graph executor needs: nodes with attributes,
graph inputs/outputs with static shapes, and the opset version.  This is
the structure behind the reference's ``OnnxEngine``
(/root/reference/coreEngine.py:159-186), which executes arbitrary
exported ``.onnx`` files; ``adas_tpu.engine.onnx_engine`` interprets the
parsed graph into a jitted XLA computation.

Field numbers per the public onnx.proto3 schema (same source as
onnx_import.py):
  ModelProto: ir_version=1, graph=7, opset_import=8
  OperatorSetIdProto: domain=1, version=2
  GraphProto: node=1, name=2, initializer=5, input=11, output=12
  NodeProto: input=1, output=2, name=3, op_type=4, attribute=5, domain=7
  AttributeProto: name=1, f=2, i=3, s=4, t=5, g=6, floats=7, ints=8,
                  strings=9, type=20
  ValueInfoProto: name=1, type=2
  TypeProto: tensor_type=1;  Tensor: elem_type=1, shape=2
  TensorShapeProto: dim=1;  Dimension: dim_value=1, dim_param=2
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .onnx_import import _DTYPES, _fields, _parse_tensor, _zigzag_signed


@dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    attrs: Dict[str, object]
    name: str = ""


@dataclass
class OnnxValueInfo:
    name: str
    elem_type: int = 1  # TensorProto.DataType; 1 = float32
    #: dims; None entries are symbolic (dim_param / absent)
    shape: Optional[List[Optional[int]]] = None

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(_DTYPES.get(self.elem_type, np.float32))


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode] = field(default_factory=list)
    initializers: Dict[str, np.ndarray] = field(default_factory=dict)
    inputs: List[OnnxValueInfo] = field(default_factory=list)
    outputs: List[OnnxValueInfo] = field(default_factory=list)
    name: str = ""

    @property
    def data_inputs(self) -> List[OnnxValueInfo]:
        """Graph inputs that are fed at runtime (not initializers —
        pre-IR4 exporters list weights as inputs too)."""
        return [v for v in self.inputs if v.name not in self.initializers]


@dataclass
class OnnxModel:
    graph: OnnxGraph
    opset: int = 13  # default-domain opset version
    ir_version: int = 8


def _parse_attribute(buf: bytes) -> Tuple[str, object]:
    name = ""
    atype = 0
    f_val = None
    i_val = None
    s_val = None
    t_val = None
    floats: List[float] = []
    ints: List[int] = []
    strings: List[bytes] = []
    for fnum, wire, value in _fields(buf):
        if fnum == 1 and wire == 2:
            name = value.decode("utf-8")
        elif fnum == 20 and wire == 0:
            atype = value
        elif fnum == 2 and wire == 5:
            f_val = float(np.frombuffer(value, "<f4")[0])
        elif fnum == 3 and wire == 0:
            i_val = _zigzag_signed(value)
        elif fnum == 4 and wire == 2:
            s_val = value
        elif fnum == 5 and wire == 2:
            t_val = _parse_tensor(value)[1]
        elif fnum == 7:
            if wire == 5:
                floats.append(float(np.frombuffer(value, "<f4")[0]))
            else:
                floats.extend(np.frombuffer(value, "<f4").tolist())
        elif fnum == 8:
            if wire == 0:
                ints.append(_zigzag_signed(value))
            else:
                # packed varints
                pos = 0
                while pos < len(value):
                    v = 0
                    shift = 0
                    while True:
                        b = value[pos]
                        pos += 1
                        v |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                    ints.append(_zigzag_signed(v))
        elif fnum == 9 and wire == 2:
            strings.append(value)
        # fnum 6 (subgraph) intentionally unsupported: If/Loop bodies are
        # rejected at execution time with a clear error.

    # AttributeProto.type disambiguates empty lists; fall back on presence
    if atype == 1 or (atype == 0 and f_val is not None):
        return name, f_val
    if atype == 2 or (atype == 0 and i_val is not None):
        return name, i_val
    if atype == 3 or (atype == 0 and s_val is not None):
        return name, s_val.decode("utf-8", "replace")
    if atype == 4 or (atype == 0 and t_val is not None):
        return name, t_val
    if atype == 6 or floats:
        return name, list(floats)
    if atype == 7 or ints:
        return name, list(ints)
    if atype == 8 or strings:
        return name, [s.decode("utf-8", "replace") for s in strings]
    if atype == 3:
        return name, ""
    return name, None


def _parse_node(buf: bytes) -> OnnxNode:
    inputs: List[str] = []
    outputs: List[str] = []
    op_type = ""
    name = ""
    attrs: Dict[str, object] = {}
    for fnum, wire, value in _fields(buf):
        if fnum == 1 and wire == 2:
            inputs.append(value.decode("utf-8"))
        elif fnum == 2 and wire == 2:
            outputs.append(value.decode("utf-8"))
        elif fnum == 3 and wire == 2:
            name = value.decode("utf-8")
        elif fnum == 4 and wire == 2:
            op_type = value.decode("utf-8")
        elif fnum == 5 and wire == 2:
            k, v = _parse_attribute(value)
            attrs[k] = v
    return OnnxNode(op_type, inputs, outputs, attrs, name)


def _parse_value_info(buf: bytes) -> OnnxValueInfo:
    name = ""
    elem_type = 1
    shape: Optional[List[Optional[int]]] = None
    for fnum, wire, value in _fields(buf):
        if fnum == 1 and wire == 2:
            name = value.decode("utf-8")
        elif fnum == 2 and wire == 2:  # TypeProto
            for f2, w2, v2 in _fields(value):
                if f2 == 1 and w2 == 2:  # tensor_type
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            elem_type = v3
                        elif f3 == 2 and w3 == 2:  # TensorShapeProto
                            shape = []
                            for f4, w4, v4 in _fields(v3):
                                if f4 == 1 and w4 == 2:  # Dimension
                                    dim: Optional[int] = None
                                    for f5, w5, v5 in _fields(v4):
                                        if f5 == 1 and w5 == 0:
                                            dim = _zigzag_signed(v5)
                                    shape.append(dim)
    return OnnxValueInfo(name, elem_type, shape)


def _parse_graph(buf: bytes) -> OnnxGraph:
    g = OnnxGraph()
    for fnum, wire, value in _fields(buf):
        if fnum == 1 and wire == 2:
            g.nodes.append(_parse_node(value))
        elif fnum == 2 and wire == 2:
            g.name = value.decode("utf-8")
        elif fnum == 5 and wire == 2:
            name, arr = _parse_tensor(value)
            g.initializers[name] = arr
        elif fnum == 11 and wire == 2:
            g.inputs.append(_parse_value_info(value))
        elif fnum == 12 and wire == 2:
            g.outputs.append(_parse_value_info(value))
    return g


def parse_onnx(path_or_bytes) -> OnnxModel:
    """Parse a ``.onnx`` file (or its bytes) into an ``OnnxModel``."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    graph = None
    opset = 13
    ir_version = 8
    for fnum, wire, value in _fields(buf):
        if fnum == 1 and wire == 0:
            ir_version = value
        elif fnum == 7 and wire == 2:
            graph = _parse_graph(value)
        elif fnum == 8 and wire == 2:  # OperatorSetIdProto
            domain = ""
            version = None
            for f2, w2, v2 in _fields(value):
                if f2 == 1 and w2 == 2:
                    domain = v2.decode("utf-8")
                elif f2 == 2 and w2 == 0:
                    version = v2
            if domain in ("", "ai.onnx") and version is not None:
                opset = version
    if graph is None:
        raise ValueError("no GraphProto found in model")
    return OnnxModel(graph=graph, opset=opset, ir_version=ir_version)


def toposort(graph: OnnxGraph) -> List[OnnxNode]:
    """Topologically sort nodes by tensor dependencies.  The ONNX spec
    requires sorted graphs but some exporters violate it; executing out
    of order would mis-resolve tensors."""
    produced = set(graph.initializers)
    produced.update(v.name for v in graph.inputs)
    produced.add("")  # optional (absent) inputs
    remaining = list(graph.nodes)
    ordered: List[OnnxNode] = []
    while remaining:
        progress = False
        deferred = []
        for node in remaining:
            if all(i in produced for i in node.inputs):
                ordered.append(node)
                produced.update(node.outputs)
                progress = True
            else:
                deferred.append(node)
        if not progress:
            missing = {
                i
                for node in deferred
                for i in node.inputs
                if i not in produced
            }
            raise ValueError(
                f"graph has unresolvable inputs (cycle or dangling): "
                f"{sorted(missing)[:5]}"
            )
        remaining = deferred
    return ordered
