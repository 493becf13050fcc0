"""Serialized engine artifacts: the ``.trt``-file equivalent.

The reference's offline toolchain builds a serialized TensorRT engine from
ONNX (convertOnnxToTensorRT.py:150-179) which coreEngine.py deserializes
at startup.  The TPU-native artifact is a zip holding:

* ``graph.bin`` — ``jax.export`` StableHLO of the jitted forward with the
  weights baked in as constants (exactly what a .trt engine is), per
  target platform;
* ``meta.json`` — I/O shapes/dtypes, model identity, build flags.

``CompiledEngine`` loads one and implements the ``EngineBase`` protocol,
so detectors can swap native-graph ↔ artifact execution the way the
reference swaps ONNX ↔ TRT by file extension.
"""
from __future__ import annotations

import io
import json
import zipfile
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .base import EngineBase

ENGINE_EXT = ".adas"
FORMAT_VERSION = 1


def build_artifact(
    apply_fn,
    variables,
    input_shape_nchw: Sequence[int],
    out_path: str,
    dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
    meta: Optional[dict] = None,
) -> dict:
    """AOT-export ``apply_fn(variables, nhwc)`` with weights baked in.

    Accepts the reference's NCHW shape convention at the boundary; the
    graph itself is NHWC (TPU layout).  Returns the metadata written.
    """
    n, c, h, w = input_shape_nchw
    spec = jax.ShapeDtypeStruct((n, h, w, c), dtype)

    def fn(x):
        return apply_fn(variables, x)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exp = jax_export.export(jax.jit(fn), **kwargs)(spec)

    outs = jax.eval_shape(fn, spec)
    out_leaves, treedef = jax.tree_util.tree_flatten(outs)
    out_names = _leaf_names(outs)
    metadata = {
        "format_version": FORMAT_VERSION,
        "input_shape_nchw": [int(v) for v in input_shape_nchw],
        "input_dtype": str(np.dtype(dtype) if dtype != jnp.bfloat16 else "bfloat16"),
        "output_shapes": [[int(d) for d in o.shape] for o in out_leaves],
        "output_dtypes": [str(o.dtype) for o in out_leaves],
        "output_names": out_names,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        **(meta or {}),
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("graph.bin", exp.serialize())
        zf.writestr("meta.json", json.dumps(metadata, indent=2))
    return metadata


def _leaf_names(outs) -> List[str]:
    if isinstance(outs, dict):
        return list(outs.keys())
    leaves = jax.tree_util.tree_leaves(outs)
    return [f"output{i}" for i in range(len(leaves))]


class CompiledEngine(EngineBase):
    """Executes a serialized ``.adas`` artifact (EngineBase protocol)."""

    framework_type = "xla-aot"

    def __init__(self, model_path: str):
        with zipfile.ZipFile(model_path) as zf:
            self._meta = json.loads(zf.read("meta.json"))
            self._exported = jax_export.deserialize(zf.read("graph.bin"))
        self.providers = ",".join(self._meta["platforms"])
        self._call = jax.jit(self._exported.call)

    @property
    def meta(self) -> dict:
        return self._meta

    def get_engine_input_shape(self) -> Sequence[int]:
        return self._meta["input_shape_nchw"]

    def get_engine_output_shape(self) -> Tuple[List[Sequence[int]], List[str]]:
        return self._meta["output_shapes"], self._meta["output_names"]

    @property
    def engine_dtype(self):
        d = self._meta["input_dtype"]
        return np.float16 if d == "float16" else np.float32

    def run_device(self, nhwc_batch):
        return self._call(nhwc_batch)

    def engine_inference(self, input_tensor: np.ndarray) -> List[np.ndarray]:
        nhwc = jnp.asarray(np.transpose(input_tensor, (0, 2, 3, 1)))
        outs = self._call(nhwc)
        leaves = jax.tree_util.tree_leaves(outs)
        return [np.asarray(leaf) for leaf in leaves]
