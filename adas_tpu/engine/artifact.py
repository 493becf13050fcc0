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


def build_fused_artifact(
    step_fn,
    frame_shape: Sequence[int],
    out_path: str,
    frame_dtype=jnp.uint8,
    platforms: Optional[Sequence[str]] = None,
    meta: Optional[dict] = None,
) -> dict:
    """AOT-export a detector's FUSED step: raw uint8 frame in, decoded
    compact tensors out — preprocess + network + decode in one graph.

    This is what a ``.trt`` engine should have been for serving: the
    reference's engine call is one h2d → execute → d2h round-trip
    (coreEngine.py:93-118), whereas a bare-network artifact forces the
    facade to preprocess on device, fetch, re-upload and decode (3-4
    round-trips per frame).  A fused artifact restores the single
    round-trip: ``CompiledEngine.run_device(frame)`` returns the final
    packed outputs.

    ``step_fn(frame)`` must close over its weights (they are baked into
    the StableHLO as constants, exactly like a TRT engine).
    """
    h, w, c = (int(v) for v in frame_shape)
    spec = jax.ShapeDtypeStruct((h, w, c), frame_dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exp = jax_export.export(jax.jit(step_fn), **kwargs)(spec)

    outs = jax.eval_shape(step_fn, spec)
    out_leaves, _ = jax.tree_util.tree_flatten(outs)
    metadata = {
        "format_version": FORMAT_VERSION,
        "fused": True,
        "frame_shape": [h, w, c],
        "input_shape_nchw": [1, c, h, w],
        "input_dtype": str(np.dtype(frame_dtype)),
        "output_shapes": [[int(d) for d in o.shape] for o in out_leaves],
        "output_dtypes": [str(o.dtype) for o in out_leaves],
        "output_names": _leaf_names(outs),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        **(meta or {}),
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("graph.bin", exp.serialize())
        zf.writestr("meta.json", json.dumps(metadata, indent=2))
    return metadata


def pack_spec_meta(pack_spec) -> dict:
    """Serialize an ``ops.packing`` spec (treedef of a flat dict +
    per-leaf shape/dtype) into JSON-able artifact metadata."""
    treedef, shapes = pack_spec
    indexed = treedef.unflatten(range(treedef.num_leaves))
    keys = sorted(indexed, key=lambda k: indexed[k])  # keys[i] <-> leaf i
    return {
        "pack": {
            "keys": keys,
            "shapes": [[int(d) for d in s] for s, _ in shapes],
            "dtypes": [str(np.dtype(d)) for _, d in shapes],
        }
    }


def check_fused_frame(engine, srcimg: np.ndarray) -> jnp.ndarray:
    """Validate a source frame against a fused artifact's baked shape.

    Fused engines are shape-specialized like TRT fixed bindings — the
    letterbox geometry / decode rescale for exactly one frame shape is
    a constant in the graph."""
    expect = tuple(engine.meta["frame_shape"])
    if tuple(srcimg.shape) != expect:
        raise ValueError(
            f"fused engine was built for frame shape {expect}, got "
            f"{tuple(srcimg.shape)}; rebuild with export_fused(frame_hw="
            f"{tuple(srcimg.shape[:2])})"
        )
    return jnp.asarray(srcimg)


def unpack_from_meta(flat: np.ndarray, pack_meta: dict) -> dict:
    """Host-side inverse of ``pack`` driven by artifact metadata."""
    flat = np.asarray(flat)
    out, off = {}, 0
    for key, shape, dtype in zip(
        pack_meta["keys"], pack_meta["shapes"], pack_meta["dtypes"]
    ):
        n = int(np.prod(shape)) if shape else 1
        out[key] = flat[off : off + n].reshape(shape).astype(dtype)
        off += n
    return out


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
    def fused(self) -> bool:
        """True when the artifact bakes preprocess+net+decode into one
        graph (built by ``build_fused_artifact``): serve it with a single
        ``run_device(frame)`` — one upload, one fetch."""
        return bool(self._meta.get("fused", False))

    @property
    def engine_dtype(self):
        d = self._meta["input_dtype"]
        if d == "uint8":
            return np.uint8
        return np.float16 if d == "float16" else np.float32

    def run_device(self, nhwc_batch):
        return self._call(nhwc_batch)

    def engine_inference(self, input_tensor: np.ndarray) -> List[np.ndarray]:
        nhwc = jnp.asarray(np.transpose(input_tensor, (0, 2, 3, 1)))
        outs = self._call(nhwc)
        leaves = jax.tree_util.tree_leaves(outs)
        return [np.asarray(leaf) for leaf in leaves]
