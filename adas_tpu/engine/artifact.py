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
    return build_fused_artifact_multi(
        lambda hw: step_fn,
        [tuple(frame_shape)[:2]],
        out_path,
        channels=int(frame_shape[2]),
        frame_dtype=frame_dtype,
        platforms=platforms,
        meta=meta,
    )


def build_fused_artifact_multi(
    step_for,
    frame_hws: Sequence[Sequence[int]],
    out_path: str,
    channels: int = 3,
    frame_dtype=jnp.uint8,
    platforms: Optional[Sequence[str]] = None,
    meta: Optional[dict] = None,
    meta_for=None,
) -> dict:
    """Multi-geometry fused artifact: one serialized engine covering N
    source-frame shapes, the way the reference's extension dispatch
    covers any file the engine was built for (coreEngine.py:120-157
    loads whatever bindings the .trt bakes; TRT optimization profiles
    are the same idea).  ``step_for((h, w))`` returns the fused step
    specialized to that geometry (letterbox constants etc. baked per
    graph); ``CompiledEngine.run_device`` picks the graph matching the
    incoming frame's shape at call time — a 720p and a 1080p feed serve
    from ONE ``.adas`` file.

    ``meta_for((h, w))``: optional per-geometry metadata (e.g. a pack
    spec recorded during that geometry's trace)."""
    geoms = []
    blobs = {}
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    for hw in frame_hws:
        h, w = int(hw[0]), int(hw[1])
        fn = step_for((h, w))
        spec = jax.ShapeDtypeStruct((h, w, channels), frame_dtype)
        exp = jax_export.export(jax.jit(fn), **kwargs)(spec)
        outs = jax.eval_shape(fn, spec)
        out_leaves, _ = jax.tree_util.tree_flatten(outs)
        entry = {
            "frame_shape": [h, w, channels],
            "output_shapes": [
                [int(d) for d in o.shape] for o in out_leaves
            ],
            "output_dtypes": [str(o.dtype) for o in out_leaves],
            "output_names": _leaf_names(outs),
        }
        if meta_for is not None:
            entry.update(meta_for((h, w)))
        geoms.append(entry)
        blobs[f"graphs/{h}x{w}.bin"] = exp.serialize()
    first = geoms[0]
    h0, w0, c0 = first["frame_shape"]
    metadata = {
        "format_version": FORMAT_VERSION,
        "fused": True,
        # legacy single-geometry fields mirror the FIRST geometry so
        # older readers keep working; "geometries" is authoritative
        "frame_shape": first["frame_shape"],
        "input_shape_nchw": [1, c0, h0, w0],
        "input_dtype": str(np.dtype(frame_dtype)),
        "output_shapes": first["output_shapes"],
        "output_dtypes": first["output_dtypes"],
        "output_names": first["output_names"],
        "geometries": geoms,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        **(meta or {}),
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, blob in blobs.items():
            zf.writestr(name, blob)
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


def _tree_to_json(t):
    """Pytree-of-ints -> JSON-able descriptor (tuples/lists tagged so
    the container type survives the round trip)."""
    if isinstance(t, tuple):
        return {"__tuple__": [_tree_to_json(x) for x in t]}
    if isinstance(t, list):
        return {"__list__": [_tree_to_json(x) for x in t]}
    if isinstance(t, dict):
        return {k: _tree_to_json(v) for k, v in t.items()}
    return int(t)


def _tree_from_json(j):
    if isinstance(j, dict):
        if "__tuple__" in j and len(j) == 1:
            return tuple(_tree_from_json(x) for x in j["__tuple__"])
        if "__list__" in j and len(j) == 1:
            return [_tree_from_json(x) for x in j["__list__"]]
        return {k: _tree_from_json(v) for k, v in j.items()}
    return int(j)


def pack_tree_meta(pack_spec) -> dict:
    """Serialize an ``ops.packing`` spec of ANY pytree shape (dicts,
    tuples, nests) into artifact metadata; inverse of
    :func:`pack_spec_from_meta`.  ``pack_spec_meta`` above predates this
    and handles flat dicts only (kept for the facade artifacts' stable
    meta layout)."""
    treedef, shapes = pack_spec
    indexed = treedef.unflatten(list(range(treedef.num_leaves)))
    return {
        "pack_tree": {
            "tree": _tree_to_json(indexed),
            "shapes": [[int(d) for d in s] for s, _ in shapes],
            "dtypes": [str(d) for _, d in shapes],
        }
    }


def pack_spec_from_meta(meta: dict):
    """Rebuild the (treedef, [(shape, dtype), ...]) spec ``ops.packing``
    consumes from :func:`pack_tree_meta` metadata."""
    m = meta["pack_tree"]
    template = _tree_from_json(m["tree"])
    treedef = jax.tree_util.tree_structure(template)
    shapes = [
        (tuple(s), np.dtype(d))
        for s, d in zip(m["shapes"], m["dtypes"])
    ]
    return treedef, shapes


def build_step_artifact(
    fn,
    input_spec,
    out_path: str,
    platforms: Optional[Sequence[str]] = None,
    meta: Optional[dict] = None,
) -> dict:
    """Serialize an arbitrary single-input jitted step with its weights
    baked in — the generalization of the facade fused artifacts beyond
    ``(h, w, c)`` frames.  Used for the PIPELINE-scale artifact: the
    whole batched multistream step (uint8 transport batch → packed
    outputs for N streams) becomes one ``.adas`` file, where TensorRT
    builds one engine per model (convertOnnxToTensorRT.py:150-173) and
    leaves the pipeline in Python.  ``frame_shape`` in the metadata
    carries the full baked input shape (any rank);
    ``CompiledEngine.run_device`` dispatches on it."""
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exp = jax_export.export(jax.jit(fn), **kwargs)(input_spec)
    outs = jax.eval_shape(fn, input_spec)
    out_leaves, _ = jax.tree_util.tree_flatten(outs)
    metadata = {
        "format_version": FORMAT_VERSION,
        "fused": True,
        "frame_shape": [int(d) for d in input_spec.shape],
        "input_dtype": str(np.dtype(input_spec.dtype)),
        "output_shapes": [[int(d) for d in o.shape] for o in out_leaves],
        "output_dtypes": [str(o.dtype) for o in out_leaves],
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        **(meta or {}),
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("graph.bin", exp.serialize())
        zf.writestr("meta.json", json.dumps(metadata, indent=2))
    return metadata


def check_fused_frame(engine, srcimg: np.ndarray) -> jnp.ndarray:
    """Validate a source frame against a fused artifact's baked shapes.

    Fused engines are shape-specialized like TRT bindings/optimization
    profiles — the letterbox geometry / decode rescale per frame shape
    is a constant in each serialized graph; multi-geometry artifacts
    carry one graph per shape and dispatch at call time."""
    shapes = engine.fused_shapes
    if tuple(srcimg.shape) not in shapes:
        raise ValueError(
            f"fused engine was built for frame shape(s) "
            f"{sorted(shapes)}, got {tuple(srcimg.shape)}; rebuild with "
            f"export_fused(frame_hw=[..., {tuple(srcimg.shape[:2])}])"
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
            names = zf.namelist()
            self._calls = {}
            if "graph.bin" in names:  # single-geometry layout
                exported = jax_export.deserialize(zf.read("graph.bin"))
                # non-fused artifacts key on the NCHW engine binding;
                # fused ones on the baked source-frame shape
                shape = self._meta.get("frame_shape")
                if shape is None:
                    n, c, h, w = self._meta["input_shape_nchw"]
                    shape = (h, w, c)
                self._calls[tuple(shape)] = jax.jit(exported.call)
                self._exported = exported
            else:
                for g in self._meta.get("geometries", []):
                    h, w, c = g["frame_shape"]
                    exported = jax_export.deserialize(
                        zf.read(f"graphs/{h}x{w}.bin")
                    )
                    self._calls[(h, w, c)] = jax.jit(exported.call)
                self._exported = None
        self.providers = ",".join(self._meta["platforms"])
        self._call = next(iter(self._calls.values()))

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
    def fused_shapes(self):
        """The source-frame shapes this fused artifact serves (one graph
        per geometry — TRT optimization-profile analogue)."""
        return set(self._calls.keys())

    def geometry_meta(self, frame_shape) -> dict:
        """Per-geometry metadata entry (falls back to the artifact-level
        fields for single-geometry files)."""
        for g in self._meta.get("geometries", []):
            if tuple(g["frame_shape"]) == tuple(frame_shape):
                return g
        return self._meta

    @property
    def engine_dtype(self):
        d = self._meta["input_dtype"]
        if d == "uint8":
            return np.uint8
        return np.float16 if d == "float16" else np.float32

    def run_device(self, nhwc_batch):
        """Execute on device; multi-geometry artifacts dispatch on the
        input's shape (the runtime analogue of picking a TRT
        optimization profile)."""
        call = self._calls.get(tuple(nhwc_batch.shape), self._call)
        return call(nhwc_batch)

    def engine_inference(self, input_tensor: np.ndarray) -> List[np.ndarray]:
        nhwc = jnp.asarray(np.transpose(input_tensor, (0, 2, 3, 1)))
        outs = self._call(nhwc)
        leaves = jax.tree_util.tree_leaves(outs)
        return [np.asarray(leaf) for leaf in leaves]
