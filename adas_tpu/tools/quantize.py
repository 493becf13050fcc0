"""Model quantization: fp16/bf16 casts and weight-only int8.

Capability parity with the reference's ONNX fp16 converter
(onnxQuantization.py:20-40) plus the int8 path its TensorRT builder
sketches but never enables (convertOnnxToTensorRT.py:28-99): here fp16/
bf16 are straight dtype casts of the weight pytree, and int8 is symmetric
per-output-channel weight quantization with scales stored alongside, so
loading dequantizes to the requested compute dtype.  On TPU, bf16 is the
preferred serving dtype (MXU-native); fp16 is kept for artifact parity.

CLI (mirror of ``python onnxQuantization.py -i model.onnx``):
    python -m adas_tpu.tools.quantize -i weights.npz --mode bf16
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Tuple

import jax
import numpy as np

from .params_io import flatten_variables, load_params, save_params, unflatten_variables

_CAST_DTYPES = {
    "fp16": np.float16,
    "bf16": "bfloat16",
    "fp32": np.float32,
}


def cast_params(variables: dict, mode: str) -> dict:
    """Cast every floating leaf to the target dtype (fp16/bf16/fp32)."""
    import jax.numpy as jnp

    dtype = jnp.dtype(_CAST_DTYPES[mode])

    def cast(leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) or arr.dtype == jnp.bfloat16:
            return arr.astype(dtype)
        return arr

    return jax.tree_util.tree_map(cast, variables)


def quantize_int8(
    variables: dict, min_size: int = 1024
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Weight-only symmetric int8 over the last axis (output channels).

    Returns (flat_int8_tree, scales); leaves smaller than ``min_size``
    elements (biases, BN stats) stay fp32 — they are bandwidth-irrelevant.
    """
    flat = flatten_variables(variables)
    q: Dict[str, np.ndarray] = {}
    scales: Dict[str, np.ndarray] = {}
    for name, value in flat.items():
        arr = np.asarray(value)
        if (
            np.issubdtype(arr.dtype, np.floating)
            and arr.size >= min_size
            and arr.ndim >= 2
        ):
            absmax = np.abs(arr).max(
                axis=tuple(range(arr.ndim - 1)), keepdims=True
            )
            scale = np.where(absmax > 0, absmax / 127.0, 1.0)
            q[name] = np.clip(
                np.round(arr / scale), -127, 127
            ).astype(np.int8)
            scales[name] = scale.astype(np.float32)
        else:
            q[name] = arr
    return q, scales


def dequantize_int8(
    q: Dict[str, np.ndarray],
    scales: Dict[str, np.ndarray],
    dtype=np.float32,
) -> dict:
    """Inverse of :func:`quantize_int8`, back to a variables pytree."""
    flat = {}
    for name, value in q.items():
        if name in scales:
            flat[name] = (value.astype(np.float32) * scales[name]).astype(
                dtype
            )
        else:
            flat[name] = value
    return unflatten_variables(flat)


def save_int8(path: str, variables: dict) -> None:
    q, scales = quantize_int8(variables)
    payload = {f"q::{k}": v for k, v in q.items()}
    payload.update({f"s::{k}": v for k, v in scales.items()})
    np.savez_compressed(path, **payload)


def load_int8(path: str, dtype=np.float32) -> dict:
    data = np.load(path)
    q = {k[3:]: data[k] for k in data.files if k.startswith("q::")}
    scales = {k[3:]: data[k] for k in data.files if k.startswith("s::")}
    return dequantize_int8(q, scales, dtype=dtype)


def _copy_tree(tree) -> dict:
    """Nested-dict shallow copy (leaves shared), FrozenDict-tolerant."""
    return {
        k: _copy_tree(v) if hasattr(v, "items") else v
        for k, v in tree.items()
    }


def pack_int8_weights(apply_fn, variables: dict) -> dict:
    """Pre-quantize every Int8Conv kernel at LOAD time — the engine-build
    step the reference performs offline in TensorRT
    (convertOnnxToTensorRT.py:150-173), here applied to the weight tree.

    Discovers which param-tree kernels feed int8 convs by abstractly
    tracing ``apply_fn(variables)`` under ``quantized("int8_pack")`` with
    ``jax.eval_shape`` (zero FLOPs, no compile — each Int8Conv records
    its weight-scale SHAPE into the mutable ``wscales`` collection), then
    rewrites exactly those kernels to int8 with per-output-channel scales
    stored in a parallel ``wscales`` collection.  Serving then reads 4x
    fewer weight bytes and runs no per-step weight quantize; f32 heads
    and int8-ineligible (depthwise/stem) kernels stay untouched.

    ``apply_fn(variables)`` must run the net's apply with
    ``mutable=["wscales"]`` on a representative input, returning
    ``(out, updates)``.  The host math here matches the in-graph
    fallback (layers.int8_weight_qparams) bit for bit.
    """
    from ..models.layers import quantized

    with quantized("int8_pack"):
        _, upd = jax.eval_shape(apply_fn, variables)
    upd = dict(upd)
    if "wscales" not in upd:
        return variables
    paths = []

    def walk(tree, path=()):
        for k, v in tree.items():
            if hasattr(v, "items"):
                walk(v, path + (k,))
            elif k == "wscale":
                paths.append(path)

    walk(upd["wscales"])
    params = _copy_tree(variables["params"])
    wscales: dict = {}
    for path in paths:
        node = params
        for k in path:
            node = node[k]
        kern = np.asarray(node["kernel"])
        if kern.dtype == np.int8:  # already packed (loaded store)
            continue
        kern = kern.astype(np.float32)
        absmax = np.abs(kern).max(axis=tuple(range(kern.ndim - 1)))
        scale = (np.maximum(absmax, 1e-8) / 127.0).astype(np.float32)
        node["kernel"] = np.clip(
            np.round(kern / scale), -127, 127
        ).astype(np.int8)
        wnode = wscales
        for k in path:
            wnode = wnode.setdefault(k, {})
        wnode["wscale"] = scale
    out = dict(variables)
    out["params"] = params
    if wscales or "wscales" in out:
        prev = _copy_tree(out.get("wscales", {}))
        _merge_trees(prev, wscales)
        out["wscales"] = prev
    return out


def _merge_trees(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if hasattr(v, "items"):
            _merge_trees(dst.setdefault(k, {}), v)
        else:
            dst[k] = v


def calibrate_act_scales(apply_fn, variables: dict, sample_inputs) -> dict:
    """Static-activation-scale calibration — the TensorRT int8 calibrator
    the reference sketches but never ships (convertOnnxToTensorRT.py:
    28-99, ``Calibrator`` commented out).

    Runs each sample through ``apply_fn(variables, x, mutable=...)``
    under ``quantized("int8_calib")``; every Int8Conv records the running
    absmax of its input into an ``act_scales`` collection.  Returns
    ``variables`` with that collection merged in — serving the result
    under ``quantized("int8")`` then uses STATIC scales, removing the
    per-conv global-reduce (dynamic absmax) from the critical path.
    """
    import jax.numpy as jnp

    from ..models.layers import quantized

    # jit the calibration step: unjitted, every op is its own dispatch —
    # minutes over a ~30 ms-latency tunnel.  Entering quantized() inside
    # the traced fn bakes the calib path into the compilation; the tree
    # gains the act_scales collection after sample 1, triggering exactly
    # one retrace.
    def _calib_step(v, x):
        with quantized("int8_calib"):
            return apply_fn(v, x)

    jitted = jax.jit(_calib_step)

    def _union_max(prev, new):
        """Per-leaf union of two act_scales trees, jnp.maximum on common
        leaves.  The trees can differ STRUCTURALLY: a store calibrated
        before s8 chaining existed (or with chaining off) holds only
        "xmax" leaves, while the new pass also records producer "ymax"
        scales — tree_map over mismatched dicts would raise."""
        if not hasattr(prev, "items") or not hasattr(new, "items"):
            return jnp.maximum(prev, new)
        out = dict(prev)
        for k, v in new.items():
            out[k] = _union_max(prev[k], v) if k in prev else v
        return out

    merged = dict(variables)
    for x in sample_inputs:
        _, upd = jitted(merged, x)
        scales = upd["act_scales"]
        prev = merged.get("act_scales")
        if prev is not None:
            scales = _union_max(prev, scales)
        merged["act_scales"] = scales
    return merged


def main() -> None:
    ap = argparse.ArgumentParser(description="Quantize a .npz weight store")
    ap.add_argument("-i", "--input", required=True, help="input .npz")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument(
        "--mode", choices=["fp16", "bf16", "int8"], default="fp16"
    )
    ap.add_argument(
        "--calibrate", default=None, metavar="MODEL",
        help="int8 only: registry model name (e.g. YOLOV8) to run "
        "calibration frames through, baking static act_scales into the "
        "output (the reference's TRT Calibrator contract).  Pass real "
        "frames with --calib-dir; without it, N(0,1) synthetic frames "
        "are used and the scales are PLACEHOLDERS (a warning is "
        "printed) — real activations may clip at serve time",
    )
    ap.add_argument(
        "--calib-dir", default=None, metavar="DIR",
        help="directory of real image files (.jpg/.png/.bmp) to "
        "calibrate on — preprocessed through the model's own input "
        "path, like TRT's Calibrator batch stream",
    )
    ap.add_argument("--calib-frames", type=int, default=8)
    ap.add_argument("--scale", default="n", help="model scale for --calibrate")
    args = ap.parse_args()
    variables = load_params(args.input)
    stem = os.path.splitext(args.input)[0]
    out = args.output or f"{stem}_{args.mode}.npz"
    if args.mode == "int8":
        if args.calibrate:
            import jax.numpy as jnp

            from ..engine.registry import build as registry_build

            entry = registry_build(args.calibrate, scale=args.scale)
            _, _, h, w = entry.input_shape_nchw
            if args.calib_dir:
                import cv2

                files = sorted(
                    f for f in os.listdir(args.calib_dir)
                    if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
                )[: args.calib_frames]
                if not files:
                    raise SystemExit(
                        f"--calib-dir {args.calib_dir}: no image files"
                    )
                from ..ops.preprocess import (
                    LetterboxGeometry, yolo_preprocess,
                )

                samples = []
                for f in files:
                    img = cv2.imread(os.path.join(args.calib_dir, f))
                    geom = LetterboxGeometry(
                        img.shape[0], img.shape[1], h, w
                    )
                    samples.append(
                        yolo_preprocess(
                            jnp.asarray(img)[None], geom,
                            dtype=jnp.float32,
                        )
                    )
            else:
                print(
                    "WARNING: calibrating on synthetic N(0,1) frames — "
                    "the baked act_scales are placeholders; pass "
                    "--calib-dir with real frames (or use the facade "
                    "calibrate_int8 API) for production scales",
                )
                rng = np.random.default_rng(0)
                samples = [
                    jnp.asarray(
                        rng.standard_normal((1, h, w, 3)), jnp.float32
                    )
                    for _ in range(args.calib_frames)
                ]
            variables = calibrate_act_scales(
                lambda v, x: entry.net.apply(
                    v, x, mutable=["act_scales"]
                ),
                variables, samples,
            )
        save_int8(out, variables)
    else:
        save_params(out, cast_params(variables, args.mode))
    print(f"saved {out}")


if __name__ == "__main__":
    main()
