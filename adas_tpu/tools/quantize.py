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

    merged = dict(variables)
    for x in sample_inputs:
        with quantized("int8_calib"):
            _, upd = apply_fn(merged, x)
        scales = upd["act_scales"]
        prev = merged.get("act_scales")
        if prev is not None:
            scales = jax.tree_util.tree_map(jnp.maximum, prev, scales)
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
        help="int8 only: registry model name (e.g. YOLOV8) to run N "
        "random calibration frames through, baking static act_scales "
        "into the output (the reference's TRT Calibrator contract; "
        "feed real frames via the facade calibrate_int8 API instead "
        "when you have them)",
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
