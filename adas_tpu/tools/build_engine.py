"""Engine-builder CLI: model graph + weights → serialized ``.adas`` artifact.

Mirror of the reference TRT builder CLI
(``convertOnnxToTensorRT.py -i x.onnx -o x.trt``, :19-23,150-179)
including its network-description dump and fp16 build flag:

    python -m adas_tpu.tools.build_engine \
        -t YOLOV8 --scale n --height 640 --width 640 \
        -w yolov8n.npz -o yolov8n.adas --fp16
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..engine.artifact import build_artifact


def _build_net(args):
    from ..engine.registry import build

    entry = build(
        args.type,
        scale=args.scale,
        height=args.height,
        width=args.width,
        num_classes=args.num_classes,
    )
    return entry.net, entry.input_shape_nchw, entry.meta


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Build a serialized XLA engine artifact"
    )
    ap.add_argument("-t", "--type", required=True,
                    help="model type enum name, e.g. YOLOV8 / UFLDV2_CULANE")
    ap.add_argument("--scale", default="n", help="yolo scale or d-compound")
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("-w", "--weights", default=None, help=".npz weights")
    ap.add_argument("-o", "--output", required=True, help=".adas output")
    ap.add_argument("--fp16", action="store_true",
                    help="build with fp16 activations")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="target platforms, e.g. tpu cpu")
    args = ap.parse_args()

    net, shape_nchw, meta = _build_net(args)
    if args.weights:
        from .params_io import load_params

        variables = load_params(args.weights)
    else:
        import jax

        n, c, h, w = shape_nchw
        variables = net.init(
            jax.random.PRNGKey(0), jnp.zeros((n, h, w, c), jnp.float32)
        )
    if args.fp16:
        from .quantize import cast_params

        variables = cast_params(variables, "fp16")

    dtype = jnp.float16 if args.fp16 else jnp.float32
    metadata = build_artifact(
        lambda v, x: net.apply(v, x),
        variables,
        shape_nchw,
        args.output,
        dtype=dtype,
        platforms=args.platforms,
        meta=meta,
    )
    # network description dump (parity with EngineBuilder.create_network)
    print(f"=== engine: {args.output}")
    print(f"  input  {metadata['input_shape_nchw']} {metadata['input_dtype']}")
    for name, shape, dt in zip(
        metadata["output_names"],
        metadata["output_shapes"],
        metadata["output_dtypes"],
    ):
        print(f"  output {name}: {shape} {dt}")
    print(f"  platforms: {metadata['platforms']}")


if __name__ == "__main__":
    main()
