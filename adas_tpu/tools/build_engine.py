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


def _build_fused(args) -> dict:
    """Construct the detector facade and export its fused step."""
    frame_hw = (args.frame_height, args.frame_width)
    dtype = "fp16" if args.fp16 else None
    if args.type.upper().startswith("YOLO"):
        from ..perception.object_detector import YoloDetector
        from ..utils.types import ObjectModelType

        det = YoloDetector(
            model_path=args.weights,
            model_type=ObjectModelType[args.type.upper()],
            scale=args.scale,
            input_size=(args.height, args.width),
            compute_dtype="bf16" if dtype else None,
        )
        return det.export_fused(
            args.output, frame_hw, platforms=args.platforms
        )
    if args.type.upper().startswith("UFLD"):
        from ..perception.lane_detector import (
            UltrafastLaneDetector,
            UltrafastLaneDetectorV2,
        )
        from ..utils.types import LaneModelType

        cls = (
            UltrafastLaneDetectorV2
            if "V2" in args.type.upper()
            else UltrafastLaneDetector
        )
        det = cls(
            model_path=args.weights,
            model_type=LaneModelType[args.type.upper()],
        )
        return det.export_fused(
            args.output, frame_hw, platforms=args.platforms
        )
    raise SystemExit(
        f"--fused supports YOLO*/UFLD* types, not {args.type}"
    )


def _build_multistream(args) -> dict:
    """Export the WHOLE N-stream pipeline (object net + lane net +
    preprocess + decode + NMS) as one ``.adas`` deploy unit — see
    MultiStreamADAS.export_fused."""
    from ..perception.lane_detector import UltrafastLaneDetectorV2
    from ..perception.object_detector import YoloDetector
    from ..pipeline.multistream import MultiStreamADAS
    from ..utils.types import LaneModelType, ObjectModelType

    by_name = {m.name.upper(): m for m in ObjectModelType}
    mtype = by_name[args.type.upper()]
    if mtype is ObjectModelType.EfficientDet:
        from ..perception.efficientdet_detector import EfficientdetDetector

        yolo = EfficientdetDetector(
            model_path=args.weights,
            compound=int(args.scale[-1])
            if args.scale and args.scale[-1].isdigit() else 0,
        )
    else:
        yolo = YoloDetector(
            model_path=args.weights,
            model_type=mtype,
            scale=args.scale,
            input_size=(args.height, args.width),
            compute_dtype="bf16" if args.fp16 else None,
        )
    lane = UltrafastLaneDetectorV2(
        model_path=args.lane_weights,
        model_type=LaneModelType[args.lane_type.upper()],
    )
    ms = MultiStreamADAS(
        yolo, lane, args.multistream,
        frame_hw=(args.frame_height, args.frame_width),
        host_downscale=(
            tuple(args.downscale) if args.downscale else None
        ),
        transport=args.transport,
    )
    return ms.export_fused(args.output, platforms=args.platforms)


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
    ap.add_argument("--fused", action="store_true",
                    help="export the detector's FUSED step (uint8 frame in,"
                         " decoded outputs out; single round-trip serving)")
    ap.add_argument("--frame-height", type=int, default=720,
                    help="source frame height baked into a fused engine")
    ap.add_argument("--frame-width", type=int, default=1280,
                    help="source frame width baked into a fused engine")
    ap.add_argument("--multistream", type=int, default=0, metavar="N",
                    help="export the WHOLE N-stream pipeline (object + "
                         "lane + decode + NMS) as one engine")
    ap.add_argument("--lane-type", default="UFLDV2_CULANE",
                    help="lane model enum for --multistream")
    ap.add_argument("--lane-weights", default=None,
                    help="lane .npz weights for --multistream")
    ap.add_argument("--transport", default="i420", choices=["i420", "bgr"],
                    help="frame transport baked into a --multistream engine")
    ap.add_argument("--downscale", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="host pre-resize baked into a --multistream engine")
    args = ap.parse_args()

    if args.multistream:
        meta = _build_multistream(args)
        print(f"=== multistream pipeline engine: {args.output}")
        print(
            f"  input  {meta['frame_shape']} {meta['input_dtype']} "
            f"({meta['n_streams']} streams, {meta['transport']})"
        )
        print(f"  packed outputs: {meta['output_shapes']}")
        print(f"  platforms: {meta['platforms']}")
        return

    if args.fused:
        meta = _build_fused(args)
        print(f"=== fused engine: {args.output}")
        print(f"  frame  {meta['frame_shape']} {meta['input_dtype']}")
        for name, shape, dt in zip(
            meta["output_names"], meta["output_shapes"], meta["output_dtypes"]
        ):
            print(f"  output {name}: {shape} {dt}")
        print(f"  platforms: {meta['platforms']}")
        return

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
