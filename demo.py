"""Top-level ADAS demo — the reference's ``python demo.py`` entry point
(demo.py:217-320) on the TPU-native stack.

Edit the two config dicts below (the reference's module-level pattern,
demo.py:17-29) or pass CLI flags; everything else — detection, tracking,
lanes, FCWS/LDWS/LKAS, HUD panels, video out — is wired by
adas_tpu.pipeline.
"""
import argparse

from adas_tpu.pipeline.app import run_video
from adas_tpu.utils.types import LaneModelType, ObjectModelType

video_path = "./temp/demo.mp4"

lane_config = {
    "model_path": None,  # .npz/.pth weights; None = random init
    "model_type": LaneModelType.UFLDV2_CULANE,
}

object_config = {
    "model_path": None,  # .npz/.pth/.onnx/.adas; None = random init
    "model_type": ObjectModelType.YOLOV8,
    "classes_path": None,
    "box_score": 0.4,
    "box_nms_iou": 0.5,
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="ADAS simulation demo")
    ap.add_argument("-i", "--input", default=video_path)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--display", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()
    out = args.output or args.input[:-4] + "_out.mp4"
    n = run_video(
        args.input, out,
        lane_config=lane_config, object_config=object_config,
        display=args.display, max_frames=args.max_frames,
    )
    print(f"wrote {n} frames to {out}")
