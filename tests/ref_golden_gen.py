"""Golden-fixture generator: runs the REFERENCE's own pure-numpy decode
functions on seeded random tensors and saves their outputs.

Executed as a subprocess by tests/test_reference_golden.py so the
reference modules (and the stub shims below) never pollute the test
process.  The reference decode paths exercised:

* ObjectDetector/yoloDetector.py:104-133  (``__process_output``, v5/v8
  contracts and the v5-lite grid decode)
* ObjectDetector/utils.py:161-255         (``NMS.fast_soft_nms`` with its
  method-string quirk => effective hard NMS, VOC +1 arithmetic)
* TrafficLaneDetector/ufldDetector/ultrafastLaneDetectorV2.py:114-181
* TrafficLaneDetector/ufldDetector/ultrafastLaneDetector.py:97-136

Nothing here is copied; the reference code itself runs as the oracle,
exactly like the torch-net oracles in tests/torch_nets.py.
"""
import sys
import types

import numpy as np

REF = "/root/reference"


def _install_stubs():
    """The reference modules import engine/runtime deps that are absent
    here (tensorrt, pycuda, onnxruntime via coreEngine; numba).  The
    decode functions never touch them, so stub just enough to import."""
    core_engine = types.ModuleType("coreEngine")
    core_engine.TensorRTEngine = type("TensorRTEngine", (), {})
    core_engine.OnnxEngine = type("OnnxEngine", (), {})
    sys.modules["coreEngine"] = core_engine

    numba = types.ModuleType("numba")

    def jit(*a, **k):
        def deco(fn):
            return fn

        return deco

    numba.jit = jit
    sys.modules["numba"] = numba

    lap = types.ModuleType("lap")  # pulled in by ObjectDetector/__init__
    lap.lapjv = None
    sys.modules["lap"] = lap


def main(out_path: str) -> None:
    _install_stubs()
    sys.path.insert(0, REF)

    import ObjectDetector.utils as ref_utils
    import ObjectDetector.yoloDetector as ref_yolo
    import TrafficLaneDetector.ufldDetector.ultrafastLaneDetector as ref_v1
    import TrafficLaneDetector.ufldDetector.ultrafastLaneDetectorV2 as ref_v2

    rng = np.random.default_rng(42)
    out = {}

    # ---- YOLO decode: v8 (transposed, raw class probs) ----------------
    def yolo_inst(model_type, num_classes=80):
        det = object.__new__(ref_yolo.YoloDetector)
        ref_yolo.YoloLiteParameters.__init__(
            det, model_type, (1, 3, 160, 160), num_classes
        )
        det.model_type = model_type
        det.box_score = 0.4
        return det

    # class-prob spread straddling box_score=0.4 so thresholding filters
    v8_raw = rng.normal(0.0, 0.18, (84, 300)).astype(np.float32)
    v8_raw[:4] = rng.uniform(10, 150, (4, 300)).astype(np.float32)
    det = yolo_inst(ref_utils.ObjectModelType.YOLOV8)
    boxes, ids, confs, _ = det._YoloDetector__process_output(v8_raw.copy())
    out["v8_raw"] = v8_raw
    out["v8_boxes"] = np.asarray(boxes, np.float32).reshape(-1, 4)
    out["v8_ids"] = np.asarray(ids, np.int64)
    out["v8_confs"] = np.asarray(confs, np.float64)

    # ---- YOLO decode: v5 (obj_conf * cls_conf) -------------------------
    v5_raw = rng.uniform(0, 1, (300, 85)).astype(np.float32)
    v5_raw[:, :4] = rng.uniform(10, 150, (300, 4)).astype(np.float32)
    det = yolo_inst(ref_utils.ObjectModelType.YOLOV5)
    boxes, ids, confs, _ = det._YoloDetector__process_output(v5_raw.copy())
    out["v5_raw"] = v5_raw
    out["v5_boxes"] = np.asarray(boxes, np.float32).reshape(-1, 4)
    out["v5_ids"] = np.asarray(ids, np.int64)
    out["v5_confs"] = np.asarray(confs, np.float64)

    # ---- YOLO decode: v5-lite (anchor/grid transform first) -----------
    n_lite = 3 * (20 * 20 + 10 * 10 + 5 * 5)
    lite_raw = rng.uniform(0, 1, (n_lite, 85)).astype(np.float32)
    det = yolo_inst(ref_utils.ObjectModelType.YOLOV5_LITE)
    boxes, ids, confs, _ = det._YoloDetector__process_output(lite_raw.copy())
    out["v5lite_raw"] = lite_raw
    out["v5lite_boxes"] = np.asarray(boxes, np.float32).reshape(-1, 4)
    out["v5lite_ids"] = np.asarray(ids, np.int64)
    out["v5lite_confs"] = np.asarray(confs, np.float64)

    # ---- soft-NMS (method-string quirk => hard suppression) -----------
    centers = rng.uniform(30, 170, (60, 2))
    sizes = rng.uniform(15, 60, (60, 2))
    nms_boxes = np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], axis=1
    ).astype(np.float32)
    nms_scores = rng.uniform(0.05, 1.0, 60).astype(np.float32)
    # Pre-sort descending: the reference's in-place "swap"
    # (utils.py:219 ``dets[i,:], dets[maxpos,:] = dets[maxpos,:], tBD``
    # with tBD a VIEW of row i) silently duplicates the max row and loses
    # the displaced box whenever a swap fires.  On sorted input no swap
    # fires, so this golden captures the algorithm's intended semantics;
    # the divergence on unsorted input is documented in ops/nms.py.
    order = np.argsort(-nms_scores)
    nms_boxes, nms_scores = nms_boxes[order], nms_scores[order]
    keep = ref_utils.NMS.fast_soft_nms(
        nms_boxes.copy(), nms_scores.copy(), iou_thr=0.45, dets_type="xyxy"
    )
    out["nms_boxes"] = nms_boxes
    out["nms_scores"] = nms_scores
    out["nms_keep"] = np.asarray(keep, np.int64)

    # ---- UFLDv2 decode (tusimple geometry) -----------------------------
    cfg2 = ref_v2.ModelConfig(ref_v2.LaneModelType.UFLDV2_TUSIMPLE)
    loc_row = rng.normal(0, 2, (1, 100, 56, 4)).astype(np.float32)
    loc_col = rng.normal(0, 2, (1, 100, 41, 4)).astype(np.float32)
    exist_row = rng.normal(0, 2, (1, 2, 56, 4)).astype(np.float32)
    exist_col = rng.normal(0, 2, (1, 2, 41, 4)).astype(np.float32)
    # bias the ego-lane existence channel so the row decode path (the
    # reference's num_cls/2 vote, ultrafastLaneDetectorV2.py:148) fires
    exist_row[:, 1, :, 1:3] += 2.0
    lane2 = object.__new__(ref_v2.UltrafastLaneDetectorV2)
    lane2.img_width, lane2.img_height = 1280, 720
    pts, detected = lane2._UltrafastLaneDetectorV2__process_output(
        [loc_row, loc_col, exist_row, exist_col], cfg2
    )
    out["ufldv2_loc_row"] = loc_row
    out["ufldv2_loc_col"] = loc_col
    out["ufldv2_exist_row"] = exist_row
    out["ufldv2_exist_col"] = exist_col
    out["ufldv2_detected"] = np.asarray(detected, bool)
    for i, lane_pts in enumerate(pts):
        out[f"ufldv2_lane{i}"] = np.asarray(lane_pts, np.int64).reshape(-1, 2)

    # ---- UFLD v1 decode (tusimple geometry) ----------------------------
    cfg1 = ref_v1.ModelConfig(ref_v1.LaneModelType.UFLD_TUSIMPLE)
    v1_logits = rng.normal(0, 2, (1, 101, 56, 4)).astype(np.float32)
    lane1 = object.__new__(ref_v1.UltrafastLaneDetector)
    lane1.cfg = cfg1
    lane1.input_width, lane1.input_height = 800, 288
    lane1.h_ratio, lane1.w_ratio = 720 / cfg1.img_h, 1280 / cfg1.img_w
    pts, detected = lane1._UltrafastLaneDetector__process_output(
        [v1_logits], cfg1
    )
    out["ufldv1_logits"] = v1_logits
    out["ufldv1_detected"] = np.asarray(list(detected), bool)
    for i, lane_pts in enumerate(pts):
        out[f"ufldv1_lane{i}"] = np.asarray(lane_pts, np.int64).reshape(-1, 2)

    np.savez(out_path, **out)
    print(f"goldens -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
