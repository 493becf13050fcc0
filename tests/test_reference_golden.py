"""Bit-level decode parity vs goldens produced by the REFERENCE's own
numpy decode code (tests/ref_golden_gen.py runs it in a subprocess).

Stronger than the hand-derived oracles elsewhere in the suite: the
expectations here are the actual outputs of
ObjectDetector/yoloDetector.py:104-133, ObjectDetector/utils.py:161-255,
ultrafastLaneDetectorV2.py:114-181 and ultrafastLaneDetector.py:97-136
on seeded random tensors.
"""
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.ops.nms import _select_loop
from adas_tpu.ops.ufld_decode import ufld_v1_decode, ufld_v2_decode
from adas_tpu.ops.yolo_decode import decode_predictions
from adas_tpu.utils.types import LaneModelType, ObjectModelType

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not available"
)


@pytest.fixture(scope="module")
def goldens(tmp_path_factory):
    out = tmp_path_factory.mktemp("ref") / "goldens.npz"
    gen = os.path.join(os.path.dirname(__file__), "ref_golden_gen.py")
    subprocess.run(
        [sys.executable, gen, str(out)], check=True, timeout=300
    )
    return np.load(out)


def _decoded(raw, model_type, g_boxes, g_ids, g_confs, input_hw=None):
    boxes, scores, ids = decode_predictions(
        jnp.asarray(raw), model_type, 80, input_hw
    )
    boxes, scores, ids = map(np.asarray, (boxes, scores, ids))
    mask = scores > 0.4  # the reference's box_score threshold
    np.testing.assert_array_equal(ids[mask], g_ids)
    np.testing.assert_allclose(scores[mask], g_confs, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(boxes[mask], g_boxes, rtol=2e-5, atol=5e-3)
    assert mask.sum() > 0 and mask.sum() < len(mask)  # threshold filtered


def test_yolo_v8_decode_matches_reference(goldens):
    _decoded(
        goldens["v8_raw"], ObjectModelType.YOLOV8,
        goldens["v8_boxes"], goldens["v8_ids"], goldens["v8_confs"],
    )


def test_yolo_v5_decode_matches_reference(goldens):
    _decoded(
        goldens["v5_raw"], ObjectModelType.YOLOV5,
        goldens["v5_boxes"], goldens["v5_ids"], goldens["v5_confs"],
    )


def test_yolo_v5lite_decode_matches_reference(goldens):
    _decoded(
        goldens["v5lite_raw"], ObjectModelType.YOLOV5_LITE,
        goldens["v5lite_boxes"], goldens["v5lite_ids"],
        goldens["v5lite_confs"], input_hw=(160, 160),
    )


def test_nms_matches_reference_soft_nms(goldens):
    """Same kept-box set as the reference fast_soft_nms (whose 'linear'
    method string hits the hard-suppression branch; VOC +1 areas)."""
    boxes = jnp.asarray(goldens["nms_boxes"])
    scores = jnp.asarray(goldens["nms_scores"])
    n = boxes.shape[0]
    keep, _ = _select_loop(
        boxes, scores, 0.45, n, method=0, sigma=0.5,
        score_threshold=0.001, plus_one=True,
    )
    keep = np.asarray(keep)
    mine = {
        tuple(np.round(goldens["nms_boxes"][k], 3)) for k in keep[keep >= 0]
    }
    ref = {
        tuple(np.round(goldens["nms_boxes"][k], 3))
        for k in goldens["nms_keep"]
    }
    assert mine == ref


def test_ufldv2_decode_matches_reference(goldens):
    from adas_tpu.models.ufld import UFLDV2_SPECS
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.utils.types import LaneInfo

    outputs = {
        "loc_row": jnp.asarray(goldens["ufldv2_loc_row"]),
        "loc_col": jnp.asarray(goldens["ufldv2_loc_col"]),
        "exist_row": jnp.asarray(goldens["ufldv2_exist_row"]),
        "exist_col": jnp.asarray(goldens["ufldv2_exist_col"]),
    }
    decoded = {k: np.asarray(v) for k, v in ufld_v2_decode(outputs).items()}

    det = object.__new__(UltrafastLaneDetectorV2)
    det.spec = UFLDV2_SPECS[LaneModelType.UFLDV2_TUSIMPLE]
    det.lane_info = LaneInfo()
    det._assemble(decoded, 1280, 720)

    assert det.lane_info.lanes_status == list(goldens["ufldv2_detected"])
    for i in range(4):
        ref_pts = goldens[f"ufldv2_lane{i}"]
        mine = np.asarray(det.lane_info.lanes_points[i], np.int64).reshape(
            -1, 2
        )
        assert mine.shape == ref_pts.shape
        if len(ref_pts):
            # int() truncation can flip by 1px on f32-vs-f64 boundaries
            assert np.abs(mine - ref_pts).max() <= 1
            assert (mine == ref_pts).mean() > 0.95


def test_ufldv1_decode_matches_reference(goldens):
    from adas_tpu.models.ufld import UFLDV1_SPECS
    from adas_tpu.perception.lane_detector import UltrafastLaneDetector
    from adas_tpu.utils.types import LaneInfo

    loc = np.asarray(
        ufld_v1_decode(jnp.asarray(goldens["ufldv1_logits"]))[0]
    )
    det = object.__new__(UltrafastLaneDetector)
    det.spec = UFLDV1_SPECS[LaneModelType.UFLD_TUSIMPLE]
    det.lane_info = LaneInfo()
    det._assemble(loc, 1280, 720)

    assert det.lane_info.lanes_status == list(goldens["ufldv1_detected"])
    for i in range(4):
        ref_pts = goldens[f"ufldv1_lane{i}"]
        mine = np.asarray(det.lane_info.lanes_points[i], np.int64).reshape(
            -1, 2
        )
        assert mine.shape == ref_pts.shape
        if len(ref_pts):
            assert np.abs(mine - ref_pts).max() <= 1
            assert (mine == ref_pts).mean() > 0.95
