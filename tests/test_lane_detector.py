"""Lane detector facade tests: decode assembly semantics on controlled
model outputs (weights random; assembly driven via the public DetectFrame)."""
import numpy as np
import pytest
import jax.numpy as jnp

from adas_tpu.perception.lane_detector import (
    UltrafastLaneDetector,
    UltrafastLaneDetectorV2,
)
from adas_tpu.utils.types import LaneModelType


@pytest.fixture(scope="module")
def v2_detector():
    return UltrafastLaneDetectorV2(model_type=LaneModelType.UFLDV2_TUSIMPLE)


def test_v2_rejects_v1_type():
    with pytest.raises(ValueError):
        UltrafastLaneDetectorV2(model_type=LaneModelType.UFLD_TUSIMPLE)


def test_v1_rejects_v2_type():
    with pytest.raises(ValueError):
        UltrafastLaneDetector(model_type=LaneModelType.UFLDV2_CULANE)


def test_v2_detect_frame_shapes(v2_detector):
    frame = np.random.default_rng(0).integers(
        0, 255, (360, 640, 3)
    ).astype(np.uint8)
    v2_detector.DetectFrame(frame)
    info = v2_detector.lane_info
    assert len(info.lanes_points) == 4
    assert len(info.lanes_status) == 4
    # all emitted points must be inside the source frame bounds
    for pts in info.lanes_points:
        for x, y in pts:
            assert 0 <= x <= 641 and 0 <= y <= 361


def test_v2_assemble_thresholds(v2_detector):
    """Existence gating: > num_row/2 for ego rows, > num_col/4 for sides."""
    s = v2_detector.spec
    decoded = {
        "row_x": np.full((1, s.num_row, 4), 0.5, np.float32),
        "row_valid": np.zeros((1, s.num_row, 4), bool),
        "col_y": np.full((1, s.num_col, 4), 0.5, np.float32),
        "col_valid": np.zeros((1, s.num_col, 4), bool),
    }
    # left-ego barely above threshold, right-ego barely below
    decoded["row_valid"][0, : s.num_row // 2 + 1, 1] = True
    decoded["row_valid"][0, : s.num_row // 2, 2] = True
    # right-side above quarter threshold
    decoded["col_valid"][0, : s.num_col // 4 + 1, 3] = True
    v2_detector._assemble(decoded, 640, 360)
    assert v2_detector.lane_info.lanes_status == [False, True, False, True]
    n_pts = [len(p) for p in v2_detector.lane_info.lanes_points]
    assert n_pts[1] == s.num_row // 2 + 1
    assert n_pts[2] == 0


def test_v2_area_polygon_from_ego_pair(v2_detector):
    s = v2_detector.spec
    decoded = {
        "row_x": np.zeros((1, s.num_row, 4), np.float32),
        "row_valid": np.ones((1, s.num_row, 4), bool),
        "col_y": np.full((1, s.num_col, 4), 0.5, np.float32),
        "col_valid": np.zeros((1, s.num_col, 4), bool),
    }
    decoded["row_x"][0, :, 1] = 0.3
    decoded["row_x"][0, :, 2] = 0.7
    v2_detector._assemble(decoded, 1000, 500)
    v2_detector.adjust_lanes = False
    v2_detector._finalize(500)
    info = v2_detector.lane_info
    assert info.area_status
    assert len(info.area_points) == 2 * s.num_row
    xs = np.asarray(info.area_points)[:, 0]
    assert set(np.unique(xs)) == {300, 700}


def test_v1_detect_frame(rng):
    det = UltrafastLaneDetector(model_type=LaneModelType.UFLD_TUSIMPLE)
    frame = rng.integers(0, 255, (720, 1280, 3)).astype(np.uint8)
    det.DetectFrame(frame)
    assert len(det.lane_info.lanes_points) == 4
    assert len(det.lane_info.lanes_status) == 4


def test_v1_assemble_point_math():
    det = UltrafastLaneDetector(model_type=LaneModelType.UFLD_TUSIMPLE)
    s = det.spec
    loc = np.zeros((s.cls_num_per_lane, 4), np.float32)
    loc[:4, 0] = 50.0  # 4 points on lane 0
    det._assemble(loc, s.img_w, s.img_h)
    assert det.lane_info.lanes_status == [True, False, False, False]
    pts = det.lane_info.lanes_points[0]
    col_sample_w = (s.input_width - 1) / (s.griding_num - 1)
    want_x = int(50.0 * col_sample_w * s.img_w / s.input_width - 1)
    assert pts[0][0] == want_x
    # y uses flipped row anchors
    want_y = int(
        s.img_h * (s.row_anchor[s.cls_num_per_lane - 1] / s.input_height) - 1
    )
    assert pts[0][1] == want_y


def test_lane_detector_engine_injection():
    """Engine-injected lane path (FakeEngine emitting the 4 decode
    tensors) matches the native-graph path on the same logits."""
    import jax
    import jax.numpy as jnp

    from adas_tpu.engine.xla_engine import FakeEngine
    from adas_tpu.ops.preprocess import ufld_v2_preprocess

    native = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    frame = np.random.default_rng(5).integers(
        0, 255, (240, 480, 3), dtype=np.uint8
    )
    native.DetectFrame(frame)
    expected = [list(map(tuple, p)) for p in native.lane_info.lanes_points]

    # canned engine: replay the native net's outputs for this frame
    spec = native.spec
    x = ufld_v2_preprocess(
        jnp.asarray(frame)[None], spec.input_height, spec.input_width,
        spec.crop_ratio,
    )
    outs = native.net.apply(native.variables, x)
    engine = FakeEngine(
        (1, 3, spec.input_height, spec.input_width),
        {k: np.asarray(v, np.float32) for k, v in outs.items()},
    )
    via_engine = UltrafastLaneDetectorV2(
        model_type=LaneModelType.UFLDV2_TUSIMPLE, engine=engine
    )
    via_engine.DetectFrame(frame)
    got = [list(map(tuple, p)) for p in via_engine.lane_info.lanes_points]
    assert got == expected
