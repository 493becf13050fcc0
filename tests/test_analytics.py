"""L3 analytics tests: homography solve + device warp vs cv2, FCWS
distance math, BEV curvature/offset, TaskConditions state machine."""
import numpy as np
import pytest

from adas_tpu.analytics import (
    PerspectiveTransformation,
    SingleCamDistanceMeasure,
    TaskConditions,
)
from adas_tpu.analytics.distance import point_in_polygon
from adas_tpu.ops.warp import (
    get_perspective_transform,
    transform_points,
    warp_perspective,
)
from adas_tpu.utils.types import (
    CollisionType,
    CurvatureType,
    OffsetType,
    RectInfo,
)

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")


# ---------------- warp op ----------------

def test_get_perspective_transform_matches_cv2(rng):
    for _ in range(10):
        src = rng.uniform(0, 640, (4, 2)).astype(np.float32)
        dst = rng.uniform(0, 640, (4, 2)).astype(np.float32)
        try:
            m_ref = cv2.getPerspectiveTransform(src, dst)
        except cv2.error:
            continue
        m = get_perspective_transform(src, dst)
        np.testing.assert_allclose(m, m_ref, rtol=1e-4, atol=1e-6)


def test_warp_perspective_identity():
    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    out = np.asarray(
        warp_perspective(jnp.asarray(img), jnp.eye(3), (40, 60))
    )
    np.testing.assert_array_equal(out, img)


def test_warp_perspective_matches_cv2(rng):
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    src = np.float32([(40, 30), (20, 110), (150, 110), (130, 30)])
    dst = np.float32([(40, 0), (40, 120), (120, 120), (120, 0)])
    m = cv2.getPerspectiveTransform(src, dst)
    ref = cv2.warpPerspective(img, m, (160, 120), flags=cv2.INTER_LINEAR)
    out = np.asarray(
        warp_perspective(jnp.asarray(img), jnp.asarray(m, jnp.float32),
                         (120, 160))
    )
    # interior pixels should agree closely (borders differ by sampling conv.)
    diff = np.abs(out[5:-5, 5:-5].astype(int) - ref[5:-5, 5:-5].astype(int))
    assert np.quantile(diff, 0.99) <= 3


def test_transform_points_roundtrip(rng):
    src = np.float32([(40, 30), (20, 110), (150, 110), (130, 30)])
    dst = np.float32([(40, 0), (40, 120), (120, 120), (120, 0)])
    m = get_perspective_transform(src, dst)
    m_inv = get_perspective_transform(dst, src)
    pts = rng.uniform(0, 150, (20, 2))
    back = transform_points(transform_points(pts, m), m_inv)
    np.testing.assert_allclose(back, pts, atol=1e-6)
    # the 4 defining corners map exactly
    np.testing.assert_allclose(transform_points(src, m), dst, atol=1e-4)


# ---------------- distance (FCWS) ----------------

def _rect(x, y, w, h, label="car", conf=0.9):
    return RectInfo(x, y, w, h, conf=conf, label=label)


def test_point_in_polygon():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    assert point_in_polygon((5, 5), square)
    assert not point_in_polygon((15, 5), square)
    tri = np.array([[0, 0], [10, 0], [5, 10]])
    assert point_in_polygon((5, 3), tri)
    assert not point_in_polygon((1, 8), tri)


def test_update_distance_pinhole_math():
    dm = SingleCamDistanceMeasure()
    h = 150  # pixel height
    dm.updateDistance([_rect(100, 200, 80, h)])
    assert len(dm.distance_points) == 1
    x, y, d = dm.distance_points[0]
    assert x == (100 + 180) // 2 and y == 350
    expected = (150 * 0.39 * 100) / h / 12 * 0.3048
    assert d == pytest.approx(expected)
    # taller box (closer) → smaller distance
    dm.updateDistance([_rect(100, 100, 80, 2 * h)])
    assert dm.distance_points[0][2] == pytest.approx(expected / 2)


def test_update_distance_filters():
    dm = SingleCamDistanceMeasure()
    dm.updateDistance([
        _rect(0, 700, 50, 40),          # ymax > 650 → dropped
        _rect(0, 100, 50, 40, label="traffic light"),  # class → dropped
        _rect(0, 100, 50, 40, label="bus"),
    ])
    assert len(dm.distance_points) == 1


def test_calc_collision_point_picks_nearest_inside():
    dm = SingleCamDistanceMeasure()
    dm.distance_points = [
        [50, 100, 5.0],    # nearest but outside polygon
        [150, 100, 8.0],   # inside
        [160, 100, 12.0],  # inside but farther
    ]
    poly = np.array([[100, 0], [200, 0], [200, 200], [100, 200]])
    assert dm.calcCollisionPoint(poly) == [150, 100, 8.0]
    assert dm.calcCollisionPoint(np.zeros((0, 2))) is None


# ---------------- perspective ----------------

def make_lanes(offset_px=0.0, curve=0.0):
    ys = np.linspace(300, 710, 30)
    left_x = 400 + offset_px + curve * (ys - 300) ** 2 / 400
    right_x = 880 + offset_px + curve * (ys - 300) ** 2 / 400
    return (
        np.stack([left_x, ys], axis=1),
        np.stack([right_x, ys], axis=1),
    )


def test_calc_curve_and_offset_straight_centered():
    pt = PerspectiveTransformation((1280, 720))
    img = np.zeros((720, 1280, 3), dtype=np.uint8)
    left, right = make_lanes()
    (direction, curvature), offset = pt.calcCurveAndOffset(
        img, left, right, draw=False
    )
    assert direction == "F"
    assert curvature > 10000  # nearly straight → huge radius
    assert abs(offset) < 0.1


def test_calc_curve_and_offset_offset_sign():
    pt = PerspectiveTransformation((1280, 720))
    img = np.zeros((720, 1280, 3), dtype=np.uint8)
    left, right = make_lanes(offset_px=100)
    (_, _), offset = pt.calcCurveAndOffset(img, left, right, draw=False)
    assert offset > 0.3  # lane center right of image center
    left, right = make_lanes(offset_px=-100)
    (_, _), offset = pt.calcCurveAndOffset(img, left, right, draw=False)
    assert offset < -0.3


def test_update_transform_params_modes():
    pt = PerspectiveTransformation((1280, 720))
    left, right = make_lanes()
    src0 = pt.src.copy()
    pt.updateTransformParams(left, right, "Default")
    assert not np.allclose(pt.src, src0)
    # unknown mode: no change
    src1 = pt.src.copy()
    pt.updateTransformParams(left, right, "Nonsense")
    np.testing.assert_array_equal(pt.src, src1)
    # empty lanes: no change
    pt.updateTransformParams([], right, "Default")
    np.testing.assert_array_equal(pt.src, src1)


def test_bird_view_points_shape():
    pt = PerspectiveTransformation((1280, 720))
    left, _ = make_lanes()
    bird = pt.transformToBirdViewPoints(left)
    assert bird.shape == left.shape and bird.dtype == int
    assert len(pt.transformToBirdViewPoints([])) == 0


# ---------------- TaskConditions ----------------

def test_collision_status_thresholds():
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateCollisionStatus([0, 0, 1.0], True)
    assert tc.collision_msg == CollisionType.WARNING
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateCollisionStatus([0, 0, 2.5], True)
    assert tc.collision_msg == CollisionType.PROMPT
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateCollisionStatus([0, 0, 10.0], True)
    assert tc.collision_msg == CollisionType.NORMAL
    tc.UpdateCollisionStatus(None, lane_area=True)
    assert tc.collision_msg == CollisionType.NORMAL
    tc.UpdateCollisionStatus(None, lane_area=False)
    assert tc.collision_msg == CollisionType.UNKNOWN


def test_offset_status_needs_full_window():
    tc = TaskConditions()
    for i in range(4):
        tc.UpdateOffsetStatus(1.0)
        assert tc.offset_msg == OffsetType.UNKNOWN
    tc.UpdateOffsetStatus(1.0)
    assert tc.offset_msg == OffsetType.RIGHT
    tc.UpdateOffsetStatus(None)
    assert tc.offset_msg == OffsetType.UNKNOWN


def test_offset_center_and_left():
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateOffsetStatus(0.1)
    assert tc.offset_msg == OffsetType.CENTER
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateOffsetStatus(-1.0)
    assert tc.offset_msg == OffsetType.LEFT


def test_route_status_hard_and_easy():
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateOffsetStatus(0.0)  # offset CENTER gate
    for _ in range(10):
        tc.UpdateRouteStatus("L", 300.0)
    assert tc.curvature_msg == CurvatureType.HARD_LEFT
    tc = TaskConditions()
    for _ in range(5):
        tc.UpdateOffsetStatus(0.0)
    for _ in range(10):
        tc.UpdateRouteStatus("R", 5000.0)
    assert tc.curvature_msg == CurvatureType.EASY_RIGHT
    tc.UpdateRouteStatus("F", None)
    assert tc.curvature_msg == CurvatureType.UNKNOWN


def test_check_status_transition():
    tc = TaskConditions()
    assert tc.CheckStatus()  # initial "Default" vs None → update once
    assert tc.CheckStatus()  # toggle consumed to None → one more update
    assert not tc.CheckStatus()  # now stable (reference taskConditions.py:188-198)


def test_smooth_road_resets_to_default():
    tc = TaskConditions()
    tc.transform_status = "Top"
    tc.toggle_status = "Top"
    for _ in range(5):
        tc.UpdateOffsetStatus(0.0)
    for _ in range(6):
        tc.UpdateRouteStatus("F", 20000.0)
    assert tc.toggle_status == "Default"
    assert tc.CheckStatus()
