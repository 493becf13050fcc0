"""L2 tracking tests: LAPJV exactness, KF batched-vs-reference math,
matching costs, and ByteTrack scenario behavior (SURVEY.md §4)."""
import itertools

import numpy as np
import pytest

from adas_tpu.native.lapjv import lapjv, lapjv_square
from adas_tpu.tracking import BYTETracker, KalmanFilter, STrack, TrackState
from adas_tpu.tracking import matching
from adas_tpu.tracking.track_utils import (
    joint_stracks,
    remove_duplicate_stracks,
    sub_stracks,
)


# ---------------- LAPJV ----------------

def brute_force_lap(cost):
    n = cost.shape[0]
    best, best_perm = np.inf, None
    for perm in itertools.permutations(range(n)):
        s = cost[np.arange(n), perm].sum()
        if s < best:
            best, best_perm = s, perm
    return best, best_perm


def test_lapjv_square_optimal_small(rng):
    for _ in range(50):
        n = int(rng.integers(1, 7))
        c = rng.random((n, n)) * 10
        r, col = lapjv_square(c)
        best, _ = brute_force_lap(c)
        assert c[np.arange(n), r].sum() == pytest.approx(best)
        # rowsol/colsol consistent
        for i, j in enumerate(r):
            assert col[j] == i


def test_lapjv_square_matches_scipy_large(rng):
    from scipy.optimize import linear_sum_assignment

    for _ in range(20):
        n = int(rng.integers(10, 80))
        c = rng.random((n, n)) * 5
        r, _ = lapjv_square(c)
        rows, cols = linear_sum_assignment(c)
        assert c[np.arange(n), r].sum() == pytest.approx(c[rows, cols].sum())


def test_lapjv_degenerate_equal_costs():
    for n in (1, 3, 21):
        r, _ = lapjv_square(np.full((n, n), 2.5))
        assert sorted(r) == list(range(n))


def test_lapjv_cost_limit_rectangular(rng):
    for _ in range(50):
        nr, nc = (int(v) for v in rng.integers(1, 12, 2))
        c = rng.random((nr, nc))
        x, y = lapjv(c, cost_limit=0.5)
        for i, j in enumerate(x):
            if j >= 0:
                assert y[j] == i
        # a profitable sure-match must be taken when one exists
        if nr == 1 and nc == 1 and c[0, 0] < 0.25:
            assert x[0] == 0


def test_lapjv_limit_excludes_expensive():
    c = np.array([[0.1, 0.9], [0.9, 0.1]])
    x, _ = lapjv(c, cost_limit=0.5)
    assert list(x) == [0, 1]
    x, _ = lapjv(np.array([[0.9]]), cost_limit=0.5)
    assert list(x) == [-1]


# ---------------- Kalman filter ----------------

def _reference_update(kf, mean, cov, z):
    """Straight textbook update for cross-checking the batched einsum."""
    pm, pc = kf.project(mean, cov)
    k = cov[:, :4] @ np.linalg.inv(pc)
    new_mean = mean + k @ (z - pm)
    new_cov = cov - k @ pc @ k.T
    return new_mean, new_cov


def test_kf_initiate_shapes():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([10.0, 20.0, 0.5, 40.0]))
    assert mean.shape == (8,) and cov.shape == (8, 8)
    assert mean[0] == 10 and (mean[4:] == 0).all()
    # variance scales with h
    assert cov[0, 0] == pytest.approx((2 * (1 / 20) * 40.0) ** 2)


def test_kf_predict_constant_velocity():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([0.0, 0.0, 1.0, 10.0]))
    mean[4:6] = [2.0, 3.0]  # vx, vy
    m2, c2 = kf.predict(mean, cov)
    assert m2[0] == pytest.approx(2.0) and m2[1] == pytest.approx(3.0)
    assert np.all(np.linalg.eigvalsh(c2) > 0)


def test_kf_batched_update_matches_reference(rng):
    kf = KalmanFilter()
    n = 7
    means, covs, zs = [], [], []
    for i in range(n):
        z0 = np.array([rng.uniform(0, 100), rng.uniform(0, 100),
                       rng.uniform(0.3, 2), rng.uniform(10, 80)])
        m, c = kf.initiate(z0)
        m, c = kf.predict(m, c)
        means.append(m)
        covs.append(c)
        zs.append(z0 + rng.normal(0, 1, 4))
    means, covs, zs = np.stack(means), np.stack(covs), np.stack(zs)
    bm, bc = kf.multi_update(means, covs, zs)
    for i in range(n):
        rm, rc = _reference_update(kf, means[i], covs[i], zs[i])
        np.testing.assert_allclose(bm[i], rm, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(bc[i], rc, rtol=1e-8, atol=1e-9)


def test_kf_update_pulls_toward_measurement():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([0.0, 0.0, 1.0, 10.0]))
    mean, cov = kf.predict(mean, cov)
    m2, _ = kf.update(mean, cov, np.array([4.0, 4.0, 1.0, 10.0]))
    assert 0 < m2[0] < 4 and 0 < m2[1] < 4


def test_kf_gating_distance_orders():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([50.0, 50.0, 1.0, 20.0]))
    mean, cov = kf.predict(mean, cov)
    zs = np.array([
        [50.0, 50.0, 1.0, 20.0],
        [80.0, 90.0, 1.0, 20.0],
    ])
    d = kf.gating_distance(mean, cov, zs)
    assert d[0] < d[1]


# ---------------- matching ----------------

def test_iou_distance_known_values():
    a = np.array([[0.0, 0, 10, 10]])
    b = np.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    d = matching.iou_distance([a[0]], [b[0], b[1], b[2]])
    assert d[0, 0] == pytest.approx(0.0)
    assert d[0, 1] == pytest.approx(1 - 25 / 175)
    assert d[0, 2] == pytest.approx(1.0)


def test_fuse_score():
    cost = np.array([[0.2, 0.5]])

    class D:
        def __init__(self, s):
            self.score = s

    fused = matching.fuse_score(cost, [D(1.0), D(0.5)])
    assert fused[0, 0] == pytest.approx(0.2)
    assert fused[0, 1] == pytest.approx(1 - 0.5 * 0.5)


def test_linear_assignment_empty():
    m, ua, ub = matching.linear_assignment(np.zeros((0, 3)), 0.8)
    assert m.shape == (0, 2) and len(ua) == 0 and list(ub) == [0, 1, 2]


# ---------------- track utils ----------------

class FakeTrack:
    def __init__(self, tid, tlbr=(0, 0, 10, 10), start=0, frame=0):
        self.track_id = tid
        self.tlbr = np.asarray(tlbr, dtype=np.float64)
        self.start_frame = start
        self.frame_id = frame


def test_joint_sub_stracks():
    a = [FakeTrack(1), FakeTrack(2)]
    b = [FakeTrack(2), FakeTrack(3)]
    joined = joint_stracks(a, b)
    assert [t.track_id for t in joined] == [1, 2, 3]
    assert [t.track_id for t in sub_stracks(joined, b)] == [1]


def test_remove_duplicate_keeps_older():
    old = FakeTrack(1, (0, 0, 10, 10), start=0, frame=10)
    young = FakeTrack(2, (0, 0, 10, 10.5), start=8, frame=10)
    ra, rb = remove_duplicate_stracks([old], [young])
    assert [t.track_id for t in ra] == [1]
    assert rb == []


# ---------------- ByteTrack scenarios ----------------

def _frame():
    return np.zeros((480, 640, 3), dtype=np.uint8)


def _drift(box, dx, dy, k):
    x1, y1, x2, y2 = box
    return [x1 + dx * k, y1 + dy * k, x2 + dx * k, y2 + dy * k]


def make_tracker():
    t = BYTETracker(names=["car", "person"])
    t.reset()
    return t


def test_bytetrack_stable_ids_over_motion():
    tracker = make_tracker()
    b0 = [100, 100, 160, 150]
    b1 = [300, 200, 380, 260]
    ids_seen = set()
    for k in range(10):
        boxes = np.array([_drift(b0, 3, 1, k), _drift(b1, -2, 2, k)])
        tracker.update(boxes, np.array([0.9, 0.85]), np.array([0, 1]), _frame())
        if k >= 1:  # activated from frame 1 (frame_id==1 activates at once)
            ids = sorted(t.track_id for t in tracker.tracked_stracks)
            ids_seen.add(tuple(ids))
    assert len(ids_seen) == 1  # same two ids throughout
    assert len(tracker.tracked_stracks) == 2


def test_bytetrack_low_score_rescue():
    tracker = make_tracker()
    box = [100, 100, 160, 150]
    tracker.update(
        np.array([box]), np.array([0.9]), np.array([0]), _frame()
    )
    tid = tracker.tracked_stracks[0].track_id
    # detection drops to low confidence: stage-2 association keeps the track
    for k in range(1, 4):
        tracker.update(
            np.array([_drift(box, 2, 0, k)]),
            np.array([0.3]),
            np.array([0]),
            _frame(),
        )
    assert [t.track_id for t in tracker.tracked_stracks] == [tid]


def test_bytetrack_lost_then_refound():
    tracker = make_tracker()
    box = [100, 100, 160, 150]
    for k in range(3):
        tracker.update(
            np.array([_drift(box, 2, 0, k)]),
            np.array([0.9]), np.array([0]), _frame(),
        )
    tid = tracker.tracked_stracks[0].track_id
    # disappear for 3 frames (< buffer): goes lost, not removed
    for _ in range(3):
        tracker.update(
            np.zeros((0, 4)), np.zeros(0), np.zeros(0), _frame()
        )
    assert tracker.tracked_stracks == []
    assert [t.track_id for t in tracker.lost_stracks] == [tid]
    # reappears near the predicted position: same id again
    tracker.update(
        np.array([_drift(box, 2, 0, 6)]),
        np.array([0.9]), np.array([0]), _frame(),
    )
    assert [t.track_id for t in tracker.tracked_stracks] == [tid]


def test_bytetrack_expires_after_buffer():
    tracker = BYTETracker(names=["car"], track_buffer=3)
    tracker.reset()
    box = [100, 100, 160, 150]
    for k in range(2):
        tracker.update(
            np.array([_drift(box, 1, 0, k)]),
            np.array([0.9]), np.array([0]), _frame(),
        )
    for _ in range(5):
        tracker.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), _frame())
    assert tracker.lost_stracks == []
    assert len(tracker.removed_stracks) == 1


def test_bytetrack_new_track_needs_confident_det():
    tracker = make_tracker()
    tracker.update(
        np.array([[10.0, 10, 50, 50]]), np.array([0.55]), np.array([0]),
        _frame(),
    )
    # 0.5 < 0.55 < det_thresh 0.6: high-score det but not enough to init
    assert tracker.tracked_stracks == []
    tracker.update(
        np.array([[10.0, 10, 50, 50]]), np.array([0.9]), np.array([0]),
        _frame(),
    )
    assert len(tracker.tracked_stracks) == 1


def test_bytetrack_class_majority_vote():
    tracker = make_tracker()
    box = np.array([[100.0, 100, 160, 150]])
    labels = [0, 0, 1, 0, 0]
    for k, lbl in enumerate(labels):
        tracker.update(box + 2 * k, np.array([0.9]), np.array([lbl]), _frame())
    assert tracker.tracked_stracks[0].class_id == 0


def test_bytetrack_reset_clears_ids():
    tracker = make_tracker()
    tracker.update(
        np.array([[10.0, 10, 50, 50]]), np.array([0.9]), np.array([0]),
        _frame(),
    )
    assert tracker.tracked_stracks[0].track_id == 1
    tracker.reset()
    tracker.update(
        np.array([[10.0, 10, 50, 50]]), np.array([0.9]), np.array([0]),
        _frame(),
    )
    assert tracker.tracked_stracks[0].track_id == 1


def test_strack_geometry_roundtrip():
    tlbr = np.array([10.0, 20, 50, 100])
    tlwh = STrack.tlbr_to_tlwh(tlbr)
    np.testing.assert_allclose(tlwh, [10, 20, 40, 80])
    np.testing.assert_allclose(STrack.tlwh_to_tlbr(tlwh), tlbr)
    xyah = STrack.tlwh_to_xyah(tlwh)
    np.testing.assert_allclose(xyah, [30, 60, 0.5, 80])


def test_kalman_jax_matches_numpy(rng):
    """Device-side batched KF (ops/kalman_jax.py) matches the host
    tracker's numpy filter bit-for-bit within float tolerance."""
    import jax.numpy as jnp

    from adas_tpu.ops import kalman_jax as kj

    kf = KalmanFilter()
    n = 6
    zs = np.stack([
        np.array([rng.uniform(0, 100), rng.uniform(0, 100),
                  rng.uniform(0.3, 2.0), rng.uniform(10, 80)])
        for _ in range(n)
    ])
    means_np, covs_np = [], []
    for z in zs:
        m, c = kf.initiate(z)
        means_np.append(m)
        covs_np.append(c)
    means_np, covs_np = np.stack(means_np), np.stack(covs_np)
    means_j, covs_j = kj.initiate(jnp.asarray(zs))
    np.testing.assert_allclose(np.asarray(means_j), means_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(covs_j), covs_np, rtol=1e-6)

    pm_np, pc_np = kf.multi_predict(means_np, covs_np)
    pm_j, pc_j = kj.predict(means_j, covs_j)
    np.testing.assert_allclose(np.asarray(pm_j), pm_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pc_j), pc_np, rtol=1e-5, atol=1e-6)

    z2 = zs + rng.normal(0, 1, zs.shape)
    um_np, uc_np = kf.multi_update(pm_np, pc_np, z2)
    um_j, uc_j = kj.update(pm_j, pc_j, jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(um_j), um_np, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uc_j), uc_np, rtol=1e-3, atol=1e-4)

    g_np = np.stack([
        kf.gating_distance(pm_np[i], pc_np[i], z2) for i in range(n)
    ])
    g_j = kj.gating_distance(pm_j, pc_j, jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(g_j), g_np, rtol=1e-3, atol=1e-4)
