import numpy as np
import jax.numpy as jnp

from adas_tpu.ops.boxes import (
    cxcywh_to_xyxy,
    pairwise_iou,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from adas_tpu.ops.nms import nms_padded, soft_nms_padded


def np_iou_matrix(a, b, plus_one=False):
    off = 1.0 if plus_one else 0.0
    a = a[:, None, :]
    b = b[None, :, :]
    lt = np.maximum(a[..., :2], b[..., :2])
    rb = np.minimum(a[..., 2:], b[..., 2:])
    wh = np.clip(rb - lt + off, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0] + off) * (a[..., 3] - a[..., 1] + off)
    area_b = (b[..., 2] - b[..., 0] + off) * (b[..., 3] - b[..., 1] + off)
    return inter / (area_a + area_b - inter)


def np_greedy_nms(boxes, scores, thr):
    """Plain numpy greedy NMS oracle (descending score order)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        ious = np_iou_matrix(boxes[i : i + 1], boxes[rest])[0]
        order = rest[ious <= thr]
    return keep


def random_boxes(rng, n, size=640):
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(8, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxOps:
    def test_coordinate_roundtrip(self, rng):
        b = random_boxes(rng, 17)
        xywh = np.array(xyxy_to_xywh(jnp.asarray(b)))
        back = np.array(xywh_to_xyxy(jnp.asarray(xywh)))
        np.testing.assert_allclose(back, b, rtol=1e-6)

    def test_cxcywh(self):
        b = jnp.array([[10.0, 10.0, 4.0, 6.0]])
        out = np.array(cxcywh_to_xyxy(b))
        np.testing.assert_allclose(out, [[8, 7, 12, 13]])

    def test_pairwise_iou_matches_numpy(self, rng):
        a = random_boxes(rng, 13)
        b = random_boxes(rng, 7)
        got = np.array(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np_iou_matrix(a, b), rtol=1e-5)

    def test_identical_boxes_iou_one(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        assert float(pairwise_iou(a, a)[0, 0]) == 1.0


class TestNMS:
    def test_matches_numpy_oracle(self, rng):
        for trial in range(5):
            n = 60
            boxes = random_boxes(rng, n)
            scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
            want = np_greedy_nms(boxes, scores, 0.45)
            idx, count = nms_padded(
                jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_out=n
            )
            got = [int(i) for i in np.array(idx) if i >= 0]
            assert got == want
            assert int(count) == len(want)

    def test_padding_ignored(self, rng):
        boxes = random_boxes(rng, 8)
        scores = rng.uniform(0.2, 1.0, 8).astype(np.float32)
        padded_boxes = np.concatenate([boxes, np.zeros((24, 4), np.float32)])
        padded_scores = np.concatenate([scores, np.zeros(24, np.float32)])
        want = np_greedy_nms(boxes, scores, 0.5)
        idx, count = nms_padded(
            jnp.asarray(padded_boxes), jnp.asarray(padded_scores), 0.5, max_out=16
        )
        got = [int(i) for i in np.array(idx) if i >= 0]
        assert got == want

    def test_max_out_truncates(self, rng):
        boxes = random_boxes(rng, 40)
        # spread boxes far apart so nothing suppresses
        boxes += (np.arange(40)[:, None] * 2000).astype(np.float32)
        scores = rng.uniform(0.2, 1.0, 40).astype(np.float32)
        idx, count = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=10
        )
        assert int(count) == 10

    def test_empty_input(self):
        idx, count = nms_padded(
            jnp.zeros((16, 4)), jnp.zeros(16), 0.5, max_out=8
        )
        assert int(count) == 0
        assert all(int(i) == -1 for i in np.array(idx))


class TestSoftNMS:
    def test_hard_mode_equals_greedy_with_plus_one(self, rng):
        """Parity default reproduces the reference's effective (hard) path."""
        boxes = random_boxes(rng, 30)
        scores = rng.uniform(0.05, 1.0, 30).astype(np.float32)
        # numpy oracle with +1 arithmetic
        order = np.argsort(-scores)
        keep = []
        remaining = list(order)
        while remaining:
            i = remaining.pop(0)
            keep.append(i)
            ious = np_iou_matrix(
                boxes[i : i + 1], boxes[np.array(remaining, int)].reshape(-1, 4),
                plus_one=True,
            )[0] if remaining else np.array([])
            remaining = [r for r, ov in zip(remaining, ious) if ov <= 0.45]
        idx, _ = soft_nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.45,
            max_out=30, method="hard", plus_one=True,
        )
        got = [int(i) for i in np.array(idx) if i >= 0]
        assert got == keep

    def test_gaussian_decays_but_keeps_separated_boxes(self):
        boxes = jnp.array(
            [
                [0, 0, 10, 10],
                [1, 1, 11, 11],  # heavy overlap with first
                [100, 100, 110, 110],  # far away
            ],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        idx, count = soft_nms_padded(
            boxes, scores, iou_threshold=0.3, sigma=0.5,
            score_threshold=0.4, max_out=3, method="gaussian", plus_one=False,
        )
        got = [int(i) for i in np.array(idx) if i >= 0]
        # overlap decays box1 score: 0.8*exp(-iou^2/0.5) < 0.4 -> dropped
        assert 0 in got and 2 in got and 1 not in got

    def test_linear_mode(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.array([0.9, 0.85, 0.5])
        idx, count = soft_nms_padded(
            boxes, scores, iou_threshold=0.3, score_threshold=0.1,
            max_out=3, method="linear", plus_one=False,
        )
        got = [int(i) for i in np.array(idx) if i >= 0]
        # duplicate box decays to 0.85*(1-1.0)=0 -> dropped
        assert got == [0, 2]
