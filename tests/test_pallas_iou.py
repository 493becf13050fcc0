"""Pallas IoU kernel parity (interpreter mode on CPU) and NMS-path use."""
import numpy as np
import jax.numpy as jnp

from adas_tpu.ops.boxes import pairwise_iou
from adas_tpu.ops.pallas_iou import iou_matrix


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 500, (n, 2))
    wh = rng.uniform(1, 120, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pallas_iou_matches_xla(rng):
    for n in (1, 5, 128, 300):
        boxes = _rand_boxes(rng, n)
        ref = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
        got = np.asarray(iou_matrix(jnp.asarray(boxes), interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_pallas_iou_plus_one(rng):
    boxes = _rand_boxes(rng, 64)
    ref = np.asarray(
        pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes), plus_one=True)
    )
    got = np.asarray(
        iou_matrix(jnp.asarray(boxes), plus_one=True, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_nms_same_result_with_and_without_matrix(rng):
    from adas_tpu.ops.nms import _select_loop

    boxes = jnp.asarray(_rand_boxes(rng, 300))
    scores = jnp.asarray(rng.uniform(0, 1, 300).astype(np.float32))
    kw = dict(method=0, sigma=0.5, score_threshold=0.0, plus_one=False)
    picked_a, na = _select_loop(boxes, scores, 0.5, 50, use_iou_matrix=True, **kw)
    picked_b, nb = _select_loop(boxes, scores, 0.5, 50, use_iou_matrix=False, **kw)
    np.testing.assert_array_equal(np.asarray(picked_a), np.asarray(picked_b))
    assert int(na) == int(nb)
