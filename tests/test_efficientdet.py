"""EfficientDet model + facade tests: anchor math, decode, shapes, and a
fused-step smoke run (SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adas_tpu.models.efficientdet import (
    EfficientDet,
    EfficientDetSpec,
    EfficientNetFeatures,
    build_anchors,
    decode_boxes,
)


def test_anchor_count_and_coverage():
    anchors = build_anchors(512)
    n = sum((512 // 2 ** l) ** 2 * 9 for l in range(3, 8))
    assert anchors.shape == (n, 4)
    # first cell of P3: centered at (4, 4), base box 32x32
    y1, x1, y2, x2 = anchors[0]
    assert (y1 + y2) / 2 == pytest.approx(4.0)
    assert (x1 + x2) / 2 == pytest.approx(4.0)
    assert y2 - y1 == pytest.approx(32.0)


def test_decode_boxes_identity_and_shift():
    anchors = jnp.asarray(
        [[0.0, 0.0, 32.0, 32.0], [10.0, 10.0, 20.0, 30.0]]
    )
    reg = jnp.zeros((2, 4))
    boxes = np.asarray(decode_boxes(reg, anchors))
    # zero regression returns the anchor (in xyxy)
    np.testing.assert_allclose(boxes[0], [0, 0, 32, 32], atol=1e-5)
    np.testing.assert_allclose(boxes[1], [10, 10, 30, 20], atol=1e-5)
    # dy shifts center by dy*anchor_h
    reg = jnp.asarray([[0.5, 0.0, 0.0, 0.0], [0, 0, 0, 0]])
    boxes = np.asarray(decode_boxes(reg, anchors))
    np.testing.assert_allclose(boxes[0], [0, 16, 32, 48], atol=1e-4)


def test_efficientnet_feature_strides():
    net = EfficientNetFeatures()
    x = jnp.zeros((1, 128, 128, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = net.apply(variables, x)
    assert c3.shape[1:3] == (16, 16)   # stride 8
    assert c4.shape[1:3] == (8, 8)     # stride 16
    assert c5.shape[1:3] == (4, 4)     # stride 32
    assert c3.shape[-1] == 40 and c4.shape[-1] == 112 and c5.shape[-1] == 320


def test_efficientdet_d0_output_shapes():
    spec = EfficientDetSpec(compound=0, num_classes=12)
    net = EfficientDet(spec)
    x = jnp.zeros((1, 128, 128, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    boxes, probs = net.apply(variables, x)
    n = sum((128 // 2 ** l) ** 2 * 9 for l in range(3, 8))
    assert boxes.shape == (1, n, 4)
    assert probs.shape == (1, n, 12)
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1).all()


def test_efficientdet_facade_smoke():
    from adas_tpu.perception.efficientdet_detector import EfficientdetDetector
    from adas_tpu.models import efficientdet as ed

    # shrink D0 for CPU test speed: 128px input
    ed._D_CONFIGS[0] = (1.0, 1.0, 128, 64, 2, 2)
    try:
        det = EfficientdetDetector(box_score=0.0, max_det=10)
        frame = np.random.default_rng(0).integers(
            0, 255, (240, 320, 3), dtype=np.uint8
        )
        det.DetectFrame(frame)
        infos = det.object_info
        assert isinstance(infos, list)
        for info in infos:
            assert 0 <= info.conf <= 1
    finally:
        ed._D_CONFIGS[0] = (1.0, 1.0, 512, 64, 3, 3)
