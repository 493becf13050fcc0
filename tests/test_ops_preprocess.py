import cv2
import numpy as np
import jax.numpy as jnp

from adas_tpu.ops.preprocess import (
    LetterboxGeometry,
    letterbox,
    resize_bilinear,
    ufld_v2_preprocess,
    yolo_preprocess,
)


def test_geometry_matches_reference_arithmetic():
    # 720p -> 640x640 letterbox (wider than tall): newh = int(640*h/w)+1
    g = LetterboxGeometry(720, 1280, 640, 640)
    assert g.new_shape == (int(640 * (720 / 1280)) + 1, 640) == (361, 640)
    assert g.pad == (int((640 - 361) * 0.5), 0) == (139, 0)
    # taller than wide
    g2 = LetterboxGeometry(1280, 720, 640, 640)
    assert g2.new_shape == (640, int(640 / (1280 / 720)))
    # square: no letterboxing
    g3 = LetterboxGeometry(512, 512, 640, 640)
    assert g3.new_shape == (640, 640)
    assert g3.pad == (0, 0)


def test_boxes_to_original_roundtrip():
    g = LetterboxGeometry(720, 1280, 640, 640)
    ratioh, ratiow = g.scale_ratio
    padh, padw = g.pad
    boxes = np.array([[100.0, 200.0, 300.0, 400.0]])
    out = g.boxes_to_original(boxes)
    want = np.array(
        [
            [
                (100 - padw) * ratiow,
                (200 - padh) * ratioh,
                (300 - padw) * ratiow,
                (400 - padh) * ratioh,
            ]
        ]
    )
    np.testing.assert_allclose(out, want)
    # device version agrees
    out_dev = np.array(g.boxes_to_original_jnp(jnp.asarray(boxes, jnp.float32)))
    np.testing.assert_allclose(out_dev, want, rtol=1e-5)


def test_resize_matches_cv2_bilinear(rng):
    img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    got = np.array(resize_bilinear(jnp.asarray(img, jnp.float32), 24, 40))
    want = cv2.resize(img.astype(np.float32), (40, 24), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_resize_upscale_matches_cv2(rng):
    img = rng.uniform(0, 255, (20, 30, 3)).astype(np.float32)
    got = np.array(resize_bilinear(jnp.asarray(img), 55, 77))
    want = cv2.resize(img, (77, 55), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_letterbox_matches_cv2_pipeline(rng):
    src = rng.integers(0, 255, (72, 128, 3)).astype(np.uint8)
    g = LetterboxGeometry(72, 128, 64, 64)
    got = np.array(letterbox(jnp.asarray(src), g))

    newh, neww = g.new_shape
    padh, padw = g.pad
    ref = np.full((64, 64, 3), 114, np.float32)
    ref[padh : padh + newh, padw : padw + neww] = cv2.resize(
        src.astype(np.float32), (neww, newh), interpolation=cv2.INTER_LINEAR
    )
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_yolo_preprocess_range_and_swap(rng):
    src = rng.integers(0, 255, (72, 128, 3)).astype(np.uint8)
    g = LetterboxGeometry(72, 128, 64, 64)
    out = np.array(yolo_preprocess(jnp.asarray(src), g))
    assert out.shape == (64, 64, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # padding rows are 114/255 in every channel
    np.testing.assert_allclose(out[0, 0], 114.0 / 255.0, rtol=1e-5)
    # channel swap: compare against manual BGR->RGB of the resized interior
    interior = np.array(letterbox(jnp.asarray(src), g))[..., ::-1] / 255.0
    np.testing.assert_allclose(out, interior, rtol=1e-5)


def test_ufld_v2_preprocess_matches_numpy_reference(rng):
    """Oracle mirrors reference ultrafastLaneDetectorV2.__prepare_input."""
    src = rng.integers(0, 255, (90, 160, 3)).astype(np.uint8)
    input_h, input_w, crop = 32, 80, 0.6
    out = np.array(ufld_v2_preprocess(jnp.asarray(src), input_h, input_w, crop))

    rgb = cv2.cvtColor(src, cv2.COLOR_BGR2RGB)
    resized = cv2.resize(
        rgb.astype(np.float32), (input_w, int(input_h / crop)),
        interpolation=cv2.INTER_LINEAR,
    )
    cropped = resized[-input_h:, :, :]
    mean = np.array([0.485, 0.456, 0.406]) * 255
    std = np.array([0.229, 0.224, 0.225]) * 255
    want = (cropped - mean) / std
    np.testing.assert_allclose(out, want, atol=1e-3)
    assert out.shape == (input_h, input_w, 3)


def test_batched_input(rng):
    src = rng.integers(0, 255, (2, 40, 60, 3)).astype(np.uint8)
    g = LetterboxGeometry(40, 60, 32, 32)
    out = np.array(yolo_preprocess(jnp.asarray(src), g))
    assert out.shape == (2, 32, 32, 3)
