"""YOLO model + decode + facade tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adas_tpu.models.yolo import YoloSpec, YoloV5, YoloV8, YoloV10, build_yolo
from adas_tpu.ops.yolo_decode import (
    decode_predictions,
    select_and_nms,
    v5lite_grid_decode,
)
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.utils.types import ObjectModelType

SMALL = (64, 64)


@pytest.mark.parametrize("family,scale", [("v5", "n"), ("v8", "n")])
def test_yolo_output_contract(family, scale):
    spec = YoloSpec(family=family, scale=scale, num_classes=7, input_size=SMALL)
    net = build_yolo(spec)
    x = jnp.zeros((1, *SMALL, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    n_anchors = spec.num_anchors
    if family == "v8":
        assert out.shape == (1, 4 + 7, n_anchors)
    else:
        assert out.shape == (1, n_anchors * 3, 5 + 7)


@pytest.mark.slow
def test_yolov10_dual_heads():
    spec = YoloSpec(family="v10", scale="n", num_classes=5, input_size=SMALL)
    net = YoloV10(spec, max_det=17)
    x = jnp.zeros((1, *SMALL, 3))
    variables = net.init(jax.random.PRNGKey(0), x, method=net.both)
    raw = net.apply(variables, x)
    assert raw.shape == (1, 9, spec.num_anchors)
    o2o = net.apply(variables, x, method=net.one2one)
    assert o2o.shape == (1, 17, 6)
    # scores sorted descending
    scores = np.asarray(o2o[0, :, 4])
    assert (np.diff(scores) <= 1e-6).all()


def test_v8_boxes_positive_wh():
    spec = YoloSpec(family="v8", scale="n", num_classes=3, input_size=SMALL)
    net = YoloV8(spec)
    x = jnp.zeros((1, *SMALL, 3))
    variables = net.init(jax.random.PRNGKey(1), x)
    out = np.asarray(net.apply(variables, x))[0].T  # (N, 7)
    assert (out[:, 2] > 0).all() and (out[:, 3] > 0).all()  # w, h
    assert (out[:, 4:] >= 0).all() and (out[:, 4:] <= 1).all()  # sigmoid cls


class TestDecode:
    def test_v8_contract(self):
        # two anchors, 3 classes, one confident detection
        raw = np.zeros((7, 2), np.float32)
        raw[:, 0] = [100, 100, 20, 10, 0.1, 0.9, 0.2]
        raw[:, 1] = [50, 50, 10, 10, 0.2, 0.1, 0.3]
        boxes, scores, ids = decode_predictions(
            jnp.asarray(raw), ObjectModelType.YOLOV8, 3
        )
        np.testing.assert_allclose(np.asarray(boxes[0]), [90, 95, 110, 105])
        assert float(scores[0]) == pytest.approx(0.9)
        assert int(ids[0]) == 1

    def test_v5_contract_obj_conf_multiplies(self):
        raw = np.zeros((2, 8), np.float32)
        raw[0] = [100, 100, 20, 10, 0.5, 0.8, 0.2, 0.1]
        boxes, scores, ids = decode_predictions(
            jnp.asarray(raw), ObjectModelType.YOLOV5, 3
        )
        assert float(scores[0]) == pytest.approx(0.4)  # 0.5 * 0.8
        assert int(ids[0]) == 0

    def test_v5lite_grid_decode_matches_reference_math(self):
        """Freshly-derived oracle of YoloLiteParameters.lite_postprocess."""
        input_hw = (32, 32)
        n = sum(3 * (32 // s) * (32 // s) for s in (8, 16, 32))
        rng = np.random.default_rng(3)
        out = rng.uniform(0.0, 1.0, (n, 6)).astype(np.float32)

        got = np.asarray(v5lite_grid_decode(jnp.asarray(out), input_hw))

        # oracle
        anchors = np.array(
            [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
             [116, 90, 156, 198, 373, 326]], np.float32,
        ).reshape(3, 3, 2)
        expected = out.copy()
        row = 0
        for i, stride in enumerate((8, 16, 32)):
            g = 32 // stride
            length = 3 * g * g
            yv, xv = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
            grid = np.stack([xv, yv], -1).reshape(-1, 2).astype(np.float32)
            grid = np.tile(grid, (3, 1))
            expected[row : row + length, 0:2] = (
                expected[row : row + length, 0:2] * 2 - 0.5 + grid
            ) * stride
            expected[row : row + length, 2:4] = (
                expected[row : row + length, 2:4] * 2
            ) ** 2 * np.repeat(anchors[i], g * g, axis=0)
            row += length
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_select_and_nms_shapes_and_padding(self, rng):
        n = 50
        boxes = rng.uniform(0, 600, (n, 2))
        boxes = np.concatenate(
            [boxes, boxes + rng.uniform(10, 60, (n, 2))], axis=1
        ).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ids = rng.integers(0, 5, n)
        dets = np.asarray(
            select_and_nms(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ids),
                box_score=0.5, iou_threshold=0.45, max_det=20,
            )
        )
        assert dets.shape == (20, 6)
        valid = dets[dets[:, 4] > 0]
        assert (valid[:, 4] > 0.5).all()
        # descending score order
        assert (np.diff(valid[:, 4]) <= 1e-6).all()


class TestYoloDetectorFacade:
    @pytest.fixture(scope="class")
    def detector(self):
        YoloDetector.set_defaults(
            {
                "model_path": None,
                "model_type": ObjectModelType.YOLOV8,
                "classes_path": None,
                "box_score": 0.25,
                "box_nms_iou": 0.45,
                "scale": "n",
                "max_det": 20,
                "input_size": (64, 64),
            }
        )
        return YoloDetector()

    def test_detect_frame_runs(self, detector, rng):
        frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        detector.DetectFrame(frame)
        infos = detector.object_info
        assert isinstance(infos, list)
        for info in infos:
            assert info.label in detector.class_names or info.label == "unknown"
            assert info.conf > 0.25

    def test_80_class_default_labels(self, detector):
        assert len(detector.class_names) == 80
        assert detector.class_names[0] == "person"
        assert detector.class_names[2] == "car"

    def test_object_info_before_detect_warns(self):
        det = YoloDetector()
        assert det.object_info == []


@pytest.mark.slow
def test_yolov9_gelan_graph():
    """Native GELAN-C trunk emits the v8 output contract and runs through
    the detector facade."""
    import jax

    from adas_tpu.models.yolo import YoloSpec, build_yolo

    spec = YoloSpec(family="v9", scale="c", num_classes=12,
                    input_size=(64, 64))
    net = build_yolo(spec)
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    n = sum((64 // s) ** 2 for s in (8, 16, 32))
    assert out.shape == (1, 4 + 12, n)

    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.utils.types import ObjectModelType

    det = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV9,
        input_size=(64, 64), box_score=0.2,
    )
    assert det.spec.family == "v9" and det.spec.scale == "c"
    frame = np.random.default_rng(0).integers(
        0, 255, (48, 64, 3), dtype=np.uint8
    )
    det.DetectFrame(frame)
    assert isinstance(det.object_info, list)


@pytest.mark.slow
def test_v6_v7_native_facades(rng):
    """YOLOV6/YOLOV7 now build their real native graphs (EfficientRep /
    E-ELAN), not the v5 stand-in."""
    from adas_tpu.models.yolov6 import YoloV6
    from adas_tpu.models.yolov7 import YoloV7

    frame = rng.integers(0, 255, size=(120, 160, 3)).astype("uint8")
    d6 = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV6, scale="n",
        input_size=(64, 64), box_score=0.3,
    )
    assert isinstance(d6.net, YoloV6)
    d6.DetectFrame(frame)
    assert isinstance(d6.object_info, list)

    d7 = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV7,
        input_size=(64, 64), box_score=0.3,
    )
    assert isinstance(d7.net, YoloV7)
    d7.DetectFrame(frame)
    assert isinstance(d7.object_info, list)


@pytest.mark.slow
def test_v5lite_native_facade(rng):
    """YOLOV5_LITE builds the real ShuffleNetV2 graph whose output is
    PRE-grid (reference export contract) — the facade's
    v5lite_grid_decode then applies the reference lite_postprocess
    semantics exactly once (previously the v5 stand-in double-decoded)."""
    from adas_tpu.models.yolov5lite import YoloV5Lite

    frame = rng.integers(0, 255, size=(120, 160, 3)).astype("uint8")
    for scale in ("e", "s", "g"):
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV5_LITE,
            scale=scale, input_size=(64, 64), box_score=0.3,
        )
        assert isinstance(det.net, YoloV5Lite)
        assert det.spec.family == "v5lite"
        raw = det.net.apply(
            det.variables, jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        n = sum(3 * (64 // s) * (64 // s) for s in (8, 16, 32))
        assert raw.shape == (1, n, 5 + len(det.class_names))
        # pre-grid contract: every value still sigmoided
        assert float(raw.min()) >= 0.0 and float(raw.max()) <= 1.0
        det.DetectFrame(frame)
        assert isinstance(det.object_info, list)
