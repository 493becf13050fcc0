"""int8 compute path: Int8Conv semantics, checkpoint compatibility,
accuracy delta vs f32, and the YOLOv10 NMS-free serving path.

The reference never shipped int8 (its TensorRT calibrator is commented
out, convertOnnxToTensorRT.py:28-99); BASELINE config 5 calls for int8
YOLOv10 NMS-free serving, which these tests pin down.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from adas_tpu.models.layers import ConvBN, Int8Conv, quantized
from adas_tpu.models.yolo import YoloSpec, build_yolo
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.utils.types import ObjectModelType

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


class TestInt8Conv:
    def test_matches_dequantized_torch_conv(self, rng):
        """s8 conv then rescale == f32 conv of the dequantized tensors
        (distributivity) — torch is the conv oracle."""
        x = rng.standard_normal((1, 9, 11, 3)).astype(np.float32)
        conv = Int8Conv(
            5, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=True,
        )
        variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(conv.apply(variables, jnp.asarray(x)))

        k = np.asarray(variables["params"]["kernel"])
        b = np.asarray(variables["params"]["bias"])
        ws = np.abs(k).max(axis=(0, 1, 2), keepdims=True) / 127.0
        wq = np.clip(np.round(k / ws), -127, 127)
        xs = np.abs(x).max() / 127.0
        xq = np.clip(np.round(x / xs), -127, 127)
        ty = F.conv2d(
            torch.from_numpy((xq * xs).transpose(0, 3, 1, 2)),
            torch.from_numpy((wq * ws).transpose(3, 2, 0, 1)),
            torch.from_numpy(b), stride=2, padding=1,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(y, ty, atol=1e-4)

    def test_quantization_error_bounded(self, rng):
        x = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
        conv = Int8Conv(8, (3, 3), padding=((1, 1), (1, 1)))
        variables = conv.init(jax.random.PRNGKey(1), jnp.asarray(x))
        yq = np.asarray(conv.apply(variables, jnp.asarray(x)))
        k = np.asarray(variables["params"]["kernel"])
        ty = F.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(k.transpose(3, 2, 0, 1)), padding=1,
        ).numpy().transpose(0, 2, 3, 1)
        rel = np.linalg.norm(yq - ty) / np.linalg.norm(ty)
        assert rel < 0.02, rel  # W8A8 single conv ~1% error


class TestConvBNQuantMode:
    def test_param_structure_identical(self, rng):
        """The quantized graph must consume unmodified f32 checkpoints:
        same param tree either way (kernel lives under 'conv')."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
        m = ConvBN(6, (3, 3))
        v_f32 = m.init(jax.random.PRNGKey(0), x)
        with quantized("int8"):
            v_q = m.init(jax.random.PRNGKey(0), x)
        t1 = jax.tree_util.tree_structure(v_f32)
        t2 = jax.tree_util.tree_structure(v_q)
        assert t1 == t2

    def test_quant_scope_is_trace_time(self, rng):
        """Entering the scope inside a jitted fn bakes the int8 path into
        that compilation only."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
        m = ConvBN(4, (3, 3))
        v = m.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def f32_step(v, x):
            return m.apply(v, x)

        @jax.jit
        def int8_step(v, x):
            with quantized("int8"):
                return m.apply(v, x)

        a = np.asarray(f32_step(v, x))
        b = np.asarray(int8_step(v, x))
        assert a.shape == b.shape
        assert not np.array_equal(a, b)  # int8 path actually differs
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 0.05


class TestYoloInt8:
    def test_v8_int8_accuracy_delta(self, rng):
        """Whole-graph int8 vs f32 on a small v8: bounded drift."""
        spec = YoloSpec(
            family="v8", scale="n", num_classes=4, input_size=(128, 128)
        )
        net = build_yolo(spec)
        x = jnp.asarray(
            rng.random((1, 128, 128, 3)), jnp.float32
        )
        v = net.init(jax.random.PRNGKey(0), x)
        raw_f32 = np.asarray(net.apply(v, x))
        with quantized("int8"):
            raw_int8 = np.asarray(net.apply(v, x))
        assert raw_f32.shape == raw_int8.shape
        rel = np.linalg.norm(raw_int8 - raw_f32) / np.linalg.norm(raw_f32)
        assert rel < 0.15, rel
        cos = np.dot(raw_f32.ravel(), raw_int8.ravel()) / (
            np.linalg.norm(raw_f32) * np.linalg.norm(raw_int8)
        )
        assert cos > 0.98, cos

    def test_detector_int8_mode_runs(self, rng):
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV8,
            scale="n", input_size=(128, 128), compute_dtype="int8",
            box_score=0.3,
        )
        frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        det.DetectFrame(np.asarray(frame, np.uint8))
        assert isinstance(det.object_info, list)


class TestV10NmsFree:
    def test_one2one_serving(self, rng):
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV10,
            scale="n", input_size=(128, 128), nms_free=True,
            box_score=0.45, max_det=50,
        )
        frame = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        det.DetectFrame(np.asarray(frame, np.uint8))
        infos = det.object_info
        assert len(infos) <= 50
        assert all(i.conf >= 0.45 for i in infos)

    def test_nms_free_requires_v10(self):
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV8,
            scale="n", input_size=(128, 128), nms_free=True,
        )
        with pytest.raises(ValueError, match="YOLOv10"):
            det.DetectFrame(np.zeros((128, 128, 3), np.uint8))

    def test_int8_nms_free_combo(self, rng):
        """BASELINE config 5's serving mode: int8 + NMS-free v10."""
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV10,
            scale="n", input_size=(128, 128), nms_free=True,
            compute_dtype="int8", box_score=0.45,
        )
        frame = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        det.DetectFrame(np.asarray(frame, np.uint8))
        assert isinstance(det.object_info, list)


class TestLaneInt8:
    """int8 for the UFLD trunk (models/resnet._conv): BASELINE config 5's
    int8 serving now covers the lane side, not just the YOLO side."""

    def test_ufldv2_int8_runs_and_is_close_to_f32(self, rng):
        from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
        from adas_tpu.utils.types import LaneModelType

        frame = rng.integers(0, 255, (360, 640, 3)).astype(np.uint8)
        f32 = UltrafastLaneDetectorV2(
            model_path=None, model_type=LaneModelType.UFLDV2_CULANE
        )
        q = UltrafastLaneDetectorV2(
            model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
            dtype="int8",
        )
        # identical param tree: the f32 random init serves both modes
        q.variables = f32.variables
        f32.DetectFrame(frame)
        pts_f32 = [np.asarray(p) for p in f32.lane_info.lanes_points]
        q.DetectFrame(frame)
        pts_q = [np.asarray(p) for p in q.lane_info.lanes_points]
        assert len(pts_f32) == len(pts_q) == 4
        # second shape re-traces the jitted step — the quantized() context
        # must be fresh per trace
        q.DetectFrame(rng.integers(0, 255, (480, 854, 3)).astype(np.uint8))

    def test_int8_trunk_features_error_bounded(self, rng):
        """W8A8 trunk features stay within a few percent of f32 on the
        same weights (random init, normalized input)."""
        import jax

        from adas_tpu.models.resnet import ResNetFeatures

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        f8, f16, f32f = net.apply(variables, x)
        with quantized("int8"):
            q8, q16, q32 = jax.jit(
                lambda v, x: net.apply(v, x)
            )(variables, x)
        ref = np.abs(np.asarray(f32f)).mean()
        err = np.abs(np.asarray(q32) - np.asarray(f32f)).mean()
        assert err / ref < 0.35  # deep int8 stack on random weights


class TestEfficientDetInt8:
    """int8 for EfficientDet (models/efficientdet._conv_same): config 5's
    'int8 ... + EfficientDet' pairing is now fully quantizable."""

    def test_facade_int8_runs_same_tree(self, rng):
        from adas_tpu.perception.efficientdet_detector import (
            EfficientdetDetector,
        )

        frame = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
        f32 = EfficientdetDetector(compound=0, box_score=0.3)
        q = EfficientdetDetector(
            compound=0, box_score=0.3, compute_dtype="int8"
        )
        # the int8 facade packs weights at load: params tree structure is
        # unchanged (same paths), plus a wscales collection with int8
        # kernels at the eligible convs
        assert jax.tree_util.tree_structure(
            f32.variables["params"]
        ) == jax.tree_util.tree_structure(q.variables["params"])
        assert "wscales" in q.variables
        q.DetectFrame(frame)
        assert isinstance(q.object_info, list)
        # an UNpacked f32 tree still serves (in-graph quantize fallback)
        q2 = EfficientdetDetector(
            compound=0, box_score=0.3, compute_dtype="int8"
        )
        q2.variables = f32.variables
        q2._steps = {}
        q2.DetectFrame(frame)
        assert isinstance(q2.object_info, list)

    def test_int8_boxes_close_to_f32(self, rng):
        import numpy as np

        from adas_tpu.models.efficientdet import (
            EfficientDet, EfficientDetSpec,
        )
        from adas_tpu.models.layers import quantized

        spec = EfficientDetSpec(compound=0, num_classes=6)
        net = EfficientDet(spec)
        x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        boxes_f, probs_f = net.apply(variables, x)
        with quantized("int8"):
            boxes_q, probs_q = jax.jit(
                lambda v, x: net.apply(v, x)
            )(variables, x)
        # class probabilities (sigmoid, bounded) stay close
        assert np.abs(np.asarray(probs_q) - np.asarray(probs_f)).mean() < 0.1


class TestInt8Calibration:
    """Static activation scales (the reference's commented-out TRT
    Calibrator, convertOnnxToTensorRT.py:28-99, made real)."""

    def test_single_layer_calibration_is_exact(self, rng):
        """On ONE ConvBN the recorded absmax equals the dynamic absmax,
        so static-scale serving reproduces dynamic int8 near-exactly."""
        from adas_tpu.tools.quantize import calibrate_act_scales

        m = ConvBN(16, (3, 3))
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        with quantized("int8"):
            dyn = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(v, x))

        cal = calibrate_act_scales(
            lambda vv, xi: m.apply(vv, xi, mutable=["act_scales"]), v, [x]
        )
        rec = float(
            jax.tree_util.tree_leaves(cal["act_scales"])[0]
        )
        assert rec == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)
        with quantized("int8"):
            stat = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(cal, x))
        # one round()-boundary flip (jitted vs unjitted absmax last-ulp)
        # moves isolated outputs by one quant step — tolerance covers it
        np.testing.assert_allclose(dyn, stat, rtol=0.02, atol=0.02)

    def test_whole_net_calibration_matches_dynamic(self, rng):
        """Static scales reproduce dynamic int8 through a deep stack up
        to quantization-boundary flips: static and dynamic are different
        XLA programs, so float reassociation flips occasional round()
        boundaries by one step, which cascades — bounded in the MEAN,
        not elementwise."""
        from adas_tpu.models.resnet import ResNetFeatures
        from adas_tpu.tools.quantize import calibrate_act_scales

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)

        with quantized("int8"):
            dyn = jax.jit(lambda v, x: net.apply(v, x))(variables, x)

        calibrated = calibrate_act_scales(
            lambda v, xi: net.apply(v, xi, mutable=["act_scales"]),
            variables, [x],
        )
        assert "act_scales" in calibrated
        scales = jax.tree_util.tree_leaves(calibrated["act_scales"])
        assert len(scales) > 10 and all(float(s) > 0 for s in scales)

        with quantized("int8"):
            stat = jax.jit(lambda v, x: net.apply(v, x))(calibrated, x)
        for d, s in zip(dyn, stat):
            d, s = np.asarray(d), np.asarray(s)
            assert np.abs(d - s).mean() / np.abs(d).mean() < 0.05

    def test_packed_weights_match_in_graph_quantize(self, rng):
        """pack_int8_weights' host math == the in-graph weight quantize:
        serving a packed tree reproduces the unpacked int8 graph to
        float-reassociation noise, with int8 kernels + wscales in the
        tree (TRT's offline engine build made real)."""
        from adas_tpu.models.resnet import ResNetFeatures
        from adas_tpu.tools.quantize import pack_int8_weights

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        packed = pack_int8_weights(
            lambda v: net.apply(v, x, mutable=["wscales"]), variables
        )
        assert "wscales" in packed
        n_int8 = sum(
            1
            for leaf in jax.tree_util.tree_leaves(packed["params"])
            if hasattr(leaf, "dtype") and leaf.dtype == np.int8
        )
        assert n_int8 == 19  # every trunk conv; stem (bf16 policy) not
        with quantized("int8"):
            a = jax.jit(lambda v, x: net.apply(v, x))(variables, x)
        with quantized("int8"):
            b = jax.jit(lambda v, x: net.apply(v, x))(packed, x)
        for u, p in zip(a, b):
            u, p = np.asarray(u), np.asarray(p)
            # 3%: host-vs-graph weight quantize differs only in float
            # reassociation, but each flipped round() boundary cascades
            # through the stack and the bf16 inter-layer storage rounds
            # once more per layer
            assert np.abs(u - p).mean() / max(np.abs(u).mean(), 1e-6) < 0.03

    def test_running_max_across_samples(self, rng):
        from adas_tpu.models.resnet import ResNetFeatures
        from adas_tpu.tools.quantize import calibrate_act_scales

        net = ResNetFeatures(depth="18")
        x1 = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
        x2 = x1 * 3.0
        variables = net.init(jax.random.PRNGKey(0), x1)
        c1 = calibrate_act_scales(
            lambda v, xi: net.apply(v, xi, mutable=["act_scales"]),
            variables, [x1],
        )
        c12 = calibrate_act_scales(
            lambda v, xi: net.apply(v, xi, mutable=["act_scales"]),
            variables, [x1, x2],
        )
        # the stem conv absmax must follow the larger sample
        s1 = jax.tree_util.tree_leaves(c1["act_scales"])
        s12 = jax.tree_util.tree_leaves(c12["act_scales"])
        assert sum(float(b) >= float(a) for a, b in zip(s1, s12)) == len(s1)
        assert any(float(b) > float(a) * 2 for a, b in zip(s1, s12))

    def test_yolo_facade_calibration(self, rng):
        frames = [
            rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
            for _ in range(2)
        ]
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
            input_size=(64, 64), compute_dtype="int8", box_score=0.3,
        )
        det.calibrate_int8(frames)
        assert "act_scales" in det.variables
        det.DetectFrame(frames[0])
        assert isinstance(det.object_info, list)

    def test_calibration_requires_int8_mode(self):
        det = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
            input_size=(64, 64),
        )
        with pytest.raises(ValueError):
            det.calibrate_int8([])


class TestInt8Policy:
    def test_depthwise_conv_serves_bf16_under_int8(self, rng):
        """Grouped/depthwise convs are int8-ineligible (VPU-bound; the
        quantize passes only cost) and run bf16 under quantized("int8");
        param tree is unchanged either way."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
        m = ConvBN(8, (3, 3), groups=8)
        v = m.init(jax.random.PRNGKey(0), x)
        with quantized("int8"):
            v_q = m.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_q)
        ref = np.asarray(m.apply(v, x))
        with quantized("int8"):
            got = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(v, x))
        # bf16 rounding only — much tighter than int8 quantization noise
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_tiny_cin_stem_not_quantized(self, rng):
        """C_in<=4 stems (lane-padding-bound) also serve bf16."""
        from adas_tpu.models.layers import int8_conv_eligible

        assert not int8_conv_eligible(1, 3)
        assert not int8_conv_eligible(8, 64)
        assert int8_conv_eligible(1, 64)


class TestS8Chain:
    """s8-CHAINED activations (layers._S8_CHAIN): on single-consumer
    conv->conv edges the producer's epilogue emits an int8 QTensor
    quantized with its calibrated output scale and the consumer skips
    its input quantize — the int8 activation chaining TRT's engine
    builder does between int8 layers (convertOnnxToTensorRT.py:28-99
    builds whole-network int8)."""

    def _calibrated_v8n(self, rng):
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family="v8", scale="n", num_classes=80, input_size=(96, 96)
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        return net, v, cal, x

    def test_chain_matches_unchained(self, rng):
        """Chained and unchained calibrated int8 agree (same scales —
        the producer's ymax IS the consumer's xmax tensor — so only
        round()-boundary flips differ; bounded in the mean)."""
        from adas_tpu.models import layers as L

        net, _, cal, x = self._calibrated_v8n(rng)
        ymax = [
            p
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
            if "ymax" in str(p)
        ]
        assert len(ymax) >= 10, ymax  # chained edges recorded

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)

            def f_off(v, xx):
                with quantized("int8"):
                    return net.apply(v, xx)

            off = np.asarray(jax.jit(f_off)(cal, x), np.float32)
            L.set_s8_chain(True)

            def f_on(v, xx):
                with quantized("int8"):
                    return net.apply(v, xx)

            on = np.asarray(jax.jit(f_on)(cal, x), np.float32)
        finally:
            L.set_s8_chain(prev)
        assert np.abs(on - off).mean() / np.abs(off).mean() < 0.01

    def test_chain_inactive_without_calibration(self, rng):
        """Uncalibrated int8 serving (dynamic scales) cannot chain (no
        static producer scale) and must run unchanged."""
        net, v, _, x = self._calibrated_v8n(rng)

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        out = np.asarray(jax.jit(f)(v, x), np.float32)
        assert np.isfinite(out).all()

    def test_resnet_chain_accuracy_not_degraded(self, rng):
        """The lane trunk's BasicBlock conv1->conv2 edges chain.  An
        untrained deep stack amplifies round()-boundary flips between
        the two int8 programs, so chained-vs-unchained is noisy (2-3%
        mean here) — the meaningful invariant is that chaining does not
        degrade accuracy AGAINST THE F32 REFERENCE (measured: equal to
        3 significant digits either way)."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.resnet import ResNetFeatures
        from adas_tpu.tools.quantize import calibrate_act_scales

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        ref = net.apply(v, x)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)

            def f_off(vv, xx):
                with quantized("int8"):
                    return net.apply(vv, xx)

            off = jax.jit(f_off)(cal, x)
            L.set_s8_chain(True)

            def f_on(vv, xx):
                with quantized("int8"):
                    return net.apply(vv, xx)

            on = jax.jit(f_on)(cal, x)
        finally:
            L.set_s8_chain(prev)
        for r, a, b in zip(jax.tree_util.tree_leaves(ref),
                           jax.tree_util.tree_leaves(off),
                           jax.tree_util.tree_leaves(on)):
            r, a, b = (np.asarray(t, np.float32) for t in (r, a, b))
            err_off = np.abs(a - r).mean() / np.abs(r).mean()
            err_on = np.abs(b - r).mean() / np.abs(r).mean()
            assert err_on < err_off * 1.1 + 1e-4, (err_on, err_off)

    def test_qtensor_into_ineligible_consumer_dequants(self, rng):
        """A QTensor reaching an int8-ineligible ConvBN (depthwise) is
        transparently dequantized to bf16 — chaining never changes WHERE
        int8 runs, only how activations travel between int8 convs."""
        from adas_tpu.models.layers import QTensor

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
        scale = jnp.asarray(np.abs(np.asarray(x)).max() / 127.0, jnp.float32)
        q = QTensor(
            jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8),
            scale,
        )
        m = ConvBN(8, (3, 3), groups=8)
        v = m.init(jax.random.PRNGKey(0), x)

        def f(vv, xq):
            with quantized("int8"):
                return m.apply(vv, xq)

        got = np.asarray(jax.jit(f)(v, q), np.float32)
        ref = np.asarray(m.apply(v, x), np.float32)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel

    def test_chain_with_packed_weights(self, rng):
        """Chaining composes with load-time weight packing (int8 kernels
        + wscales) — the full TRT-grade serving configuration."""
        from adas_tpu.models import layers as L
        from adas_tpu.tools.quantize import (
            calibrate_act_scales,
            pack_int8_weights,
        )

        spec = YoloSpec(
            family="v8", scale="n", num_classes=80, input_size=(96, 96)
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        packed = pack_int8_weights(
            lambda vv: net.apply(vv, x, mutable=["wscales"]), cal
        )

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        got = np.asarray(jax.jit(f)(packed, x), np.float32)

        def f2(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        want = np.asarray(jax.jit(f2)(cal, x), np.float32)
        assert np.abs(got - want).mean() / np.abs(want).mean() < 0.01

    def test_recalibrate_store_without_ymax(self, rng):
        """Re-calibrating a store whose act_scales predate chaining
        (xmax-only tree — e.g. calibrated with ADAS_INT8_S8CHAIN=0 or
        saved by the quantize CLI before chaining existed) must union
        the new ymax leaves in, not crash on the pytree mismatch."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.resnet import ResNetFeatures
        from adas_tpu.tools.quantize import calibrate_act_scales

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        apply_fn = lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"])

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            old_store = calibrate_act_scales(apply_fn, v, [x])
            assert not any(
                "ymax" in str(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(
                    old_store["act_scales"]
                )
            )
            L.set_s8_chain(True)
            re_cal = calibrate_act_scales(apply_fn, old_store, [x * 2.0])
        finally:
            L.set_s8_chain(prev)
        leaves = jax.tree_util.tree_leaves_with_path(re_cal["act_scales"])
        assert any("ymax" in str(p) for p, _ in leaves)
        # running maxima survive the union (2x input dominates)
        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        out = jax.jit(f)(re_cal, x)
        for t in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(t, np.float32)).all()


class TestS8ConcatGroups:
    """TRT-style int8 CONCAT groups (layers.s8_group_scale/qconcat):
    every producer feeding a block concat (C2f parts, C3 branches,
    SPPF pyramid) emits at ONE calibrated scale, the concat happens on
    1-byte data, and the consumer conv reads it with no input-quantize
    pass — the multi-consumer edges the per-producer ymax chaining
    could not cover (reference sketch: convertOnnxToTensorRT.py:28-99)."""

    def _calibrated(self, rng, family="v8", scale="n"):
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family=family, scale=scale, num_classes=80,
            input_size=(96, 96),
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        return net, v, cal, x

    def test_group_scales_recorded_and_concats_s8(self, rng):
        """Calibration writes concat_xmax vars; serving performs the
        block concats in the s8 domain (trace counters prove it on the
        actual compiled graph)."""
        from adas_tpu.models import layers as L

        net, _, cal, x = self._calibrated(rng)
        groups = [
            p
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
            if "concat_xmax" in str(p)
        ]
        # v8n: 8 C2f blocks + SPPF
        assert len(groups) >= 9, groups

        L.reset_trace_stats()

        def f(v, xx):
            with quantized("int8"):
                return net.apply(v, xx)

        jax.jit(f).lower(cal, x)  # trace only
        stats = L.trace_stats()
        assert stats["s8_group_concats"] >= 9, stats
        # every C2f contributes n+2 emissions, SPPF one
        assert stats["s8_emits"] >= 20, stats
        assert stats["s8_consumes"] >= stats["s8_group_concats"], stats

    def test_group_chain_accuracy_vs_f32(self, rng):
        """Group chaining must not degrade accuracy AGAINST F32 compared
        to unchained calibrated int8 (same invariant as the resnet chain
        test: chained-vs-unchained differ by round() placement, so the
        f32 reference is the meaningful yardstick)."""
        from adas_tpu.models import layers as L

        net, v, cal, x = self._calibrated(rng)
        f32 = np.asarray(net.apply(v, x), np.float32)

        def int8_out():
            def f(vv, xx):
                with quantized("int8"):
                    return net.apply(vv, xx)

            return np.asarray(jax.jit(f)(cal, x), np.float32)

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            off = int8_out()
            L.set_s8_chain(True)
            on = int8_out()
        finally:
            L.set_s8_chain(prev)

        scale = np.abs(f32).mean()
        err_off = np.abs(off - f32).mean() / scale
        err_on = np.abs(on - f32).mean() / scale
        # chained error may differ but not degrade materially (the
        # group scale is the concat's own calibrated absmax)
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_v6_deploy_whole_net_s8(self, rng):
        """YOLOv6 deploy form (RepVGG switch_to_deploy at load) chains
        s8 through essentially the WHOLE network: every edge is
        conv→conv, the four PAN concats ride independent neck group
        scales owned by YoloV6, SimSPPF carries a block-local group,
        and only the Cin=3 stem serves bf16 (models/yolov6.py)."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.models.yolov6 import fuse_repvgg_variables
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family="v6", scale="s", num_classes=80, input_size=(96, 96),
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = fuse_repvgg_variables(
            net.init(jax.random.PRNGKey(0), x)
        )
        f32 = np.asarray(net.apply(v, x), np.float32)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        groups = [
            str(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
            if "xmax" in str(p)
        ]
        for name in (
            "neck_p4_xmax", "neck_p3_xmax", "neck_n3_xmax", "neck_n4_xmax",
        ):
            assert any(name in g for g in groups), (name, groups)

        L.reset_trace_stats()

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        jax.jit(f).lower(cal, x)  # trace only
        stats = L.trace_stats()
        # 4 neck groups + SimSPPF group concat in the s8 domain
        assert stats["s8_group_concats"] >= 5, stats
        # whole-net chain: all but a handful of int8 convs read s8
        assert stats["int8_convs"] >= 45, stats
        assert stats["s8_consumes"] >= stats["int8_convs"] - 2, stats
        assert stats["bf16_convs"] <= 1, stats

        # accuracy yardstick is unchained calibrated int8 (the f32 gap
        # itself is set by random-weight quantization, not by chaining)
        def int8_out():
            # fresh function identity per call: jax's global jit cache
            # keys on function id, so reusing ``f`` (already traced by
            # the .lower above) would return the earlier graph and
            # compare chain-on against itself
            g = lambda vv, xx: f(vv, xx)  # noqa: E731
            return np.asarray(jax.jit(g)(cal, x), np.float32)

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            off = int8_out()
            L.set_s8_chain(True)
            on = int8_out()
        finally:
            L.set_s8_chain(prev)
        scale_m = np.abs(f32).mean()
        err_off = np.abs(off - f32).mean() / scale_m
        err_on = np.abs(on - f32).mean() / scale_m
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_v9_gelan_s8_groups(self, rng):
        """YOLOv9 (GELAN): every RepNCSPELAN4/RepNCSP/SPPELAN concat is
        a block-local s8 group, ADown concats emit at the consumer's
        scale, and the PAN concats ride the same two unified neck
        groups as v8 (p5 and t1 each feed two concats —
        models/yolov9.py)."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family="v9", scale="c", num_classes=80, input_size=(96, 96),
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        f32 = np.asarray(net.apply(v, x), np.float32)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        groups = [
            str(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
            if "xmax" in str(p)
        ]
        assert any("neck_a_xmax" in g for g in groups), groups
        assert any("neck_b_xmax" in g for g in groups), groups

        L.reset_trace_stats()

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        jax.jit(f).lower(cal, x)  # trace only
        stats = L.trace_stats()
        # 8 ELAN + 16 RepNCSP + SPPELAN + 3 backbone ADown + 4 PAN
        # concats in the s8 domain
        assert stats["s8_group_concats"] >= 30, stats
        assert stats["s8_consumes"] >= 40, stats

        def int8_out():
            # fresh function identity per call: jax's global jit cache
            # keys on function id, so reusing ``f`` (already traced by
            # the .lower above) would return the earlier graph and
            # compare chain-on against itself
            g = lambda vv, xx: f(vv, xx)  # noqa: E731
            return np.asarray(jax.jit(g)(cal, x), np.float32)

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            off = int8_out()
            L.set_s8_chain(True)
            on = int8_out()
        finally:
            L.set_s8_chain(prev)
        scale_m = np.abs(f32).mean()
        err_off = np.abs(off - f32).mean() / scale_m
        err_on = np.abs(on - f32).mean() / scale_m
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_v7_elan_s8_groups(self, rng):
        """YOLOv7 (E-ELAN): every concat in the yaml graph is an s8
        group owned by YoloV7 (the blocks are closures, named by yaml
        layer index) — ELAN taps are multi-consumer conv edges emitting
        at the group scale, MP blocks emit both members at one scale,
        SPPCSPC carries two module-local groups, and the SPPCSPC/ELAN-W
        route taps emit at the downstream head_mp group's scale
        (models/yolov7.py)."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family="v7", scale="base", num_classes=80, input_size=(96, 96),
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        f32 = np.asarray(net.apply(v, x), np.float32)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        groups = {
            str(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
        }
        for name in (
            "elan4_xmax", "mp12_xmax", "cat55_xmax", "cat67_xmax",
            "mp76_xmax", "mp89_xmax",
        ):
            assert any(name in g for g in groups), (name, groups)

        L.reset_trace_stats()

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        jax.jit(f).lower(cal, x)  # trace only
        stats = L.trace_stats()
        # 8 ELAN/ELAN-W + 5 MP + 2 laterals + 2 SPPCSPC concats s8
        assert stats["s8_group_concats"] >= 17, stats
        # whole-graph chain: all but the Cin=3 stem read s8
        assert stats["s8_consumes"] >= stats["int8_convs"] - 2, stats
        assert stats["bf16_convs"] <= 1, stats

        def int8_out():
            # fresh function identity per call: jax's global jit cache
            # keys on function id, so reusing ``f`` (already traced by
            # the .lower above) would return the earlier graph and
            # compare chain-on against itself
            g = lambda vv, xx: f(vv, xx)  # noqa: E731
            return np.asarray(jax.jit(g)(cal, x), np.float32)

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            off = int8_out()
            L.set_s8_chain(True)
            on = int8_out()
        finally:
            L.set_s8_chain(prev)
        scale_m = np.abs(f32).mean()
        err_off = np.abs(off - f32).mean() / scale_m
        err_on = np.abs(on - f32).mean() / scale_m
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_v5lite_g_whole_net_s8(self, rng):
        """v5Lite-g deploy form (RepVGG fused at ingest): RepBackbone's
        tap-exit flag expressions and LitePAN's cross-scope unified neck
        groups chain s8 through essentially the whole net — a regression
        in the emit-flag branches must not merge silently (ADVICE r4).
        Thresholds pinned from the 2026-08 trace (47 int8 convs, 40
        consumes, 9 group concats at 96x96)."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family="v5lite", scale="g", num_classes=80,
            input_size=(96, 96),
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        f32 = np.asarray(net.apply(v, x), np.float32)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        groups = [
            str(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
            if "xmax" in str(p)
        ]
        for name in ("neck_a_xmax", "neck_b_xmax"):
            assert any(name in g for g in groups), (name, groups)

        L.reset_trace_stats()

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        jax.jit(f).lower(cal, x)  # trace only
        stats = L.trace_stats()
        assert stats["int8_convs"] >= 45, stats
        assert stats["s8_consumes"] >= 38, stats
        assert stats["s8_group_concats"] >= 9, stats
        assert stats["bf16_convs"] <= 1, stats  # only the Cin=3 stem

        def int8_out():
            g = lambda vv, xx: f(vv, xx)  # noqa: E731 fresh identity
            return np.asarray(jax.jit(g)(cal, x), np.float32)

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            off = int8_out()
            L.set_s8_chain(True)
            on = int8_out()
        finally:
            L.set_s8_chain(prev)
        scale_m = np.abs(f32).mean()
        err_off = np.abs(off - f32).mean() / scale_m
        err_on = np.abs(on - f32).mean() / scale_m
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_v10_whole_net_s8(self, rng):
        """YOLOv10s calibrated chains: PSA emit_scale exit into group A,
        SCDown's explicit quantize_to, C2fCIB group concats, the
        depthwise CIB/PSA layers correctly held bf16 by the precision
        policy (ADVICE r4).  Thresholds pinned from the 2026-08 trace
        (62 int8 convs, 38 consumes, 13 group concats at 96x96)."""
        from adas_tpu.models import layers as L
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.quantize import calibrate_act_scales

        spec = YoloSpec(
            family="v10", scale="s", num_classes=80, input_size=(96, 96),
        )
        net = build_yolo(spec)
        x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        f32 = np.asarray(net.apply(v, x), np.float32)
        cal = calibrate_act_scales(
            lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]),
            v, [x],
        )
        groups = [
            str(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(
                cal["act_scales"]
            )
            if "xmax" in str(p)
        ]
        for name in ("neck_a_xmax", "neck_b_xmax"):
            assert any(name in g for g in groups), (name, groups)

        L.reset_trace_stats()

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        jax.jit(f).lower(cal, x)  # trace only
        stats = L.trace_stats()
        assert stats["int8_convs"] >= 58, stats
        assert stats["s8_consumes"] >= 35, stats
        assert stats["s8_group_concats"] >= 12, stats
        # CIB depthwise + PSA attention layers serve bf16 by policy
        assert stats["bf16_convs"] >= 10, stats

        def int8_out():
            g = lambda vv, xx: f(vv, xx)  # noqa: E731 fresh identity
            return np.asarray(jax.jit(g)(cal, x), np.float32)

        prev = L._S8_CHAIN
        try:
            L.set_s8_chain(False)
            off = int8_out()
            L.set_s8_chain(True)
            on = int8_out()
        finally:
            L.set_s8_chain(prev)
        scale_m = np.abs(f32).mean()
        err_off = np.abs(off - f32).mean() / scale_m
        err_on = np.abs(on - f32).mean() / scale_m
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_sppf_pools_commute_with_quantize(self, rng):
        """max_pool_q(s8) == quantize(max_pool(dequant)) exactly."""
        from adas_tpu.models.layers import QTensor, max_pool, max_pool_q

        data = jnp.asarray(
            rng.integers(-127, 128, (1, 12, 16, 8)), jnp.int8
        )
        q = QTensor(data, jnp.float32(0.03))
        pooled = max_pool_q(q, 5, 1, 2)
        # compare in the exact f32 domain (dequant() itself rounds to
        # bf16 for the conv path, which is not the pool's fault)
        ref = max_pool(data.astype(jnp.float32) * q.scale, 5, 1, 2)
        got = pooled.data.astype(jnp.float32) * pooled.scale
        # -inf padding vs -128 padding both lose to any real value
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6)
