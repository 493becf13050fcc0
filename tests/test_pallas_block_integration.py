"""Model-level integration of the fused two-conv Pallas block
(ops/pallas_block.py): ResNet BasicBlock bodies (the UFLD lane trunk)
and YOLO C2f bottleneck bodies route through ONE kernel under
calibrated int8 serving with ``ADAS_PALLAS_BLOCK=1`` (force mode —
interpret execution off-TPU), with the XLA path as the exact fallback.

Mirrors tests/test_int8.py TestS8Chain's yardstick: the fused path's
output error vs f32 must stay within 1.3x the unfused calibrated-int8
error (the fused chain adds one producer-scale requantize between
blocks — the same math the consumer's own input quantize performs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.models import layers as L
from adas_tpu.models.layers import quantized

pytestmark = pytest.mark.slow


def _calibrate(net, v, xs):
    from adas_tpu.tools.quantize import calibrate_act_scales

    return calibrate_act_scales(
        lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]), v, xs
    )


class TestResNetBlocks:
    @pytest.mark.parametrize("layout", ["nhwc", "planar"])
    def test_lane_trunk_fused_blocks(self, rng, monkeypatch, layout):
        """ResNet18 layer1 (2 stride-1 blocks at 80x80x64 for a 320^2
        input) serves both bodies via the fused kernel — both I/O
        layouts — and matches the XLA path within the yardstick."""
        monkeypatch.setenv("ADAS_PALLAS_BLOCK_LAYOUT", layout)
        from adas_tpu.models.resnet import ResNetFeatures

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(
            rng.standard_normal((1, 320, 320, 3)) * 40, jnp.float32
        )
        v = net.init(jax.random.PRNGKey(0), x)
        f32 = [np.asarray(t, np.float32) for t in net.apply(v, x)]
        cal = _calibrate(net, v, [x])
        # round-5 calibration records the block-level output absmax
        flat = jax.tree_util.tree_leaves_with_path(cal["act_scales"])
        assert any("out_ymax" in str(p) for p, _ in flat)

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        # XLA baseline (policy off)
        monkeypatch.setenv("ADAS_PALLAS_BLOCK", "0")
        jax.clear_caches()  # the policy is read at trace time
        L.reset_trace_stats()
        off = [np.asarray(t, np.float32) for t in jax.jit(f)(cal, x)]
        assert L.trace_stats()["pallas_blocks"] == 0

        # fused path (force mode: interpret execution on CPU)
        monkeypatch.setenv("ADAS_PALLAS_BLOCK", "1")
        jax.clear_caches()
        L.reset_trace_stats()
        on = [np.asarray(t, np.float32) for t in jax.jit(f)(cal, x)]
        stats = L.trace_stats()
        # layer1 has exactly two stride-1 64-ch blocks at 80x80 — both
        # fused; deeper stages exceed the channel gate
        assert stats["pallas_blocks"] == 2, stats

        for a, b, r in zip(on, off, f32):
            scale_m = np.abs(r).mean()
            err_on = np.abs(a - r).mean() / scale_m
            err_off = np.abs(b - r).mean() / scale_m
            assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_stale_calibration_falls_back(self, rng, monkeypatch):
        """A calibration tree without out_ymax (pre-round-5 artifact)
        must serve the XLA path, never crash."""
        from adas_tpu.models.resnet import ResNetFeatures

        net = ResNetFeatures(depth="18")
        x = jnp.asarray(rng.standard_normal((1, 320, 320, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        cal = _calibrate(net, v, [x])
        scales = jax.tree_util.tree_map(lambda t: t, cal["act_scales"])

        def strip(d):
            return {
                k: strip(val) if isinstance(val, dict) else val
                for k, val in d.items()
                if k != "out_ymax"
            }

        cal = dict(cal)
        cal["act_scales"] = strip(scales)
        monkeypatch.setenv("ADAS_PALLAS_BLOCK", "1")
        jax.clear_caches()
        L.reset_trace_stats()

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        jax.jit(f).lower(cal, x)  # trace only — no interpret execution
        assert L.trace_stats()["pallas_blocks"] == 0


class TestYoloBottlenecks:
    def test_v8_c2f_bodies_fused(self, rng, monkeypatch):
        """YOLOv8n C2f bottleneck bodies (3x3/3x3, concat-group output
        scale) route through the fused kernel; output matches the XLA
        s8-group path within the yardstick."""
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.ops import pallas_block as PBK

        # v8n hidden widths are below the serving channel gate at this
        # input size — widen the gate for the test (the gate itself is
        # covered by unit tests; eligibility plumbing is under test)
        monkeypatch.setattr(
            PBK, "block_shape_wins", lambda h, w, c: h * w >= 256
        )
        spec = YoloSpec(
            family="v8", scale="n", num_classes=80, input_size=(128, 128),
        )
        net = build_yolo(spec)
        x = jnp.asarray(
            rng.standard_normal((1, 128, 128, 3)) * 30, jnp.float32
        )
        v = net.init(jax.random.PRNGKey(0), x)
        f32 = np.asarray(net.apply(v, x), np.float32)
        cal = _calibrate(net, v, [x])

        def f(vv, xx):
            with quantized("int8"):
                return net.apply(vv, xx)

        monkeypatch.setenv("ADAS_PALLAS_BLOCK", "0")
        jax.clear_caches()  # the policy is read at trace time
        L.reset_trace_stats()
        off = np.asarray(jax.jit(f)(cal, x), np.float32)
        assert L.trace_stats()["pallas_blocks"] == 0

        monkeypatch.setenv("ADAS_PALLAS_BLOCK", "1")
        jax.clear_caches()
        L.reset_trace_stats()
        on = np.asarray(jax.jit(f)(cal, x), np.float32)
        stats = L.trace_stats()
        assert stats["pallas_blocks"] >= 4, stats  # backbone+neck C2fs

        scale_m = np.abs(f32).mean()
        err_on = np.abs(on - f32).mean() / scale_m
        err_off = np.abs(off - f32).mean() / scale_m
        assert err_on < err_off * 1.3 + 1e-4, (err_on, err_off)

    def test_auto_policy_off_tpu_serves_xla(self, rng):
        """Default policy must not engage interpret-mode kernels on the
        CPU backend — the whole int8 suite would pay it."""
        from adas_tpu.ops.pallas_block import block_enabled

        assert jax.default_backend() != "tpu"
        assert not block_enabled()
