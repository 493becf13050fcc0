"""Activation-level faithfulness: v6 / v7 / EfficientDet vs torch oracles.

The reference runs the REAL meituan-v6 / WongKinYiu-v7 /
zylo117-EfficientDet networks through their ONNX exports
(/root/reference/ObjectDetector/utils.py:15-23, efficientdetDetector.py:38).
These tests build independent torch implementations with the released
checkpoints' exact state-dict naming (tests/torch_nets_detect.py),
ingest their RANDOM weights through the production importers, and assert
the JAX forward agrees activation-for-activation — the proof that a
transposed kernel, BN-epsilon slip, or mis-wired concat cannot hide
behind shape-only contract tests.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from tests.torch_nets_detect import (
    TorchEfficientDet,
    TorchYOLOv6,
    TorchYOLOv7,
)

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


def _randomize(model: nn.Module, seed: int = 0) -> None:
    """Non-trivial weights + BN affine/stats for a real eval-mode test."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(
                    torch.rand(m.weight.shape, generator=g) * 0.5 + 0.75
                )
                m.bias.copy_(
                    torch.randn(m.bias.shape, generator=g) * 0.05
                )
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )


def _state(model: nn.Module) -> dict:
    return {k: v.numpy() for k, v in model.state_dict().items()}


def _rel_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(
        np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
    )


#: Per-family activation-parity tolerances (torch f32 vs XLA-CPU f32).
#: A single blanket bound hides regressions: a conv-only family whose
#: honest drift is ~1e-7 could silently degrade three decades before
#: tripping a 5e-4 gate.  Bounds are set per numerics class at ~5-50x the
#: measured drift of the current implementations (ADAS_PARITY_REPORT=1
#: prints measurements; 2026-08 run recorded in each entry):
#:   * conv_only (v5 1.1e-7, v5lite e/s 1.1e-7, v5lite g 1.1e-7 —
#:     including the ingest-time RepVGG branch fusion — v6 n/s 1.7e-7,
#:     v7 2.2e-7, v9c 9.5e-8): pure f32 conv/BN rollups; cross-framework
#:     conv-algorithm reassociation stays ~1e-7 at these depths -> 1e-5
#:     gate (~50x margin).
#:   * softmax_head (v8 1.3e-7, v10n 8.5e-5, v6m 1.2e-7, v6l 1.7e-5):
#:     DFL softmax(16-bin) expectation / PSA attention mix exp+normalize
#:     into the box path -> 5e-4 gate (~6x over the worst member).
#:   * exp_decode (d0 cls 2.7e-4, boxes 5.8e-5): exp() in the zylo117
#:     box decode amplifies regressor drift multiplicatively through a
#:     16-block residual stack -> 1e-3 gate (~4x margin; semantic bugs
#:     measured 8e-2 during development, two decades above).
PARITY_TOL = {
    "conv_only": 1e-5,
    "softmax_head": 5e-4,
    "exp_decode": 1e-3,
}


def assert_parity(out: np.ndarray, ref: np.ndarray, path: str, tag: str):
    """Assert activation parity under the PARITY_TOL entry for ``path``;
    with ADAS_PARITY_REPORT=1 also print the measured drift so the
    table's margins stay auditable."""
    import os

    assert out.shape == ref.shape
    err = _rel_err(out, ref)
    if os.environ.get("ADAS_PARITY_REPORT"):
        print(f"PARITY {tag}: rel_err={err:.3e} tol={PARITY_TOL[path]:.0e}")
    assert err < PARITY_TOL[path], (tag, err, path)


class TestYoloV6Parity:
    @pytest.mark.parametrize("scale", ["n", "s", "m", "l"])
    def test_forward_matches_torch(self, scale):
        """n/s = EfficientRep RepBlock stages; m/l = CSPBep BepC3 stages
        with the 17-bin DFL head."""
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.models.yolov6 import _V6_CSP_SCALES, v6_plan
        from adas_tpu.tools.yolo_import import yolo_variables

        chans, reps = v6_plan(scale)
        csp_e = (
            _V6_CSP_SCALES[scale][2] if scale in _V6_CSP_SCALES else 0.0
        )
        nc = 7
        tnet = TorchYOLOv6(chans, reps, nc=nc, csp_e=csp_e).eval()
        _randomize(tnet)
        x = torch.randn(1, 3, 96, 96, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            ref = tnet(x).numpy()

        spec = YoloSpec(
            family="v6", scale=scale, num_classes=nc, input_size=(96, 96)
        )
        self._assert_both_forms(spec, tnet, x, ref, scale)

    def _assert_both_forms(self, spec, tnet, x, ref, scale):
        """Train-form tree AND its switch_to_deploy fusion both match
        the torch oracle — the deploy form is what facades serve."""
        from adas_tpu.models.yolo import build_yolo
        from adas_tpu.models.yolov6 import (
            _V6_CSP_SCALES,
            fuse_repvgg_variables,
        )
        from adas_tpu.tools.yolo_import import yolo_variables

        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        path = (
            "softmax_head" if scale in _V6_CSP_SCALES else "conv_only"
        )
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(variables, xin)
        )
        assert_parity(out, ref, path, f"v6{scale}")

        fused = fuse_repvgg_variables(variables)
        flat = jax.tree_util.tree_leaves_with_path(fused["params"])
        assert not any(
            "rbr" in jax.tree_util.keystr(p) for p, _ in flat
        )
        out_f = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(fused, xin)
        )
        assert_parity(out_f, ref, path, f"v6{scale}-deploy")


class TestYoloV7Parity:
    def test_forward_matches_torch(self):
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.yolo_import import yolo_variables

        nc = 5
        tnet = TorchYOLOv7(nc=nc).eval()
        _randomize(tnet)
        x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            ref = tnet(x).numpy()

        spec = YoloSpec(
            family="v7", scale="l", num_classes=nc, input_size=(64, 64)
        )
        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(
                variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        assert_parity(out, ref, "conv_only", "v7")


def _zylo_anchors(input_size: int, anchor_scale: float = 4.0) -> np.ndarray:
    """Independent re-derivation of zylo117's Anchors.forward (y1, x1,
    y2, x2), itertools.product(scales, ratios) interleaved per cell."""
    scales = [2 ** 0, 2 ** (1.0 / 3), 2 ** (2.0 / 3)]
    ratios = [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]
    out = []
    for stride in [2 ** i for i in range(3, 8)]:
        boxes_level = []
        for scale, ratio in itertools.product(scales, ratios):
            base = anchor_scale * stride * scale
            ax = base * ratio[0] / 2.0
            ay = base * ratio[1] / 2.0
            xv, yv = np.meshgrid(
                np.arange(stride / 2, input_size, stride),
                np.arange(stride / 2, input_size, stride),
            )
            xv, yv = xv.reshape(-1), yv.reshape(-1)
            boxes = np.vstack((yv - ay, xv - ax, yv + ay, xv + ax))
            boxes_level.append(np.expand_dims(boxes.T, 1))
        out.append(
            np.concatenate(boxes_level, axis=1).reshape(-1, 4)
        )
    return np.concatenate(out, axis=0).astype(np.float32)


def _zylo_decode(reg: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """zylo117 BBoxTransform: (dy, dx, dh, dw) -> xyxy."""
    ya = (anchors[:, 0] + anchors[:, 2]) / 2
    xa = (anchors[:, 1] + anchors[:, 3]) / 2
    ha = anchors[:, 2] - anchors[:, 0]
    wa = anchors[:, 3] - anchors[:, 1]
    w = np.exp(reg[..., 3]) * wa
    h = np.exp(reg[..., 2]) * ha
    yc = reg[..., 0] * ha + ya
    xc = reg[..., 1] * wa + xa
    return np.stack(
        [xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], axis=-1
    )


class TestEfficientDetParity:
    def test_d0_forward_matches_torch(self):
        from adas_tpu.models.efficientdet import (
            EfficientDet,
            EfficientDetSpec,
            mbconv_plan,
        )
        from adas_tpu.tools.efficientdet_import import (
            efficientdet_variables,
        )

        nc = 6
        plan = mbconv_plan(1.0, 1.0)
        tnet = TorchEfficientDet(
            plan, stem_ch=32, conv_ch=(40, 112, 320), fpn_ch=64,
            fpn_layers=3, head_layers=3, num_classes=nc,
        ).eval()
        _randomize(tnet)
        # 256 keeps P7 at 2x2 (train-mode BN in the stats-adoption pass
        # needs >1 value per channel)
        size = 256
        x = torch.randn(
            1, 3, size, size, generator=torch.Generator().manual_seed(3)
        )
        with torch.no_grad():
            # adopt REAL batch statistics as running stats (momentum=1 +
            # one train-mode pass): arbitrary random running stats make
            # the 16-block residual stack blow up multiplicatively and
            # exp() in the box decode overflows in BOTH frameworks — a
            # test-conditioning issue, not a parity one
            for m in tnet.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.momentum = 1.0
            tnet.train()
            tnet(x)
            tnet.eval()
            tnet.regressor.header.pointwise_conv.conv.weight.mul_(0.05)
            tnet.regressor.header.pointwise_conv.conv.bias.mul_(0.05)
        with torch.no_grad():
            reg_ref, cls_ref = tnet(x)
        boxes_ref = _zylo_decode(
            reg_ref.numpy(), _zylo_anchors(size)
        )

        spec = EfficientDetSpec(compound=0, num_classes=nc)
        net = EfficientDet(spec)
        variables = efficientdet_variables(_state(tnet), spec)
        boxes, probs = jax.jit(lambda v, xi: net.apply(v, xi))(
            variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        )
        boxes, probs = np.asarray(boxes), np.asarray(probs)
        # exp_decode: semantic bugs measured 8e-2 during development —
        # two orders of magnitude above the gate
        assert_parity(probs, cls_ref.numpy(), "exp_decode", "d0:cls")
        assert_parity(boxes, boxes_ref, "exp_decode", "d0:boxes")


class TestYoloV8Parity:
    """The flagship family gets the same activation-level proof."""

    @pytest.mark.parametrize("scale", ["n", "s"])
    def test_forward_matches_torch(self, scale):
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.yolo_import import yolo_variables
        from tests.torch_nets_detect import TorchYOLOv8

        spec = YoloSpec(
            family="v8", scale=scale, num_classes=9, input_size=(96, 96)
        )
        tnet = TorchYOLOv8(
            list(spec.channels), list(spec.depths), nc=9
        ).eval()
        _randomize(tnet)
        x = torch.randn(
            1, 3, 96, 96, generator=torch.Generator().manual_seed(4)
        )
        with torch.no_grad():
            ref = tnet(x).numpy()

        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(
                variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        assert_parity(out, ref, "softmax_head", f"v8{scale}")


class TestYoloV5Parity:
    def test_forward_matches_torch(self):
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.yolo_import import yolo_variables
        from tests.torch_nets_detect import TorchYOLOv5

        spec = YoloSpec(
            family="v5", scale="n", num_classes=11, input_size=(96, 96)
        )
        tnet = TorchYOLOv5(
            list(spec.channels), list(spec.depths), nc=11
        ).eval()
        _randomize(tnet)
        x = torch.randn(
            1, 3, 96, 96, generator=torch.Generator().manual_seed(5)
        )
        with torch.no_grad():
            ref = tnet(x).numpy()

        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(
                variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        assert_parity(out, ref, "conv_only", "v5n")


class TestYoloV10Parity:
    def test_v10n_both_heads_match_torch(self):
        """Full v10n (SCDown/PSA/C2fCIB-lk + dual heads): the one-to-many
        export raw AND the one-to-one head's pre-topk decode both match
        the torch twin."""
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.yolo_import import yolo_variables
        from tests.torch_nets_detect import TorchYOLOv10n

        spec = YoloSpec(
            family="v10", scale="n", num_classes=7, input_size=(128, 128)
        )
        tnet = TorchYOLOv10n(
            list(spec.channels), list(spec.depths), nc=7
        ).eval()
        _randomize(tnet)
        x = torch.randn(
            1, 3, 128, 128, generator=torch.Generator().manual_seed(6)
        )
        with torch.no_grad():
            raw_ref, (xywh_o, cls_o) = tnet(x)
        raw_ref = raw_ref.numpy()

        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        raw, o2o = jax.jit(
            lambda v, xi: net.apply(v, xi, method=net.both)
        )(variables, xj)
        raw = np.asarray(raw)
        # the PSA attention softmax + DFL head put v10 in the
        # softmax_head tolerance class
        assert_parity(raw, raw_ref, "softmax_head", "v10n")

        # o2o: reproduce the JAX top-k selection from the torch tensors
        scores_ref, ids_ref = cls_o.max(-1)
        k = np.asarray(o2o).shape[1]
        top = torch.topk(scores_ref[0], k).indices
        xywh_sel = xywh_o[0, top].numpy()
        ref_dets = np.concatenate(
            [
                xywh_sel[:, :2] - xywh_sel[:, 2:] / 2,
                xywh_sel[:, :2] + xywh_sel[:, 2:] / 2,
                scores_ref[0, top].numpy()[:, None],
                ids_ref[0, top].numpy()[:, None].astype(np.float32),
            ],
            axis=-1,
        )
        got = np.asarray(o2o)[0]
        # ~1e-5 cross-framework score noise reorders near-ties, so exact
        # row alignment is not meaningful: check the sorted score curves
        # agree and that every top-20 reference detection appears in the
        # JAX output (multiset containment)
        s_got = np.sort(got[:, 4])[::-1][:50]
        s_ref = np.sort(ref_dets[:, 4])[::-1][:50]
        np.testing.assert_allclose(s_got, s_ref, atol=1e-4)
        top_ref = ref_dets[np.argsort(-ref_dets[:, 4])[:20]]
        for row in top_ref:
            d_coord = np.abs(got[:, :4] - row[None, :4]).max(axis=1)
            d_score = np.abs(got[:, 4] - row[4])
            match = (d_coord < 0.1) & (d_score < 1e-3) & (
                got[:, 5] == row[5]
            )
            assert match.any(), row


class TestYoloV9Parity:
    def test_v9c_forward_matches_torch(self):
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.yolo_import import yolo_variables
        from tests.torch_nets_detect import TorchYOLOv9c

        spec = YoloSpec(
            family="v9", scale="c", num_classes=6, input_size=(64, 64)
        )
        tnet = TorchYOLOv9c(nc=6).eval()
        _randomize(tnet)
        x = torch.randn(
            1, 3, 64, 64, generator=torch.Generator().manual_seed(7)
        )
        with torch.no_grad():
            ref = tnet(x).numpy()

        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(
                variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        assert_parity(out, ref, "conv_only", "v9c")


class TestYoloV5LiteParity:
    @pytest.mark.parametrize("scale", ["e", "s"])
    def test_forward_matches_torch(self, scale):
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.models.yolov5lite import V5LITE_PLANS
        from adas_tpu.tools.yolo_import import yolo_variables
        from tests.torch_nets_detect import TorchYOLOv5Lite

        stem_ch, stages, repeats, w = V5LITE_PLANS[scale]
        nc = 8
        tnet = TorchYOLOv5Lite(
            stem_ch, stages, repeats, w, nc=nc
        ).eval()
        _randomize(tnet)
        x = torch.randn(
            1, 3, 96, 96, generator=torch.Generator().manual_seed(8)
        )
        with torch.no_grad():
            ref = tnet(x).numpy()

        spec = YoloSpec(
            family="v5lite", scale=scale, num_classes=nc,
            input_size=(96, 96),
        )
        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(
                variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        assert_parity(out, ref, "conv_only", f"v5lite{scale}")

    def test_forward_matches_torch_g(self):
        """g = RepVGG trunk.  The torch twin runs the TRAIN form (three
        branches per block); ingest performs the switch_to_deploy
        re-parameterization into the single-conv graph — so this parity
        also proves the fusion arithmetic, not just the wiring."""
        from adas_tpu.models.yolo import YoloSpec, build_yolo
        from adas_tpu.tools.yolo_import import yolo_variables
        from tests.torch_nets_detect import TorchYOLOv5LiteG

        nc = 8
        tnet = TorchYOLOv5LiteG(nc=nc).eval()
        _randomize(tnet)
        x = torch.randn(
            1, 3, 96, 96, generator=torch.Generator().manual_seed(9)
        )
        with torch.no_grad():
            ref = tnet(x).numpy()

        spec = YoloSpec(
            family="v5lite", scale="g", num_classes=nc,
            input_size=(96, 96),
        )
        net = build_yolo(spec)
        variables = yolo_variables(_state(tnet), spec)
        out = np.asarray(
            jax.jit(lambda v, xi: net.apply(v, xi))(
                variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        assert_parity(out, ref, "conv_only", "v5liteg")
