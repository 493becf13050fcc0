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


@pytest.mark.slow
def test_efficientnet_feature_strides():
    net = EfficientNetFeatures()
    x = jnp.zeros((1, 128, 128, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = net.apply(variables, x)
    assert c3.shape[1:3] == (16, 16)   # stride 8
    assert c4.shape[1:3] == (8, 8)     # stride 16
    assert c5.shape[1:3] == (4, 4)     # stride 32
    assert c3.shape[-1] == 40 and c4.shape[-1] == 112 and c5.shape[-1] == 320


@pytest.mark.slow
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


@pytest.mark.slow
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


class TestZylo117Ingestion:
    """Structural bijection of the zylo117 .pth mapping: full-tree
    coverage, exact round-trip, synthesized torch layout (no real
    checkpoint ships in this environment)."""

    def _flatten(self, tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(self._flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = np.asarray(v)
        return out

    def test_mapping_bijection_d0(self):
        import jax

        from adas_tpu.models.efficientdet import (
            EfficientDet,
            EfficientDetSpec,
        )
        from adas_tpu.tools.efficientdet_import import (
            efficientdet_mapping,
            efficientdet_variables,
        )

        spec = EfficientDetSpec(compound=0, num_classes=90)
        net = EfficientDet(spec)
        # tiny input: anchors/feature sizes don't affect the param tree
        ref = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
        )
        flat_ref = {
            c: self._flatten(ref[c]) for c in ("params", "batch_stats")
        }
        mapping = efficientdet_mapping(spec)
        targets = {}
        for src, coll, dst, _ in mapping:
            assert dst in flat_ref[coll], f"target missing: {coll}/{dst}"
            assert (coll, dst) not in targets, f"duplicate {dst}"
            targets[(coll, dst)] = src
        for coll in ("params", "batch_stats"):
            for leaf in flat_ref[coll]:
                assert (coll, leaf) in targets, f"unmapped {coll}/{leaf}"

        # synthesize the torch-side state and round-trip
        state = {}
        for src, coll, dst, _t in mapping:
            v = flat_ref[coll][dst]
            if dst[-1] == "kernel" and v.ndim == 4:
                v = np.transpose(v, (3, 2, 0, 1))
            state[src] = v
        state["backbone_net.model._blocks.0._bn1.num_batches_tracked"] = (
            np.zeros((), np.int64)
        )
        got = efficientdet_variables(state, spec)
        flat_got = {
            c: self._flatten(got[c]) for c in ("params", "batch_stats")
        }
        for coll in ("params", "batch_stats"):
            assert set(flat_got[coll]) == set(flat_ref[coll])
            for k in flat_ref[coll]:
                np.testing.assert_array_equal(
                    flat_got[coll][k], flat_ref[coll][k]
                )

    @pytest.mark.slow
    def test_facade_pth_roundtrip(self, tmp_path):
        """A zylo117-layout .pth loads through the facade (class count
        inferred from the checkpoint head) and detects."""
        import jax
        import torch

        from adas_tpu.models.efficientdet import (
            EfficientDet,
            EfficientDetSpec,
        )
        from adas_tpu.tools.efficientdet_import import efficientdet_mapping

        spec = EfficientDetSpec(compound=0, num_classes=90)
        net = EfficientDet(spec)
        ref = net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3), jnp.float32)
        )
        flat_ref = {
            c: self._flatten(ref[c]) for c in ("params", "batch_stats")
        }
        state = {}
        for src, coll, dst, _t in efficientdet_mapping(spec):
            v = flat_ref[coll][dst]
            if dst[-1] == "kernel" and v.ndim == 4:
                v = np.transpose(v, (3, 2, 0, 1))
            state[src] = torch.from_numpy(np.ascontiguousarray(v))
        path = tmp_path / "effdet_d0.pth"
        torch.save(state, str(path))

        from adas_tpu.perception.efficientdet_detector import (
            EfficientdetDetector,
        )

        det = EfficientdetDetector(
            model_path=str(path), compound=0, box_score=0.3
        )
        assert det.spec.num_classes == 90
        det.DetectFrame(np.zeros((512, 512, 3), np.uint8))
        assert isinstance(det.object_info, list)


def test_compound_table_d0_d7():
    """zylo117 compound parity: block counts per backbone, d6/d7 plain-sum
    BiFPN, d7 anchor scale 5.0, input sizes."""
    from adas_tpu.models.efficientdet import (
        EfficientDetSpec, _D_CONFIGS, mbconv_plan,
    )

    # official EfficientNet block counts B0..B6 (d7 reuses B6)
    expected_blocks = {0: 16, 1: 23, 2: 23, 3: 26, 4: 32, 5: 39, 6: 45, 7: 45}
    expected_inputs = {0: 512, 1: 640, 2: 768, 3: 896, 4: 1024,
                       5: 1280, 6: 1280, 7: 1536}
    for d, (w, dep, size, fpn_ch, fpn_layers, head_layers) in _D_CONFIGS.items():
        assert len(mbconv_plan(w, dep)) == expected_blocks[d]
        spec = EfficientDetSpec(compound=d)
        assert spec.input_size == expected_inputs[d]
        assert spec.resolved_anchor_scale == (5.0 if d == 7 else 4.0)
    assert _D_CONFIGS[6][3:] == (384, 8, 5)


@pytest.mark.slow
def test_d3_graph_builds_and_runs_small():
    """The scaled trunk/fpn/head wiring is valid beyond d2 (tiny input —
    anchors are computed from the traced shape, not spec.input_size)."""
    import jax

    from adas_tpu.models.efficientdet import EfficientDet, EfficientDetSpec

    spec = EfficientDetSpec(compound=3, num_classes=4)
    net = EfficientDet(spec)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    boxes, probs = net.apply(variables, x)
    assert boxes.shape[-1] == 4 and probs.shape[-1] == 4


def test_d6_mapping_has_no_attention_weights():
    from adas_tpu.models.efficientdet import EfficientDetSpec
    from adas_tpu.tools.efficientdet_import import efficientdet_mapping

    srcs6 = [e[0] for e in efficientdet_mapping(EfficientDetSpec(compound=6))]
    assert not any("_w1" in s or "_w2" in s for s in srcs6)
    srcs0 = [e[0] for e in efficientdet_mapping(EfficientDetSpec(compound=0))]
    assert any("p6_w1" in s for s in srcs0)
