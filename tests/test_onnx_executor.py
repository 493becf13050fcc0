"""ONNX graph executor tests: writer→parser round trip, op semantics vs
torch oracles, static-shape constant folding, dynamic-op host tail, and a
mini YOLO-style end-to-end graph.

The reference executes arbitrary exported .onnx files through onnxruntime
(/root/reference/coreEngine.py:159-186); these tests prove the XLA
interpreter (engine/onnx_engine.py) reproduces the op semantics those
exports rely on.  Fixtures are built with tools/onnx_writer.py since the
onnx package is not available — torch (CPU) is the independent oracle.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from adas_tpu.engine.onnx_engine import OnnxGraphEngine
from adas_tpu.tools import onnx_writer as W
from adas_tpu.tools.onnx_graph import parse_onnx, toposort


def build_engine(nodes, inputs, outputs, inits=None, opset=13):
    m = W.simple_model(nodes, inputs, outputs, initializers=inits, opset=opset)
    return OnnxGraphEngine(parse_onnx(m))


def run(nodes, inputs, outputs, inits, x, opset=13):
    return build_engine(nodes, inputs, outputs, inits, opset).engine_inference(
        x
    )


class TestWriterParser:
    def test_roundtrip(self, rng):
        w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
        scalar = np.array(7, np.int64)
        nodes = [
            W.make_node(
                "Conv", ["x", "w"], ["y"], name="c0",
                kernel_shape=[3, 3], strides=[1, 1], pads=[1, 1, 1, 1],
                alpha=0.5, mode="test", scales=[1.0, 2.0],
            )
        ]
        m = parse_onnx(
            W.simple_model(
                nodes,
                [("x", np.float32, (1, 3, 8, 8))],
                [("y", np.float32, (1, 4, 8, 8))],
                initializers={"w": w, "k": scalar},
                opset=17,
            )
        )
        assert m.opset == 17
        g = m.graph
        (node,) = g.nodes
        assert node.op_type == "Conv" and node.name == "c0"
        assert node.attrs["kernel_shape"] == [3, 3]
        assert node.attrs["alpha"] == pytest.approx(0.5)
        assert node.attrs["mode"] == "test"
        assert node.attrs["scales"] == [1.0, 2.0]
        np.testing.assert_array_equal(g.initializers["w"], w)
        # 0-d tensors must round-trip as 0-d (scalar), not (1,)
        assert g.initializers["k"].shape == ()
        assert g.initializers["k"] == 7
        assert [v.name for v in g.data_inputs] == ["x"]
        assert g.outputs[0].shape == [1, 4, 8, 8]

    def test_toposort_fixes_reversed_graphs(self):
        nodes = [
            W.make_node("Relu", ["mid"], ["y"]),
            W.make_node("Sigmoid", ["x"], ["mid"]),
        ]
        g = parse_onnx(
            W.simple_model(
                nodes,
                [("x", np.float32, (2,))],
                [("y", np.float32, (2,))],
            )
        ).graph
        assert [n.op_type for n in toposort(g)] == ["Sigmoid", "Relu"]


class TestOpsVsTorch:
    def test_conv_group_dilation_asym_pads(self, rng):
        x = rng.standard_normal((1, 6, 17, 19)).astype(np.float32)
        w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        nodes = [
            W.make_node(
                "Conv", ["x", "w", "b"], ["c"], kernel_shape=[3, 3],
                strides=[2, 2], pads=[1, 0, 0, 1], group=2,
                dilations=[1, 2],
            ),
            W.make_node("Sigmoid", ["c"], ["s"]),
            W.make_node("Mul", ["c", "s"], ["y"]),
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], {"w": w, "b": b}, x,
        )[0]
        tc = F.conv2d(
            F.pad(torch.from_numpy(x), (0, 1, 1, 0)),
            torch.from_numpy(w), torch.from_numpy(b),
            stride=2, dilation=(1, 2), groups=2,
        )
        ty = (tc * torch.sigmoid(tc)).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-4)

    def test_conv_autopad_same_upper(self, rng):
        x = rng.standard_normal((1, 3, 13, 13)).astype(np.float32)
        w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
        nodes = [
            W.make_node(
                "Conv", ["x", "w"], ["y"], kernel_shape=[3, 3],
                strides=[2, 2], auto_pad="SAME_UPPER",
            )
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], {"w": w}, x,
        )[0]
        assert out.shape == (1, 4, 7, 7)
        # SAME_UPPER, k=3 s=2, in=13: out=ceil(13/2)=7, total pad
        # (7-1)*2+3-13=2 split (1,1)
        ty = F.conv2d(
            F.pad(torch.from_numpy(x), (1, 1, 1, 1)),
            torch.from_numpy(w), stride=2,
        ).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-4)

    def test_conv_transpose(self, rng):
        x = rng.standard_normal((1, 4, 7, 9)).astype(np.float32)
        w = rng.standard_normal((4, 5, 3, 3)).astype(np.float32)
        nodes = [
            W.make_node(
                "ConvTranspose", ["x", "w"], ["y"], kernel_shape=[3, 3],
                strides=[2, 2], pads=[1, 1, 1, 1], output_padding=[1, 1],
            )
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], {"w": w}, x,
        )[0]
        ty = F.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2,
            padding=1, output_padding=1,
        ).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-4)

    def test_maxpool_ceil_mode(self, rng):
        x = rng.standard_normal((1, 3, 21, 23)).astype(np.float32)
        nodes = [
            W.make_node(
                "MaxPool", ["x"], ["y"], kernel_shape=[3, 3],
                strides=[2, 2], pads=[1, 1, 1, 1], ceil_mode=1,
            )
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], {}, x,
        )[0]
        ty = F.max_pool2d(
            torch.from_numpy(x), 3, 2, 1, ceil_mode=True
        ).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-6)

    def test_avgpool_excludes_pad(self, rng):
        x = rng.standard_normal((1, 3, 21, 23)).astype(np.float32)
        nodes = [
            W.make_node(
                "AveragePool", ["x"], ["y"], kernel_shape=[3, 3],
                strides=[2, 2], pads=[1, 1, 1, 1],
            )
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], {}, x,
        )[0]
        ty = F.avg_pool2d(
            torch.from_numpy(x), 3, 2, 1, count_include_pad=False
        ).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-6)

    def test_resize_nearest_asymmetric(self, rng):
        """The ultralytics Upsample export pattern."""
        x = rng.standard_normal((1, 4, 5, 7)).astype(np.float32)
        nodes = [
            W.make_node(
                "Resize", ["x", "", "scales"], ["y"], mode="nearest",
                coordinate_transformation_mode="asymmetric",
                nearest_mode="floor",
            )
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)],
            {"scales": np.array([1, 1, 2, 2], np.float32)}, x,
        )[0]
        ty = F.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="nearest"
        ).numpy()
        np.testing.assert_array_equal(out, ty)

    def test_resize_bilinear_half_pixel(self, rng):
        x = rng.standard_normal((1, 4, 5, 7)).astype(np.float32)
        nodes = [
            W.make_node(
                "Resize", ["x", "", "scales"], ["y"], mode="linear",
                coordinate_transformation_mode="half_pixel",
            )
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)],
            {"scales": np.array([1, 1, 2.0, 3.0], np.float32)}, x,
        )[0]
        ty = F.interpolate(
            torch.from_numpy(x), scale_factor=(2, 3), mode="bilinear",
            align_corners=False,
        ).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-5)

    def test_shape_chain_folds_static(self, rng):
        """Shape→Gather→Unsqueeze→Concat→Reshape chains must constant-fold
        so the jitted graph stays static."""
        x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
        nodes = [
            W.make_node("Shape", ["x"], ["sh"]),
            W.make_node("Gather", ["sh", "i0"], ["d0"], axis=0),
            W.make_node("Unsqueeze", ["d0", "ax0"], ["d0u"]),
            W.make_node("Concat", ["d0u", "m1"], ["tgt"], axis=0),
            W.make_node("Reshape", ["x", "tgt"], ["flat"]),
            W.make_node("Softmax", ["flat"], ["y"], axis=-1),
        ]
        inits = {
            "i0": np.array(0, np.int64),
            "ax0": np.array([0], np.int64),
            "m1": np.array([-1], np.int64),
        }
        eng = build_engine(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], inits,
        )
        # the shape-math initializers are trace-time constants, not params
        assert set(eng._static_inits) == {"i0", "ax0", "m1"}
        out = eng.engine_inference(x)[0]
        ty = torch.softmax(torch.from_numpy(x).reshape(1, -1), -1).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-6)

    def test_bn_flatten_gemm(self, rng):
        x = rng.standard_normal((2, 5, 6, 6)).astype(np.float32)
        sc, bi, mu = (
            rng.standard_normal(5).astype(np.float32) for _ in range(3)
        )
        va = (rng.random(5) + 0.5).astype(np.float32)
        gw = rng.standard_normal((7, 5 * 36)).astype(np.float32)
        gb = rng.standard_normal(7).astype(np.float32)
        nodes = [
            W.make_node(
                "BatchNormalization", ["x", "sc", "bi", "mu", "va"],
                ["bn"], epsilon=1e-5,
            ),
            W.make_node("Flatten", ["bn"], ["f"], axis=1),
            W.make_node(
                "Gemm", ["f", "gw", "gb"], ["y"], transB=1, alpha=1.0,
                beta=1.0,
            ),
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)],
            {"sc": sc, "bi": bi, "mu": mu, "va": va, "gw": gw, "gb": gb},
            x,
        )[0]
        tbn = F.batch_norm(
            torch.from_numpy(x), torch.from_numpy(mu),
            torch.from_numpy(va), torch.from_numpy(sc),
            torch.from_numpy(bi), eps=1e-5,
        )
        ty = (
            tbn.flatten(1) @ torch.from_numpy(gw).T + torch.from_numpy(gb)
        ).numpy()
        np.testing.assert_allclose(out, ty, atol=1e-3)

    def test_split_strided_slice_concat(self, rng):
        x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
        nodes = [
            W.make_node("Split", ["x"], ["a", "b"], axis=1, split=[3, 5]),
            W.make_node("Slice", ["b", "st", "en", "axs", "stp"], ["bs"]),
            W.make_node("Concat", ["a", "bs"], ["y"], axis=1),
        ]
        inits = {
            "st": np.array([0], np.int64),
            "en": np.array([1 << 62], np.int64),  # INT-max clamp per spec
            "axs": np.array([1], np.int64),
            "stp": np.array([2], np.int64),
        }
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], inits, x,
        )[0]
        ty = np.concatenate([x[:, :3], x[:, 3:][:, ::2]], axis=1)
        np.testing.assert_array_equal(out, ty)

    def test_topk(self, rng):
        x = rng.standard_normal((2, 30)).astype(np.float32)
        nodes = [
            W.make_node("TopK", ["x", "k"], ["v", "i"], axis=-1, largest=1)
        ]
        eng = build_engine(
            nodes, [("x", np.float32, x.shape)],
            [("v", np.float32, None), ("i", np.int64, None)],
            {"k": np.array([5], np.int64)},
        )
        v, i = eng.engine_inference(x)
        tv, ti = torch.topk(torch.from_numpy(x), 5, dim=-1)
        np.testing.assert_allclose(v, tv.numpy(), atol=1e-6)
        np.testing.assert_array_equal(i, ti.numpy())

    def test_transpose_default_reverses(self, rng):
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        nodes = [W.make_node("Transpose", ["x"], ["y"])]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], {}, x,
        )[0]
        np.testing.assert_array_equal(out, x.transpose(2, 1, 0))

    def test_legacy_opset9_upsample_and_clip_attrs(self, rng):
        x = rng.standard_normal((1, 2, 3, 3)).astype(np.float32)
        nodes = [
            W.make_node("Upsample", ["x", "scales"], ["u"], mode="nearest"),
            W.make_node("Clip", ["u"], ["y"], min=-0.5, max=0.5),
        ]
        out = run(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)],
            {"scales": np.array([1, 1, 2, 2], np.float32)}, x, opset=9,
        )[0]
        ty = np.clip(x.repeat(2, axis=2).repeat(2, axis=3), -0.5, 0.5)
        np.testing.assert_array_equal(out, ty)


def _np_nms_oracle(boxes_yx, scores, iou_th, score_th, max_out):
    """Independent greedy NMS (ONNX corner format y1x1y2x2)."""
    y1, x1, y2, x2 = boxes_yx.T
    area = (y2 - y1) * (x2 - x1)
    order = np.argsort(-scores)
    order = order[scores[order] > score_th]
    keep = []
    while order.size and len(keep) < max_out:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        yy1 = np.maximum(y1[i], y1[rest])
        xx1 = np.maximum(x1[i], x1[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        inter = np.maximum(yy2 - yy1, 0) * np.maximum(xx2 - xx1, 0)
        iou = inter / np.maximum(area[i] + area[rest] - inter, 1e-9)
        order = rest[iou <= iou_th]
    return keep


class TestDynamicTail:
    def test_nms_semantics(self, rng):
        boxes = rng.random((1, 40, 4)).astype(np.float32)
        boxes[..., 2:] += boxes[..., :2]  # y1x1 <= y2x2
        scores = rng.random((1, 2, 40)).astype(np.float32)
        nodes = [
            W.make_node("Identity", ["x"], ["sc"]),
            W.make_node(
                "NonMaxSuppression",
                ["boxes", "sc", "mob", "iou", "st"], ["sel"],
            ),
        ]
        inits = {
            "boxes": boxes,
            "mob": np.array([6], np.int64),
            "iou": np.array([0.5], np.float32),
            "st": np.array([0.3], np.float32),
        }
        eng = build_engine(
            nodes, [("x", np.float32, scores.shape)],
            [("sel", np.int64, None)], inits,
        )
        sel = eng.engine_inference(scores)[0]
        assert sel.shape[1] == 3
        for c in range(2):
            expect = _np_nms_oracle(boxes[0], scores[0, c], 0.5, 0.3, 6)
            got = [int(r[2]) for r in sel if r[1] == c]
            assert got == expect

    def test_hybrid_split_prefix_jitted_tail_host(self, rng):
        """Conv prefix under jit, NMS + gather tail on host, outputs in
        graph order — the EfficientDet postprocessed-export shape."""
        boxes = rng.random((1, 30, 4)).astype(np.float32)
        boxes[..., 2:] += boxes[..., :2]
        x = rng.random((1, 1, 30)).astype(np.float32)
        nodes = [
            W.make_node("Mul", ["x", "two"], ["sc"]),
            W.make_node(
                "NonMaxSuppression",
                ["boxes", "sc", "mob", "iou", "st"], ["sel"],
            ),
            W.make_node("Gather", ["sel", "c2"], ["bidx"], axis=1),
            W.make_node("Squeeze", ["bidx", "ax1"], ["flat_idx"]),
            W.make_node("Gather", ["boxes_sq", "flat_idx"], ["out_boxes"],
                        axis=0),
            W.make_node("Gather", ["sc_sq", "flat_idx"], ["out_scores"],
                        axis=0),
        ]
        inits = {
            "boxes": boxes,
            "boxes_sq": boxes[0],
            "two": np.array(0.5, np.float32),
            "mob": np.array([4], np.int64),
            "iou": np.array([0.6], np.float32),
            "st": np.array([0.1], np.float32),
            "c2": np.array([2], np.int64),
            "ax1": np.array([1], np.int64),
            "sc_sq": (x[0, 0] * 0.5).astype(np.float32),
        }
        eng = build_engine(
            nodes, [("x", np.float32, x.shape)],
            [
                ("out_boxes", np.float32, None),
                ("out_scores", np.float32, None),
            ],
            inits,
        )
        assert eng._tail, "NMS must split into a host tail"
        ob, osc = eng.engine_inference(x)
        expect = _np_nms_oracle(boxes[0], x[0, 0] * 0.5, 0.6, 0.1, 4)
        np.testing.assert_allclose(ob, boxes[0][expect], atol=1e-6)
        np.testing.assert_allclose(
            osc, (x[0, 0] * 0.5)[expect], atol=1e-6
        )


class _MiniYolo(torch.nn.Module):
    """Torch oracle mirroring the mini detection graph in
    test_mini_yolo_graph (CSP-flavored: stem, residual bottleneck,
    concat, upsample merge, per-cell head with sigmoid)."""

    def __init__(self):
        super().__init__()
        g = torch.Generator().manual_seed(3)

        def mk(*shape):
            return torch.nn.Parameter(torch.randn(*shape, generator=g) * 0.2)

        self.w_stem = mk(8, 3, 3, 3)
        self.b_stem = mk(8)
        self.w_b1 = mk(8, 8, 1, 1)
        self.b_b1 = mk(8)
        self.w_b2 = mk(8, 8, 3, 3)
        self.b_b2 = mk(8)
        self.w_down = mk(16, 16, 3, 3)
        self.b_down = mk(16)
        self.w_head = mk(18, 32, 1, 1)
        self.b_head = mk(18)

    def forward(self, x):
        act = torch.nn.functional.silu
        s = act(F.conv2d(x, self.w_stem, self.b_stem, stride=2, padding=1))
        b = act(F.conv2d(s, self.w_b1, self.b_b1))
        b = act(F.conv2d(b, self.w_b2, self.b_b2, padding=1))
        c = torch.cat([s, s + b], dim=1)
        d = act(F.conv2d(c, self.w_down, self.b_down, stride=2, padding=1))
        u = F.interpolate(d, scale_factor=2, mode="nearest")
        m = torch.cat([c, u], dim=1)
        h = F.conv2d(m, self.w_head, self.b_head)
        n, _, hh, ww = h.shape
        h = h.reshape(n, 3, 6, hh * ww).permute(0, 1, 3, 2)
        return torch.sigmoid(h)


class TestEndToEnd:
    def test_mini_yolo_graph(self):
        net = _MiniYolo().eval()
        x = np.random.default_rng(1).standard_normal((1, 3, 16, 16)).astype(
            np.float32
        )
        p = {k: v.detach().numpy() for k, v in net.named_parameters()}
        nodes = [
            W.make_node(
                "Conv", ["x", "w_stem", "b_stem"], ["s0"],
                kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1],
            ),
            W.make_node("Sigmoid", ["s0"], ["s0s"]),
            W.make_node("Mul", ["s0", "s0s"], ["s"]),
            W.make_node("Conv", ["s", "w_b1", "b_b1"], ["b10"],
                        kernel_shape=[1, 1]),
            W.make_node("Sigmoid", ["b10"], ["b10s"]),
            W.make_node("Mul", ["b10", "b10s"], ["b1"]),
            W.make_node(
                "Conv", ["b1", "w_b2", "b_b2"], ["b20"],
                kernel_shape=[3, 3], pads=[1, 1, 1, 1],
            ),
            W.make_node("Sigmoid", ["b20"], ["b20s"]),
            W.make_node("Mul", ["b20", "b20s"], ["b2"]),
            W.make_node("Add", ["s", "b2"], ["res"]),
            W.make_node("Concat", ["s", "res"], ["c"], axis=1),
            W.make_node(
                "Conv", ["c", "w_down", "b_down"], ["d0"],
                kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1],
            ),
            W.make_node("Sigmoid", ["d0"], ["d0s"]),
            W.make_node("Mul", ["d0", "d0s"], ["d"]),
            W.make_node(
                "Resize", ["d", "", "up2"], ["u"], mode="nearest",
                coordinate_transformation_mode="asymmetric",
                nearest_mode="floor",
            ),
            W.make_node("Concat", ["c", "u"], ["m"], axis=1),
            W.make_node("Conv", ["m", "w_head", "b_head"], ["h"],
                        kernel_shape=[1, 1]),
            W.make_node("Reshape", ["h", "tgt"], ["hr"]),
            W.make_node("Transpose", ["hr"], ["ht"], perm=[0, 1, 3, 2]),
            W.make_node("Sigmoid", ["ht"], ["y"]),
        ]
        inits = dict(p)
        inits["up2"] = np.array([1, 1, 2, 2], np.float32)
        inits["tgt"] = np.array([1, 3, 6, 64], np.int64)
        eng = build_engine(
            nodes, [("x", np.float32, x.shape)],
            [("y", np.float32, None)], inits,
        )
        out = eng.engine_inference(x)[0]
        with torch.no_grad():
            ty = net(torch.from_numpy(x)).numpy()
        assert out.shape == ty.shape == (1, 3, 64, 6)
        np.testing.assert_allclose(out, ty, atol=2e-5)
        # weights ride as jit params (device tree), not HLO constants
        assert "w_stem" in eng._params
        assert "tgt" in eng._static_inits

    def test_engine_api_surface(self, rng):
        x16 = rng.standard_normal((1, 3, 8, 8)).astype(np.float16)
        w = rng.standard_normal((4, 3, 1, 1)).astype(np.float16)
        nodes = [W.make_node("Conv", ["in0", "w"], ["out0"],
                             kernel_shape=[1, 1])]
        eng = build_engine(
            nodes, [("in0", np.float16, (1, 3, 8, 8))],
            [("out0", np.float16, (1, 4, 8, 8))], {"w": w},
        )
        # fp16 model -> fp16 feed dtype (reference coreEngine.py:168)
        assert eng.engine_dtype == np.float16
        assert tuple(eng.get_engine_input_shape()) == (1, 3, 8, 8)
        shapes, names = eng.get_engine_output_shape()
        assert names == ["out0"] and tuple(shapes[0]) == (1, 4, 8, 8)
        out = eng.engine_inference(x16)[0]
        assert out.shape == (1, 4, 8, 8)

    def test_dynamic_batch_dim_defaults_to_one(self, rng):
        w = rng.standard_normal((2, 3, 1, 1)).astype(np.float32)
        nodes = [W.make_node("Conv", ["x", "w"], ["y"], kernel_shape=[1, 1])]
        m = W.simple_model(
            nodes, [("x", np.float32, (None, 3, 4, 4))],
            [("y", np.float32, None)], initializers={"w": w},
        )
        eng = OnnxGraphEngine(parse_onnx(m))
        assert tuple(eng.get_engine_input_shape()) == (1, 3, 4, 4)

    def test_unsupported_op_reports_name(self):
        nodes = [W.make_node("FancyCustomOp", ["x"], ["y"])]
        m = W.simple_model(
            nodes, [("x", np.float32, (1,))], [("y", np.float32, None)]
        )
        with pytest.raises(NotImplementedError, match="FancyCustomOp"):
            OnnxGraphEngine(parse_onnx(m))
