"""YOLOv7 (E-ELAN) in flax — the real v7 graph, not the v5 stand-in.

Implements the official WongKinYiu/yolov7 base-model topology
(cfg/deploy/yolov7.yaml, the 640 "yolov7" release): E-ELAN aggregation
blocks, MP (maxpool ∥ strided-conv) downsampling, SPPCSPC, ELAN-W head,
RepConv pre-heads and the IDetect anchor head with implicit add/mul.
Output contract is the v5 export contract — ``(1, N, 5+nc)`` post-
sigmoid with grid/anchor decode baked in — which is exactly how the
reference consumes v7 ONNX exports (yoloDetector.py:124-133).

Module names carry the yaml layer index (``m{i}``), so checkpoint
ingestion (tools/yolo_import.yolov7_mapping) is a direct index walk of
the official ``model.{i}.*`` state-dict layout.  RepConv is kept in its
training (unfused) 3×3+1×1 form so released ``yolov7.pt`` training
checkpoints map 1:1.

Only the base "yolov7" variant is modeled natively (tiny/x/d6/e6 use
different ELAN plans); those run via the ONNX graph executor.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, max_pool, resize_nearest_2x
from .yolo import YoloSpec

V7_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)


class RepConv(nn.Module):
    """v7 RepConv (training form): 3×3+BN ∥ 1×1+BN summed, SiLU.
    The in!=out channels here never trigger the identity branch."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = ConvBN(
            self.features, (3, 3), act=None, name="rbr_dense"
        )(x, train)
        one = ConvBN(
            self.features, (1, 1), act=None, name="rbr_1x1"
        )(x, train)
        return nn.silu(dense + one)


class SPPCSPC(nn.Module):
    """CSP-wrapped SPP with 5/9/13 maxpools (common.py SPPCSPC, e=0.5)."""

    features: int  # c2

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        c_ = self.features  # int(2 * c2 * 0.5)
        # two s8 concat groups: the SPP pyramid (pools commute with the
        # positive dequant scale) and the CSP merge; cv1→cv3→cv4 and
        # cv5→cv6 chain per-producer
        g_spp = s8_group_scale(self, "spp_xmax")
        g_csp = s8_group_scale(self, "csp_xmax")
        y = ConvBN(c_, (1, 1), name="cv1")(x, train, emit_q=True)
        y = ConvBN(c_, (3, 3), name="cv3")(y, train, emit_q=True)
        x1 = ConvBN(c_, (1, 1), name="cv4")(y, train, emit_scale=g_spp)
        p5 = max_pool(x1, 5, 1, pad=2)
        p9 = max_pool(x1, 9, 1, pad=4)
        p13 = max_pool(x1, 13, 1, pad=6)
        cat = qconcat([x1, p5, p9, p13])
        s8_group_record(self, cat, name="spp_xmax")
        y1 = ConvBN(c_, (1, 1), name="cv5")(cat, train, emit_q=True)
        y1 = ConvBN(c_, (3, 3), name="cv6")(y1, train, emit_scale=g_csp)
        y2 = ConvBN(c_, (1, 1), name="cv2")(x, train, emit_scale=g_csp)
        cat = qconcat([y1, y2])
        s8_group_record(self, cat, name="csp_xmax")
        return ConvBN(self.features, (1, 1), name="cv7")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class YoloV7(nn.Module):
    """Base yolov7 graph; layer indices mirror cfg/deploy/yolov7.yaml."""

    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import qconcat, s8_group_record, s8_group_scale

        s = self.spec
        nc = s.num_classes
        t = {}  # yaml-index -> tensor

        # Every concat in the graph is an s8 group owned by THIS module
        # (the blocks are closures, not submodules), named by its yaml
        # layer index; all other edges are conv→conv or conv→maxpool
        # (max commutes with the dequant scale) and chain per-producer,
        # so the whole deploy graph rides 1-byte activations — TRT's
        # whole-network int8 (reference sketch
        # convertOnnxToTensorRT.py:28-99).
        # one scale OBJECT per group per trace: some groups are fetched
        # at two sites (mp76/mp89 route emission + the head_mp concat)
        # and qconcat's membership guard checks scale identity
        _gsc_cache = {}

        def gsc(name):
            if name not in _gsc_cache:
                _gsc_cache[name] = s8_group_scale(self, name)
            return _gsc_cache[name]

        def conv(i, src, c, k, stride=1, emit_q=False, emit_scale=None):
            t[i] = ConvBN(
                c, (k, k), strides=(stride, stride), name=f"m{i}"
            )(src, train, emit_q=emit_q, emit_scale=emit_scale)
            return t[i]

        # ---- backbone ----
        conv(0, x, 32, 3)
        conv(1, t[0], 64, 3, 2, emit_q=True)
        conv(2, t[1], 64, 3, emit_q=True)
        conv(3, t[2], 128, 3, 2, emit_q=True)

        def elan(i0, src, cb, cout, emit_q=False, emit_scale=None):
            """ELAN: indices i0..i0+7 = 2×1×1, 4×3×3, concat, 1×1-out.
            Concat members (b4,b2,b,a) emit at one group scale — b/b2
            also feed the next 3×3, which reads the same s8 tensor;
            b1/b3 are single-consumer conv edges (own-scale emit)."""
            g = gsc(f"elan{i0}_xmax")
            a = conv(i0, src, cb, 1, emit_scale=g)
            b = conv(i0 + 1, src, cb, 1, emit_scale=g)
            b1 = conv(i0 + 2, b, cb, 3, emit_q=True)
            b2 = conv(i0 + 3, b1, cb, 3, emit_scale=g)
            b3 = conv(i0 + 4, b2, cb, 3, emit_q=True)
            b4 = conv(i0 + 5, b3, cb, 3, emit_scale=g)
            t[i0 + 6] = qconcat([b4, b2, b, a])
            s8_group_record(self, t[i0 + 6], name=f"elan{i0}_xmax")
            return conv(
                i0 + 7, t[i0 + 6], cout, 1,
                emit_q=emit_q, emit_scale=emit_scale,
            )

        def mp_block(i0, src, c):
            """MP: maxpool→1×1 ∥ 1×1→3×3s2, concat (indices i0..i0+4).
            Both member convs emit at the block's group scale, so the
            output concat is s8 for the next ELAN's 1×1 entries."""
            g = gsc(f"mp{i0}_xmax")
            t[i0] = max_pool(src, 2, 2)
            a = conv(i0 + 1, t[i0], c, 1, emit_scale=g)
            b = conv(i0 + 2, src, c, 1, emit_q=True)
            b = conv(i0 + 3, b, c, 3, 2, emit_scale=g)
            t[i0 + 4] = qconcat([b, a])
            s8_group_record(self, t[i0 + 4], name=f"mp{i0}_xmax")
            return t[i0 + 4]

        elan(4, t[3], 64, 256, emit_q=True)    # 4-11
        mp_block(12, t[11], 128)               # 12-16  P3/8
        # t[24]/t[37] also feed the head's lateral 1×1s (conv 66/54) —
        # conv consumers reading the same s8 tensor
        elan(17, t[16], 128, 512, emit_q=True)  # 17-24
        mp_block(25, t[24], 256)               # 25-29  P4/16
        elan(30, t[29], 256, 1024, emit_q=True)  # 30-37
        mp_block(38, t[37], 512)               # 38-42  P5/32
        elan(43, t[42], 256, 1024, emit_q=True)  # 43-50

        # ---- head ----
        # t[51] feeds conv 52 AND the head_mp89 route concat: emit at
        # that group's scale (the conv consumer reads any scale)
        t[51] = SPPCSPC(512, name="m51")(
            t[50], train, emit_scale=gsc("mp89_xmax")
        )
        g55 = gsc("cat55_xmax")
        conv(52, t[51], 256, 1, emit_scale=g55)
        t[53] = resize_nearest_2x(t[52])  # rides the s8 bytes
        conv(54, t[37], 256, 1, emit_scale=g55)
        t[55] = qconcat([t[54], t[53]])
        s8_group_record(self, t[55], name="cat55_xmax")

        def elan_w(i0, src, ca, cb, cout, emit_q=False, emit_scale=None):
            """ELAN-W: 2×1×1 + 4×3×3, concat ALL six, 1×1 out — every
            member is also the next conv's input, so all six emit at
            the group scale."""
            g = gsc(f"elan{i0}_xmax")
            a = conv(i0, src, ca, 1, emit_scale=g)
            b = conv(i0 + 1, src, ca, 1, emit_scale=g)
            c1 = conv(i0 + 2, b, cb, 3, emit_scale=g)
            c2 = conv(i0 + 3, c1, cb, 3, emit_scale=g)
            c3 = conv(i0 + 4, c2, cb, 3, emit_scale=g)
            c4 = conv(i0 + 5, c3, cb, 3, emit_scale=g)
            t[i0 + 6] = qconcat([c4, c3, c2, c1, b, a])
            s8_group_record(self, t[i0 + 6], name=f"elan{i0}_xmax")
            return conv(
                i0 + 7, t[i0 + 6], cout, 1,
                emit_q=emit_q, emit_scale=emit_scale,
            )

        # t[63] also routes into head_mp76's concat
        elan_w(56, t[55], 256, 128, 256, emit_scale=gsc("mp76_xmax"))
        g67 = gsc("cat67_xmax")
        conv(64, t[63], 128, 1, emit_scale=g67)
        t[65] = resize_nearest_2x(t[64])
        conv(66, t[24], 128, 1, emit_scale=g67)
        t[67] = qconcat([t[66], t[65]])
        s8_group_record(self, t[67], name="cat67_xmax")
        # P3/P4/P5 feats feed max_pool + 1×1 + RepConv branches — all
        # s8-capable consumers
        elan_w(68, t[67], 128, 64, 128, emit_q=True)  # 68-75  P3 feat

        def head_mp(i0, src, c, route):
            g = gsc(f"mp{i0}_xmax")
            t[i0] = max_pool(src, 2, 2)
            a = conv(i0 + 1, t[i0], c, 1, emit_scale=g)
            b = conv(i0 + 2, src, c, 1, emit_q=True)
            b = conv(i0 + 3, b, c, 3, 2, emit_scale=g)
            t[i0 + 4] = qconcat([b, a, route])
            s8_group_record(self, t[i0 + 4], name=f"mp{i0}_xmax")
            return t[i0 + 4]

        head_mp(76, t[75], 128, t[63])         # 76-80
        elan_w(81, t[80], 256, 128, 256, emit_q=True)  # 81-88  P4 feat
        head_mp(89, t[88], 256, t[51])         # 89-93
        elan_w(94, t[93], 512, 256, 512, emit_q=True)  # 94-101 P5 feat

        r3 = RepConv(256, name="m102")(t[75], train)
        r4 = RepConv(512, name="m103")(t[88], train)
        r5 = RepConv(1024, name="m104")(t[101], train)

        # IDetect (yaml 105): implicit-add → 1×1 conv → implicit-mul,
        # then the v5-style grid/anchor decode the export bakes in
        na = len(V7_ANCHORS[0])
        outs = []
        for li, f in enumerate((r3, r4, r5)):
            cin = f.shape[-1]
            ia = self.param(
                f"ia{li}_implicit", nn.initializers.zeros, (1, 1, 1, cin)
            )
            p = nn.Conv(na * (5 + nc), (1, 1), name=f"head{li}")(f + ia)
            im = self.param(
                f"im{li}_implicit",
                nn.initializers.ones,
                (1, 1, 1, na * (5 + nc)),
            )
            p = p * im
            b, h, w, _ = p.shape
            p = jax.nn.sigmoid(p.reshape(b, h, w, na, 5 + nc))
            stride = s.strides[li]
            ys, xs = jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32),
                indexing="ij",
            )
            grid = jnp.stack([xs, ys], axis=-1)[None, :, :, None, :]
            anchors = jnp.asarray(V7_ANCHORS[li], jnp.float32)[
                None, None, None, :, :
            ]
            xy = (p[..., :2] * 2 - 0.5 + grid) * stride
            wh = (p[..., 2:4] * 2) ** 2 * anchors
            out = jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)
            outs.append(out.reshape(b, h * w * na, 5 + nc))
        return jnp.concatenate(outs, axis=1)
