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
    def __call__(self, x, train: bool = False):
        c_ = self.features  # int(2 * c2 * 0.5)
        y = ConvBN(c_, (1, 1), name="cv1")(x, train)
        y = ConvBN(c_, (3, 3), name="cv3")(y, train)
        x1 = ConvBN(c_, (1, 1), name="cv4")(y, train)
        p5 = max_pool(x1, 5, 1, pad=2)
        p9 = max_pool(x1, 9, 1, pad=4)
        p13 = max_pool(x1, 13, 1, pad=6)
        y1 = ConvBN(c_, (1, 1), name="cv5")(
            jnp.concatenate([x1, p5, p9, p13], axis=-1), train
        )
        y1 = ConvBN(c_, (3, 3), name="cv6")(y1, train)
        y2 = ConvBN(c_, (1, 1), name="cv2")(x, train)
        return ConvBN(self.features, (1, 1), name="cv7")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class YoloV7(nn.Module):
    """Base yolov7 graph; layer indices mirror cfg/deploy/yolov7.yaml."""

    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        nc = s.num_classes
        t = {}  # yaml-index -> tensor

        def conv(i, src, c, k, stride=1):
            t[i] = ConvBN(
                c, (k, k), strides=(stride, stride), name=f"m{i}"
            )(src, train)
            return t[i]

        # ---- backbone ----
        conv(0, x, 32, 3)
        conv(1, t[0], 64, 3, 2)
        conv(2, t[1], 64, 3)
        conv(3, t[2], 128, 3, 2)

        def elan(i0, src, cb, cout):
            """ELAN: indices i0..i0+7 = 2×1×1, 4×3×3, concat, 1×1-out."""
            a = conv(i0, src, cb, 1)
            b = conv(i0 + 1, src, cb, 1)
            b1 = conv(i0 + 2, b, cb, 3)
            b2 = conv(i0 + 3, b1, cb, 3)
            b3 = conv(i0 + 4, b2, cb, 3)
            b4 = conv(i0 + 5, b3, cb, 3)
            t[i0 + 6] = jnp.concatenate([b4, b2, b, a], axis=-1)
            return conv(i0 + 7, t[i0 + 6], cout, 1)

        def mp_block(i0, src, c):
            """MP: maxpool→1×1 ∥ 1×1→3×3s2, concat (indices i0..i0+4)."""
            t[i0] = max_pool(src, 2, 2)
            a = conv(i0 + 1, t[i0], c, 1)
            b = conv(i0 + 2, src, c, 1)
            b = conv(i0 + 3, b, c, 3, 2)
            t[i0 + 4] = jnp.concatenate([b, a], axis=-1)
            return t[i0 + 4]

        elan(4, t[3], 64, 256)                 # 4-11
        mp_block(12, t[11], 128)               # 12-16  P3/8
        elan(17, t[16], 128, 512)              # 17-24
        mp_block(25, t[24], 256)               # 25-29  P4/16
        elan(30, t[29], 256, 1024)             # 30-37
        mp_block(38, t[37], 512)               # 38-42  P5/32
        elan(43, t[42], 256, 1024)             # 43-50

        # ---- head ----
        t[51] = SPPCSPC(512, name="m51")(t[50], train)
        conv(52, t[51], 256, 1)
        t[53] = resize_nearest_2x(t[52])
        conv(54, t[37], 256, 1)
        t[55] = jnp.concatenate([t[54], t[53]], axis=-1)

        def elan_w(i0, src, ca, cb, cout):
            """ELAN-W: 2×1×1 + 4×3×3, concat ALL six, 1×1 out."""
            a = conv(i0, src, ca, 1)
            b = conv(i0 + 1, src, ca, 1)
            c1 = conv(i0 + 2, b, cb, 3)
            c2 = conv(i0 + 3, c1, cb, 3)
            c3 = conv(i0 + 4, c2, cb, 3)
            c4 = conv(i0 + 5, c3, cb, 3)
            t[i0 + 6] = jnp.concatenate([c4, c3, c2, c1, b, a], axis=-1)
            return conv(i0 + 7, t[i0 + 6], cout, 1)

        elan_w(56, t[55], 256, 128, 256)       # 56-63
        conv(64, t[63], 128, 1)
        t[65] = resize_nearest_2x(t[64])
        conv(66, t[24], 128, 1)
        t[67] = jnp.concatenate([t[66], t[65]], axis=-1)
        elan_w(68, t[67], 128, 64, 128)        # 68-75  P3 feat

        def head_mp(i0, src, c, route):
            t[i0] = max_pool(src, 2, 2)
            a = conv(i0 + 1, t[i0], c, 1)
            b = conv(i0 + 2, src, c, 1)
            b = conv(i0 + 3, b, c, 3, 2)
            t[i0 + 4] = jnp.concatenate([b, a, route], axis=-1)
            return t[i0 + 4]

        head_mp(76, t[75], 128, t[63])         # 76-80
        elan_w(81, t[80], 256, 128, 256)       # 81-88  P4 feat
        head_mp(89, t[88], 256, t[51])         # 89-93
        elan_w(94, t[93], 512, 256, 512)       # 94-101 P5 feat

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
