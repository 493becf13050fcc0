"""YOLO detector families in flax (NHWC, TPU-native).

Hand-built graphs for the three architecturally distinct families the
reference supports (ObjectDetector/utils.py:15-23):

* YOLOv5  — C3/SPPF CSP net, anchor-based head, (B, N, 5+nc) output
* YOLOv8  — C2f/SPPF CSP net, anchor-free DFL head, (B, 4+nc, N) output
  (YOLOv9 exports the same output contract)
* YOLOv10 — v8 trunk with SCDown/PSA/C2fCIB, dual one-to-many /
  one-to-one heads; one-to-one + top-k gives the NMS-free path

Outputs match the corresponding official ONNX export contracts so the
downstream decode (ops/yolo_decode.py) is shared between these native
graphs and ONNX-ingested models.  Weight scaling tables follow the
public ultralytics model cards.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, max_pool, resize_nearest_2x

# depth_multiple, width_multiple, max_channels
_V8_SCALES = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}
# "c" row serves the GELAN-C (yolov9c) head-width computation: its P3/P4/P5
# feature widths are 256/512/512.
_V8_SCALES["c"] = (1.0, 1.0, 512)

_V5_SCALES = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 1024),
    "l": (1.0, 1.00, 1024),
    "x": (4 / 3, 1.25, 1024),
}

V5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor))


def _scale_channels(c: int, width: float, max_ch: int) -> int:
    return _make_divisible(min(c, max_ch) * width)


def _scale_depth(n: int, depth: float) -> int:
    return max(1, round(n * depth))


@dataclass(frozen=True)
class YoloSpec:
    family: str  # "v5" | "v6" | "v7" | "v8" | "v9" | "v10"
    scale: str = "n"
    num_classes: int = 80
    input_size: Tuple[int, int] = (640, 640)
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16  # DFL bins (v8/v10)
    #: v10 only: (stage4, pan4, pan5) RepVGGDW flags; None = V10_LK table
    v10_lk: object = None

    @property
    def channels(self) -> Sequence[int]:
        table = _V5_SCALES if self.family == "v5" else _V8_SCALES
        d, w, mc = table[self.scale]
        return [_scale_channels(c, w, mc) for c in (64, 128, 256, 512, 1024)]

    @property
    def depths(self) -> Sequence[int]:
        table = _V5_SCALES if self.family == "v5" else _V8_SCALES
        d, _, _ = table[self.scale]
        base = (3, 6, 9, 3) if self.family == "v5" else (3, 6, 6, 3)
        return [_scale_depth(n, d) for n in base]

    @property
    def num_anchors(self) -> int:
        h, w = self.input_size
        return sum((h // s) * (w // s) for s in self.strides)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    kernels: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, train=False, emit_scale=None, emit_planar=False):
        """``emit_scale``: this bottleneck's output belongs to an s8
        concat group (C2f/C3 parts) — emit a QTensor quantized at the
        group's unified scale (TRT int8-concat semantics; see
        layers.s8_group_scale).  ``emit_planar``: chaining hint — when
        the fused two-conv Pallas path serves this body, stay in the
        padded-planar s8 domain for the next bottleneck."""
        hidden = int(self.features * self.expansion)
        # cv1 -> cv2 is a single-consumer edge: chain s8 between the
        # int8 epilogues (layers._S8_CHAIN) so no bf16 intermediate
        # lands in HBM.  Only when cv2 can actually take int8 — emitting
        # into an ineligible consumer would add a useless quantize/
        # dequantize round trip on a previously-exact bf16 edge.
        from ..ops import pallas_block as PBK
        from .layers import QTensor, int8_conv_eligible, quantize_to

        y = self._fused(x, train, emit_scale, emit_planar, hidden)
        if y is not None:
            return y
        if isinstance(x, PBK.PlanarQ):
            # planar chain reaching an unfusable body: re-enter NHWC
            x = QTensor(PBK.from_planar(x), x.scale)
        y = ConvBN(hidden, (self.kernels[0],) * 2, name="cv1")(
            x, train, emit_q=int8_conv_eligible(1, hidden)
        )
        use_shortcut = self.shortcut and x.shape[-1] == self.features
        if (
            emit_scale is not None
            and not use_shortcut
            and int8_conv_eligible(1, hidden)
        ):
            # the group quantize rides cv2's fused epilogue directly
            return ConvBN(
                self.features, (self.kernels[1],) * 2, name="cv2"
            )(y, train, emit_scale=emit_scale)
        y = ConvBN(self.features, (self.kernels[1],) * 2, name="cv2")(y, train)
        if use_shortcut:
            xv = x.dequant() if isinstance(x, QTensor) else x
            y = xv + y
        if emit_scale is not None:
            # residual-add output: the explicit group quantize fuses
            # into the add/epilogue elementwise chain (XLA fuses conv
            # CONSUMERS); only the s8 tensor reaches HBM
            y = quantize_to(y, emit_scale)
        return y

    def _fused(self, x, train, emit_scale, emit_planar, hidden):
        """Fused two-conv Pallas body (ops/pallas_block.py): serves the
        3x3->3x3 C2f bottleneck under calibrated int8 with a concat-
        group output scale — both convs + the shortcut add + the group
        requantize in one kernel, mid activation VMEM-resident.  None ->
        caller runs the per-conv XLA path (exact fallback; identical
        parameter/calibration trees via layers.QConvParams)."""
        from . import layers as L
        from ..ops import pallas_block as PBK

        if (
            L._QUANT_MODE != "int8"
            or train
            or emit_scale is None
            or self.kernels != (3, 3)
            or hidden != self.features
            or not L.int8_conv_eligible(1, hidden)
        ):
            return None
        if isinstance(x, PBK.PlanarQ):
            hw, cin = x.hw, x.data.shape[2]
        elif isinstance(x, L.QTensor):
            hw, cin = (x.shape[1], x.shape[2]), x.shape[-1]
        else:
            return None  # group inputs arrive as QTensor when calibrated
        if cin != self.features:
            return None
        if not PBK.block_enabled() or not PBK.block_shape_wins(
            hw[0], hw[1], cin
        ):
            return None
        # every fused/XLA decision must happen BEFORE the first flax
        # submodule is created: a later fallback would re-create the
        # same names in the XLA path (flax NameInUseError) — the
        # compile probe only needs shapes
        interpret = jax.default_backend() != "tpu"
        use_shortcut = self.shortcut  # cin == features established above
        nhwc = PBK.block_layout() == "nhwc"
        if nhwc and isinstance(x, PBK.PlanarQ):
            x = L.QTensor(PBK.from_planar(x), x.scale)
        if not interpret:
            n = x.data.shape[0] if isinstance(x, PBK.PlanarQ) else x.shape[0]
            probe = (
                PBK.block_nhwc_compile_ok if nhwc else PBK.block_compile_ok
            )
            if not probe(
                n, hw[0], hw[1], cin, hidden, self.features,
                "silu", "silu", None, use_shortcut,
            ):
                return None
        w1q, w1s, _, y1s, gain1, fb1 = L.QConvBNParams(
            hidden, (3, 3), name="cv1"
        )(cin)
        w2q, w2s, _, _, gain2, fb2 = L.QConvBNParams(
            self.features, (3, 3), name="cv2"
        )(hidden)
        if y1s is None:
            # a group scale (emit_scale) only exists on a calibrated
            # tree, and that same pass records cv1's ymax (emit_q) —
            # an inconsistent tree must fail loudly (a fallback here
            # would re-create the cv1/cv2 module names)
            raise ValueError(
                "inconsistent calibration tree: concat group scale "
                "present but cv1 ymax missing (recalibrate the model)"
            )
        L._TRACE_STATS["pallas_blocks"] += 1
        if nhwc:
            out = PBK.fused_block_nhwc(
                x.data, x.scale,
                w1q, w1s * x.scale * gain1, fb1, y1s,
                w2q, w2s * y1s * gain2, fb2, emit_scale,
                act1="silu", act2="silu", act_post=None,
                residual=use_shortcut, interpret=interpret,
            )
            return L.QTensor(out, emit_scale)
        xp = (
            x
            if isinstance(x, PBK.PlanarQ)
            else PBK.to_planar(x.data, x.scale)
        )
        out = PBK.fused_block(
            xp,
            w1q, w1s * xp.scale * gain1, fb1, y1s,
            w2q, w2s * y1s * gain2, fb2, emit_scale,
            act1="silu", act2="silu", act_post=None,
            residual=use_shortcut, interpret=interpret,
        )
        if emit_planar:
            return out
        return L.QTensor(PBK.from_planar(out), emit_scale)


class C3(nn.Module):
    """YOLOv5 CSP block with 3 convolutions."""

    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train=False, emit_q=False, emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        hidden = self.features // 2
        # s8 concat group (TRT int8-concat): the two branch exits emit
        # at ONE calibrated scale so the concat stays 1-byte and cv3
        # reads it with no input-quantize pass
        gscale = s8_group_scale(self)
        a = ConvBN(hidden, (1, 1), name="cv1")(
            x, train, emit_scale=gscale if self.n == 0 else None
        )
        for i in range(self.n):
            a = Bottleneck(
                hidden, self.shortcut, expansion=1.0, kernels=(1, 3),
                name=f"m{i}",
            )(a, train, emit_scale=gscale if i == self.n - 1 else None)
        b = ConvBN(hidden, (1, 1), name="cv2")(x, train, emit_scale=gscale)
        cat = qconcat([a, b])
        s8_group_record(self, cat)
        return ConvBN(self.features, (1, 1), name="cv3")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class C2f(nn.Module):
    """YOLOv8 cross-stage block: split + cascaded bottlenecks, concat all."""

    features: int
    n: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train=False, emit_q=False, emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        hidden = self.features // 2
        # s8 concat group: every part (cv1's two split halves + each
        # bottleneck exit) emits at one calibrated scale — parts slice/
        # chain in the s8 domain (QTensor.__getitem__), the n+2-way
        # concat is 1-byte, and cv2 reads it with no input quantize.
        # Each part's QTensor serves BOTH its consumers (the next
        # bottleneck's int8 cv1 and the concat) — the multi-consumer
        # edge the per-producer ymax chaining could not cover.
        from ..ops.pallas_block import PlanarQ, from_planar
        from .layers import QTensor

        gscale = s8_group_scale(self)
        y = ConvBN(2 * hidden, (1, 1), name="cv1")(
            x, train, emit_scale=gscale
        )
        parts = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(
                    hidden, self.shortcut, expansion=1.0, kernels=(3, 3),
                    name=f"m{i}",
                )(
                    parts[-1], train, emit_scale=gscale,
                    # planar chaining hint: the next bottleneck can
                    # consume the padded-planar s8 form directly; the
                    # concat below re-enters NHWC per part
                    emit_planar=i + 1 < self.n,
                )
            )
        parts = [
            QTensor(from_planar(p), p.scale)
            if isinstance(p, PlanarQ)
            else p
            for p in parts
        ]
        cat = qconcat(parts)
        s8_group_record(self, cat)
        return ConvBN(self.features, (1, 1), name="cv2")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 cascaded 5x5 maxpools."""

    features: int

    @nn.compact
    def __call__(self, x, train=False, emit_q=False, emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        hidden = x.shape[-1] // 2
        # s8 concat group: the pools run in the s8 domain (max commutes
        # with the positive dequant scale — layers.max_pool_q), so one
        # cv1 emission covers all four concat members
        gscale = s8_group_scale(self)
        y = ConvBN(hidden, (1, 1), name="cv1")(x, train, emit_scale=gscale)
        p1 = max_pool(y, 5, 1, pad=2)
        p2 = max_pool(p1, 5, 1, pad=2)
        p3 = max_pool(p2, 5, 1, pad=2)
        cat = qconcat([y, p1, p2, p3])
        s8_group_record(self, cat)
        return ConvBN(self.features, (1, 1), name="cv2")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class SCDown(nn.Module):
    """YOLOv10 spatial-channel decoupled downsample."""

    features: int

    @nn.compact
    def __call__(self, x, train=False):
        y = ConvBN(self.features, (1, 1), name="cv1")(x, train)
        return ConvBN(
            self.features, (3, 3), strides=(2, 2), groups=self.features,
            act=None, name="cv2",
        )(y, train)


class RepVGGDW(nn.Module):
    """Depthwise re-param block (YOLOv10 large-kernel CIB slot):
    7×7-dw + 3×3-dw branches (BN, no act) summed, SiLU.  Training form so
    released checkpoints map 1:1."""

    features: int

    @nn.compact
    def __call__(self, x, train=False):
        a = ConvBN(
            self.features, (7, 7), groups=self.features, act=None,
            name="conv",
        )(x, train)
        b = ConvBN(
            self.features, (3, 3), groups=self.features, act=None,
            name="conv1",
        )(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Compact inverted block (YOLOv10); ``lk`` swaps the middle dw conv
    for RepVGGDW (the yaml's large-kernel flag)."""

    features: int
    shortcut: bool = True
    lk: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        y = ConvBN(cin, (3, 3), groups=cin, name="cv0")(x, train)
        y = ConvBN(2 * self.features, (1, 1), name="cv1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * self.features, name="cv2")(y, train)
        else:
            y = ConvBN(
                2 * self.features, (3, 3), groups=2 * self.features,
                name="cv2",
            )(y, train)
        y = ConvBN(self.features, (1, 1), name="cv3")(y, train)
        y = ConvBN(
            self.features, (3, 3), groups=self.features, name="cv4"
        )(y, train)
        if self.shortcut and cin == self.features:
            from .layers import QTensor

            xv = x.dequant() if isinstance(x, QTensor) else x
            y = xv + y
        return y


class C2fCIB(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    lk: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        from .layers import (
            QTensor,
            qconcat,
            quantize_to,
            s8_group_record,
            s8_group_scale,
        )

        hidden = self.features // 2
        # s8 concat group (see C2f): CIB exits are depthwise-ended so
        # they cannot emit from a conv epilogue — the explicit group
        # quantize fuses into each exit's elementwise chain instead
        gscale = s8_group_scale(self)
        y = ConvBN(2 * hidden, (1, 1), name="cv1")(
            x, train, emit_scale=gscale
        )
        parts = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            p = CIB(hidden, self.shortcut, lk=self.lk, name=f"m{i}")(
                parts[-1], train
            )
            if gscale is not None and not isinstance(p, QTensor):
                p = quantize_to(p, gscale)
            parts.append(p)
        cat = qconcat(parts)
        s8_group_record(self, cat)
        return ConvBN(self.features, (1, 1), name="cv2")(cat, train)


#: (stage4, pan4, pan5) large-kernel flags per v10 scale, from the
#: THU-MIG yolov10 yaml family: the dw-7×7 RepVGGDW appears in the
#: small models (n/s) whose CIBs benefit from kernel size; the wider
#: m/l/x plans use plain 3×3-dw CIBs.  Override with YoloSpec.v10_lk if
#: a checkpoint disagrees (the importer raises naming exactly which
#: block mismatched).
V10_LK = {
    "n": (False, False, True),
    "s": (True, False, True),
    "m": (False, False, False),
    "l": (False, False, False),
    "x": (False, False, False),
}


def v10_lk_flags(spec: "YoloSpec") -> Tuple[bool, bool, bool]:
    if spec.v10_lk is not None:
        return spec.v10_lk
    return V10_LK.get(spec.scale, (False, False, False))


class PSA(nn.Module):
    """Partial self-attention block (YOLOv10): attention over half the
    channels of the stride-32 map."""

    features: int

    @nn.compact
    def __call__(self, x, train=False, emit_scale=None):
        hidden = self.features // 2
        y = ConvBN(self.features, (1, 1), name="cv1")(x, train)
        a, b = y[..., :hidden], y[..., hidden:]

        # single-head scaled dot-product attention, head_dim = hidden // 2
        B, H, W, C = b.shape
        num_heads = max(1, hidden // 64)
        head_dim = C // num_heads
        key_dim = head_dim // 2
        qkv = ConvBN(
            num_heads * (2 * key_dim + head_dim), (1, 1), act=None,
            name="attn_qkv",
        )(b, train)
        qkv = qkv.reshape(B, H * W, num_heads, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(key_dim)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        pe = ConvBN(C, (3, 3), groups=C, act=None, name="attn_pe")(v.reshape(B, H, W, C), train)
        out = ConvBN(C, (1, 1), act=None, name="attn_proj")(out + pe, train)
        b = b + out
        ffn = ConvBN(C * 2, (1, 1), name="ffn1")(b, train)
        b = b + ConvBN(C, (1, 1), act=None, name="ffn2")(ffn, train)
        return ConvBN(self.features, (1, 1), name="cv2")(
            jnp.concatenate([a, b], axis=-1), train, emit_scale=emit_scale
        )


class YoloBackboneNeck(nn.Module):
    """Shared CSP backbone + PAN neck; block type per family."""

    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train=False):
        s = self.spec
        ch = s.channels
        d = s.depths
        v10 = s.family == "v10"
        Block = C3 if s.family == "v5" else C2f

        from .layers import (
            QTensor,
            qconcat,
            quantize_to,
            s8_group_record,
            s8_group_scale,
        )

        # NECK s8 concat groups (TRT int8-concat + scale propagation):
        # the four PAN concats pair into TWO groups because they share
        # producers — p5(r) feeds both the fpn4 and pan5 concats, t1(r)
        # feeds both fpn3 and pan4 — and TRT's scale propagation merges
        # the scales of concats sharing a tensor.  Group A = {fpn4,
        # pan5} concats (members p5(r), p4, pan5_down out); group B =
        # {fpn3, pan4} (members t1(r), p3, pan3 out).  Every member is
        # a conv epilogue emission (or an explicit fused quantize for
        # v10's depthwise-ended SCDown), the 2x nearest upsample rides
        # the s8 bytes (layers.resize_nearest_2x), and the consuming
        # blocks read the 1-byte concat with no input-quantize pass —
        # the p3/p4/p5/t1 taps that previously had to stay bf16.  Each
        # group's absmax is recorded ONCE over both its concats (flax
        # forbids re-declaring the variable).
        ga = s8_group_scale(self, "neck_a_xmax")
        gb = s8_group_scale(self, "neck_b_xmax")

        if s.family == "v5":
            x = ConvBN(ch[0], (6, 6), strides=(2, 2), name="stem")(x, train)
        else:
            x = ConvBN(ch[0], (3, 3), strides=(2, 2), name="stem")(x, train)
        # backbone edges whose consumers are ALL int8 convs chain s8
        # activations (layers._S8_CHAIN): downN -> stageN entry (for C3
        # that is BOTH cv1 and cv2 reading the same QTensor), stage1 ->
        # down2, stage4 -> sppf.cv1.
        x = ConvBN(ch[1], (3, 3), strides=(2, 2), name="down1")(
            x, train, emit_q=True
        )
        x = Block(ch[1], d[0], True, name="stage1")(x, train, emit_q=True)
        x = ConvBN(ch[2], (3, 3), strides=(2, 2), name="down2")(
            x, train, emit_q=True
        )
        # p3's QTensor (group B scale) serves BOTH consumers: down3 and
        # the fpn3 concat; likewise p4 (group A) serves down4 + fpn4
        p3 = Block(ch[2], d[1], True, name="stage2")(
            x, train, emit_scale=gb
        )
        if v10:
            x = SCDown(ch[3], name="down3")(p3, train)
        else:
            x = ConvBN(ch[3], (3, 3), strides=(2, 2), name="down3")(
                p3, train, emit_q=True
            )
        p4 = Block(ch[3], d[2], True, name="stage3")(
            x, train, emit_scale=ga
        )
        if v10:
            x = SCDown(ch[4], name="down4")(p4, train)
            lk = v10_lk_flags(s)
            # v10n keeps a plain C2f at stride 32; s and up use C2fCIB
            if s.scale == "n":
                x = C2f(ch[4], d[3], True, name="stage4")(
                    x, train, emit_q=True
                )
            else:
                x = C2fCIB(ch[4], d[3], True, lk=lk[0], name="stage4")(
                    x, train
                )
        else:
            x = ConvBN(ch[4], (3, 3), strides=(2, 2), name="down4")(
                p4, train, emit_q=True
            )
            x = Block(ch[4], d[3], True, name="stage4")(x, train, emit_q=True)
        if v10:
            # sppf -> psa.cv1 is a single-consumer conv edge (emit_q);
            # the PSA exit then emits at the group A scale
            p5 = SPPF(ch[4], name="sppf")(x, train, emit_q=True)
            p5 = PSA(ch[4], name="psa")(p5, train, emit_scale=ga)
        elif s.family == "v5":
            # v5 reduces channels via lat5 before the concats — SPPF
            # chains into it per-producer, lat5 emits at the group scale
            p5 = SPPF(ch[4], name="sppf")(x, train, emit_q=True)
        else:
            p5 = SPPF(ch[4], name="sppf")(x, train, emit_scale=ga)

        # PAN neck
        rec_a: list = []  # group A concat values (calibration record)
        rec_b: list = []
        if s.family == "v5":
            # v5 reduces channels before upsampling
            p5r = ConvBN(ch[3], (1, 1), name="lat5")(
                p5, train, emit_scale=ga
            )
            y = qconcat([resize_nearest_2x(p5r), p4])
            rec_a.append(y)
            t1 = C3(ch[3], d[0], False, name="fpn4")(y, train, emit_q=True)
            t1r = ConvBN(ch[2], (1, 1), name="lat4")(
                t1, train, emit_scale=gb
            )
            y = qconcat([resize_nearest_2x(t1r), p3])
            rec_b.append(y)
            n3 = C3(ch[2], d[0], False, name="fpn3")(y, train)
            y = ConvBN(ch[2], (3, 3), strides=(2, 2), name="pan3")(
                n3, train, emit_scale=gb
            )
            y = qconcat([y, t1r])
            rec_b.append(y)
            n4 = C3(ch[3], d[0], False, name="pan4")(y, train)
            y = ConvBN(ch[3], (3, 3), strides=(2, 2), name="pan5_down")(
                n4, train, emit_scale=ga
            )
            y = qconcat([y, p5r])
            rec_a.append(y)
            n5 = C3(ch[4], d[0], False, name="pan5")(y, train)
        else:
            y = qconcat([resize_nearest_2x(p5), p4])
            rec_a.append(y)
            t1 = C2f(ch[3], d[0], False, name="fpn4")(
                y, train, emit_scale=gb
            )
            y = qconcat([resize_nearest_2x(t1), p3])
            rec_b.append(y)
            # v8 neck exits emit s8 for their conv consumers (the pan
            # downsamples AND the head's dense 3x3 entry convs).  v10's
            # head opens with a DEPTHWISE cls conv (int8-ineligible —
            # it would dequant), so its exits stay bf16.
            emit_feats = not v10
            n3 = C2f(ch[2], d[0], False, name="fpn3")(
                y, train, emit_q=emit_feats
            )
            y = ConvBN(ch[2], (3, 3), strides=(2, 2), name="pan3")(
                n3, train, emit_scale=gb
            )
            lk = v10_lk_flags(s) if v10 else (False, False, False)
            y = qconcat([y, t1])
            rec_b.append(y)
            if v10 and s.scale not in ("n", "s"):
                n4 = C2fCIB(ch[3], d[0], v10, lk=lk[1], name="pan4")(
                    y, train
                )
            else:
                n4 = C2f(ch[3], d[0], v10, name="pan4")(
                    y, train, emit_q=emit_feats
                )
            if v10:
                y = SCDown(ch[3], name="pan5_down")(n4, train)
                # SCDown is depthwise-ended (cannot emit from a conv
                # epilogue) — the group quantize fuses into its
                # elementwise chain instead, as C2fCIB does for CIBs
                if ga is not None and not isinstance(y, QTensor):
                    y = quantize_to(y, ga)
                y = qconcat([y, p5])
                rec_a.append(y)
                n5 = C2fCIB(ch[4], d[0], True, lk=lk[2], name="pan5")(
                    y, train
                )
            else:
                y = ConvBN(ch[3], (3, 3), strides=(2, 2), name="pan5_down")(
                    n4, train, emit_scale=ga
                )
                y = qconcat([y, p5])
                rec_a.append(y)
                n5 = C2f(ch[4], d[0], False, name="pan5")(
                    y, train, emit_q=emit_feats
                )
        s8_group_record(self, rec_a, name="neck_a_xmax")
        s8_group_record(self, rec_b, name="neck_b_xmax")
        return n3, n4, n5


def _dfl_decode(box_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution-focal box decode: (..., 4*reg_max) -> (..., 4) ltrb."""
    shape = box_logits.shape[:-1]
    logits = box_logits.reshape(*shape, 4, reg_max)
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(reg_max, dtype=probs.dtype)
    return jnp.sum(probs * bins, axis=-1)


def _anchor_points(
    input_size: Tuple[int, int], strides: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-cell centers (x, y) + per-anchor stride, flattened over levels."""
    points, strides_out = [], []
    h, w = input_size
    for s in strides:
        gh, gw = h // s, w // s
        ys, xs = jnp.meshgrid(
            jnp.arange(gh, dtype=jnp.float32) + 0.5,
            jnp.arange(gw, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        points.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
        strides_out.append(jnp.full((gh * gw,), float(s)))
    return jnp.concatenate(points), jnp.concatenate(strides_out)


class DetectHeadV8(nn.Module):
    """Anchor-free decoupled head with DFL (shared by v8/v9 contract)."""

    spec: YoloSpec
    suffix: str = ""
    lightweight_cls: bool = False  # v10-style depthwise cls branch

    @nn.compact
    def __call__(self, feats, train=False):
        s = self.spec
        nc = s.num_classes
        c2 = max(16, s.channels[2] // 4, s.reg_max * 4)
        c3 = max(s.channels[2], min(nc, 100))
        outs = []
        for li, f in enumerate(feats):
            # box0→box1 / cls0→cls1 are single-consumer conv→conv edges
            # (s8 chain); the 1x1 predictors are plain nn.Conv outside
            # the int8 policy, so the branch tails stay bf16
            box = ConvBN(c2, (3, 3), name=f"box{self.suffix}{li}_0")(
                f, train, emit_q=True
            )
            box = ConvBN(c2, (3, 3), name=f"box{self.suffix}{li}_1")(box, train)
            box = nn.Conv(
                4 * s.reg_max, (1, 1), name=f"box{self.suffix}{li}_2"
            )(box)
            if self.lightweight_cls:
                cin = f.shape[-1]
                cls = ConvBN(
                    cin, (3, 3), groups=cin, name=f"cls{self.suffix}{li}_0a"
                )(f, train)
                cls = ConvBN(c3, (1, 1), name=f"cls{self.suffix}{li}_0b")(
                    cls, train
                )
                cls = ConvBN(
                    c3, (3, 3), groups=c3, name=f"cls{self.suffix}{li}_1a"
                )(cls, train)
                cls = ConvBN(c3, (1, 1), name=f"cls{self.suffix}{li}_1b")(
                    cls, train
                )
            else:
                cls = ConvBN(c3, (3, 3), name=f"cls{self.suffix}{li}_0")(
                    f, train, emit_q=True
                )
                cls = ConvBN(c3, (3, 3), name=f"cls{self.suffix}{li}_1")(
                    cls, train
                )
            cls = nn.Conv(nc, (1, 1), name=f"cls{self.suffix}{li}_2")(cls)
            b, h, w, _ = box.shape
            outs.append(
                (
                    box.reshape(b, h * w, 4 * s.reg_max),
                    cls.reshape(b, h * w, nc),
                )
            )
        box_flat = jnp.concatenate([o[0] for o in outs], axis=1)
        cls_flat = jnp.concatenate([o[1] for o in outs], axis=1)

        anchors, strides_arr = _anchor_points(s.input_size, s.strides)
        ltrb = _dfl_decode(box_flat, s.reg_max)
        x1y1 = anchors - ltrb[..., :2]
        x2y2 = anchors + ltrb[..., 2:]
        cxy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        xywh = jnp.concatenate([cxy, wh], axis=-1) * strides_arr[None, :, None]
        return xywh, jax.nn.sigmoid(cls_flat)


class YoloV8(nn.Module):
    """YOLOv8/v9-contract detector: output (B, 4+nc, N) like the official
    ONNX export consumed at reference yoloDetector.py:114-122."""

    spec: YoloSpec

    @property
    def stem_s2d_ok(self) -> bool:
        """The 3x3/2 stem (non-v5 families) is polyphase-evaluated, so
        it can consume pre-space-to-depth input from the planar
        preprocessing path (ops/preprocess S2DInput); v5's 6x6 even
        stem cannot."""
        return self.spec.family != "v5"

    @property
    def stem_planes_margins(self):
        """Halo margins for S2DPlanes input (the Pallas fused stem,
        ops/pallas_stem.py); None = planes unsupported (v5's 6x6 even
        stem)."""
        if self.spec.family == "v5":
            return None
        from ..ops.pallas_stem import stem_margins

        return stem_margins(3, 3, False)

    @nn.compact
    def __call__(self, x, train=False):
        feats = YoloBackboneNeck(self.spec, name="net")(x, train)
        xywh, cls = DetectHeadV8(self.spec, name="head")(feats, train)
        return jnp.concatenate([xywh, cls], axis=-1).transpose(0, 2, 1)


class YoloV5(nn.Module):
    """YOLOv5-contract detector: output (B, N, 5+nc) with objectness,
    anchor-grid decode baked in like the official export
    (consumed at reference yoloDetector.py:124)."""

    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train=False):
        s = self.spec
        nc = s.num_classes
        feats = YoloBackboneNeck(s, name="net")(x, train)
        na = len(V5_ANCHORS[0])
        outs = []
        for li, f in enumerate(feats):
            p = nn.Conv(na * (5 + nc), (1, 1), name=f"head{li}")(f)
            b, h, w, _ = p.shape
            p = p.reshape(b, h, w, na, 5 + nc)
            p = jax.nn.sigmoid(p)
            stride = s.strides[li]
            ys, xs = jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32),
                indexing="ij",
            )
            grid = jnp.stack([xs, ys], axis=-1)[None, :, :, None, :]
            anchors = jnp.asarray(V5_ANCHORS[li], jnp.float32)[
                None, None, None, :, :
            ]
            xy = (p[..., :2] * 2 - 0.5 + grid) * stride
            wh = (p[..., 2:4] * 2) ** 2 * anchors
            out = jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)
            outs.append(out.reshape(b, h * w * na, 5 + nc))
        return jnp.concatenate(outs, axis=1)


class YoloV10(nn.Module):
    """YOLOv10: dual-head. ``__call__`` emits the one-to-many raw output in
    the v8 contract (what the reference feeds through NMS,
    yoloDetector.py:114-139); ``one2one`` emits top-k NMS-free detections
    (B, k, 6) = (x1, y1, x2, y2, score, class)."""

    spec: YoloSpec
    max_det: int = 300

    @property
    def stem_s2d_ok(self) -> bool:
        """Same 3x3/2 polyphase stem as YoloV8."""
        return True

    @property
    def stem_planes_margins(self):
        """S2DPlanes margins (Pallas fused stem) — v10 shares the v8
        backbone stem."""
        from ..ops.pallas_stem import stem_margins

        return stem_margins(3, 3, False)

    def setup(self):
        self.net = YoloBackboneNeck(self.spec)
        # v10Detect uses the depthwise cls branch on BOTH heads
        self.head_o2m = DetectHeadV8(
            self.spec, suffix="m", lightweight_cls=True
        )
        self.head_o2o = DetectHeadV8(
            self.spec, suffix="o", lightweight_cls=True
        )

    def __call__(self, x, train=False):
        feats = self.net(x, train)
        xywh, cls = self.head_o2m(feats, train)
        return jnp.concatenate([xywh, cls], axis=-1).transpose(0, 2, 1)

    def both(self, x, train=False):
        """Touches both heads — use as the init method so the full
        parameter tree (o2m + o2o) is created."""
        feats = self.net(x, train)
        xywh_m, cls_m = self.head_o2m(feats, train)
        raw = jnp.concatenate([xywh_m, cls_m], axis=-1).transpose(0, 2, 1)
        return raw, self._o2o_from_feats(feats, train)

    def one2one(self, x, train=False):
        feats = self.net(x, train)
        return self._o2o_from_feats(feats, train)

    def _o2o_from_feats(self, feats, train=False):
        xywh, cls = self.head_o2o(feats, train)
        scores = jnp.max(cls, axis=-1)
        class_ids = jnp.argmax(cls, axis=-1)
        k = min(self.max_det, scores.shape[1])
        top_scores, idx = jax.lax.top_k(scores, k)
        top_xywh = jnp.take_along_axis(xywh, idx[..., None], axis=1)
        top_cls = jnp.take_along_axis(class_ids, idx, axis=1)
        x1y1 = top_xywh[..., :2] - top_xywh[..., 2:] / 2
        x2y2 = top_xywh[..., :2] + top_xywh[..., 2:] / 2
        return jnp.concatenate(
            [
                x1y1,
                x2y2,
                top_scores[..., None],
                top_cls[..., None].astype(jnp.float32),
            ],
            axis=-1,
        )


def build_yolo(spec: YoloSpec) -> nn.Module:
    if spec.family == "v5":
        return YoloV5(spec)
    if spec.family == "v5lite":
        from .yolov5lite import V5LITE_PLANS, YoloV5Lite

        if spec.scale not in (*V5LITE_PLANS, "g"):
            spec = YoloSpec(
                family="v5lite", scale="s",
                num_classes=spec.num_classes, input_size=spec.input_size,
            )
        return YoloV5Lite(spec)
    if spec.family == "v6":
        from .yolov6 import _V6_CSP_SCALES, _V6_SCALES, YoloV6

        if spec.scale not in _V6_SCALES and spec.scale not in _V6_CSP_SCALES:
            spec = YoloSpec(
                family="v6", scale="s", num_classes=spec.num_classes,
                input_size=spec.input_size,
            )
        return YoloV6(spec)
    if spec.family == "v7":
        from .yolov7 import YoloV7

        return YoloV7(spec)
    if spec.family == "v8":
        return YoloV8(spec)
    if spec.family == "v9":
        from .yolov9 import GELAN_CONFIGS, YoloV9

        variant = spec.scale if spec.scale in GELAN_CONFIGS else "c"
        return YoloV9(spec, variant=variant)
    if spec.family == "v10":
        return YoloV10(spec)
    raise ValueError(f"unknown yolo family {spec.family}")
