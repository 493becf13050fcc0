"""YOLOv9 (GELAN) in flax — the real v9 trunk, not the v8 stand-in.

Implements the public GELAN-C inference topology (WongKinYiu yolov9 /
ultralytics yolov9c): RepNCSPELAN4 stages with RepConvN bottlenecks,
ADown downsampling, SPPELAN, and the v8-style DFL detect head — the
reference consumes v9 through its ONNX export whose output contract is
identical to v8 (yoloDetector.py:114-122), which models/yolo.py's decode
already handles; this module supplies the faithful native graph so v9
checkpoints can ingest.

RepConvN is kept in its training structure (3x3 + 1x1 branches summed
before the activation) so unfused checkpoints map 1:1; deploy-fused
checkpoints simply carry a zero 1x1 branch.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, max_pool
from .yolo import DetectHeadV8, YoloSpec


class RepConvN(nn.Module):
    """Re-parameterizable conv: 3x3 + 1x1 branches, summed, then SiLU."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBN(
            self.features, (3, 3), strides=self.strides, act=None,
            dtype=self.dtype, name="conv1",
        )(x, train)
        b = ConvBN(
            self.features, (1, 1), strides=self.strides, act=None,
            dtype=self.dtype, name="conv2",
        )(x, train)
        return nn.silu(a + b)


class RepNBottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import QTensor

        hidden = int(self.features * self.expansion)
        y = RepConvN(hidden, name="cv1")(x, train)
        y = ConvBN(self.features, (3, 3), name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            # chained s8 input: the residual add runs on the bf16 view
            xv = x.dequant() if isinstance(x, QTensor) else x
            y = xv + y
        return y


class RepNCSP(nn.Module):
    """CSP block over RepNBottlenecks (the C3 shape with Rep convs)."""

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import (
            QTensor, qconcat, quantize_to, s8_group_record, s8_group_scale,
        )

        hidden = int(self.features * self.expansion)
        # s8 concat group (TRT int8-concat, same shape as yolo.C3): the
        # two branch exits emit at one calibrated scale, cv3 reads the
        # 1-byte concat with no input-quantize pass
        gscale = s8_group_scale(self)
        a = ConvBN(hidden, (1, 1), name="cv1")(x, train, emit_q=True)
        for i in range(self.n):
            a = RepNBottleneck(
                hidden, self.shortcut, expansion=1.0, name=f"m{i}"
            )(a, train)
        # the RepN bottleneck exit is a residual add, not a conv
        # epilogue — the group quantize fuses into its elementwise chain
        if gscale is not None and not isinstance(a, QTensor):
            a = quantize_to(a, gscale)
        b = ConvBN(hidden, (1, 1), name="cv2")(x, train, emit_scale=gscale)
        cat = qconcat([a, b])
        s8_group_record(self, cat)
        return ConvBN(self.features, (1, 1), name="cv3")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class RepNCSPELAN4(nn.Module):
    """GELAN aggregation block: split + two RepNCSP->Conv branches,
    concat everything."""

    c2: int  # output channels
    c3: int  # first 1x1 width (split in half)
    c4: int  # branch width
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        half = self.c3 // 2
        # s8 concat group (same shape as yolo.C2f): cv1's split halves
        # slice in the s8 domain, each branch tail conv emits at the
        # group scale, the 4-way concat is 1-byte and cv4 reads it with
        # no input quantize
        gscale = s8_group_scale(self)
        y = ConvBN(self.c3, (1, 1), name="cv1")(x, train, emit_scale=gscale)
        parts = [y[..., :half], y[..., half:]]
        h = RepNCSP(self.c4, self.n, name="cv2_csp")(
            parts[-1], train, emit_q=True
        )
        h = ConvBN(self.c4, (3, 3), name="cv2_conv")(
            h, train, emit_scale=gscale
        )
        parts.append(h)
        h = RepNCSP(self.c4, self.n, name="cv3_csp")(
            parts[-1], train, emit_q=True
        )
        h = ConvBN(self.c4, (3, 3), name="cv3_conv")(
            h, train, emit_scale=gscale
        )
        parts.append(h)
        cat = qconcat(parts)
        s8_group_record(self, cat)
        return ConvBN(self.c2, (1, 1), name="cv4")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class ADown(nn.Module):
    """Attentional downsample: avg-pool + strided conv on one half,
    max-pool + 1x1 on the other."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import (
            QTensor, qconcat, s8_group_record, s8_group_scale,
        )

        half = self.features // 2
        if isinstance(x, QTensor):
            # the avg-pool entry is outside the int8 policy (averaging
            # does not preserve the s8 grid): take the bf16 view
            x = x.dequant()
        # torch F.avg_pool2d(x, 2, 1, 0): unpadded, map shrinks to
        # (H-1, W-1); the stride-2 conv/maxpool below (torch p=1) restore
        # H/2 for even H.  Zero-padding here would average in fake border
        # zeros and diverge from checkpoint training semantics.
        x = nn.avg_pool(x, (2, 2), strides=(1, 1))
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        # the output concat is an s8 group: both convs emit at one scale
        # (the caller's group scale when this ADown feeds a PAN concat,
        # else a block-local group when the consumer chains s8)
        gscale = emit_scale
        if gscale is None and emit_q:
            gscale = s8_group_scale(self)
        x1 = ConvBN(half, (3, 3), strides=(2, 2), name="cv1")(
            x1, train, emit_scale=gscale
        )
        x2 = max_pool(x2, 3, 2, pad=1)
        x2 = ConvBN(half, (1, 1), name="cv2")(x2, train, emit_scale=gscale)
        cat = qconcat([x1, x2])
        if emit_q and emit_scale is None:
            # external groups are recorded by their owner (the outer
            # concat's absmax covers this one — its members are a subset)
            s8_group_record(self, cat)
        return cat


class SPPELAN(nn.Module):
    """SPP-ELAN: 1x1 in, 3 cascaded 5x5 maxpools, concat, 1x1 out."""

    c2: int
    c3: int

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        # s8 concat group (same shape as yolo.SPPF): the pools commute
        # with the positive dequant scale, one cv1 emission covers all
        # four members
        gscale = s8_group_scale(self)
        y = ConvBN(self.c3, (1, 1), name="cv1")(x, train, emit_scale=gscale)
        p1 = max_pool(y, 5, 1, pad=2)
        p2 = max_pool(p1, 5, 1, pad=2)
        p3 = max_pool(p2, 5, 1, pad=2)
        cat = qconcat([y, p1, p2, p3])
        s8_group_record(self, cat)
        return ConvBN(self.c2, (1, 1), name="cv5")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


@dataclass(frozen=True)
class GelanConfig:
    """Channel plan per GELAN scale (c2, c3, c4, n per ELAN stage)."""

    stem: Sequence[int]  # conv0, conv1 widths
    stages: Sequence[Tuple[int, int, int, int]]  # backbone ELANs 2/4/6/8
    downs: Sequence[int]  # ADown widths 3/5/7
    sppelan: Tuple[int, int]
    neck: Sequence[Tuple[int, int, int, int]]  # fpn4, fpn3, pan4, pan5
    neck_downs: Sequence[int]  # ADown 16/19


GELAN_CONFIGS = {
    # gelan-c / yolov9c
    "c": GelanConfig(
        stem=(64, 128),
        stages=(
            (256, 128, 64, 1),
            (512, 256, 128, 1),
            (512, 512, 256, 1),
            (512, 512, 256, 1),
        ),
        downs=(256, 512, 512),
        sppelan=(512, 256),
        neck=(
            (512, 512, 256, 1),
            (256, 256, 128, 1),
            (512, 512, 256, 1),
            (512, 512, 256, 1),
        ),
        neck_downs=(256, 512),
    ),
}


class YoloV9(nn.Module):
    """GELAN trunk + v8-contract DFL head: output (B, 4+nc, N)."""

    spec: YoloSpec
    variant: str = "c"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import (
            qconcat, resize_nearest_2x, s8_group_record, s8_group_scale,
        )

        cfg = GELAN_CONFIGS[self.variant]
        # NECK s8 concat groups: the same two unified groups as v8's
        # PAN (yolo.YoloBackboneNeck) — p5 feeds both the fpn4 and pan5
        # concats, t1 feeds both fpn3 and pan4, and TRT's scale
        # propagation merges the scales of concats sharing a producer.
        # Group A = {fpn4, pan5} (members p5, p4, pan5_down out);
        # group B = {fpn3, pan4} (members t1, p3, pan3 out).  The ADown
        # neck downsamples emit their internal concat members directly
        # at the group scale, so their output concat IS the group's s8.
        ga = s8_group_scale(self, "neck_a_xmax")
        gb = s8_group_scale(self, "neck_b_xmax")

        h = ConvBN(cfg.stem[0], (3, 3), strides=(2, 2), name="stem")(x, train)
        # deploy-ish s8 chain through the backbone: conv→conv and
        # conv→ELAN-entry edges stay 1-byte; the ADown entries are
        # avg-pool-first (outside the int8 policy) so stage exits
        # feeding them emit at the NECK group scale where they are also
        # concat members (p3/p4), else stay bf16
        h = ConvBN(cfg.stem[1], (3, 3), strides=(2, 2), name="down1")(
            h, train, emit_q=True
        )
        h = RepNCSPELAN4(*cfg.stages[0], name="stage1")(h, train)
        h = ADown(cfg.downs[0], name="down2")(h, train, emit_q=True)
        p3 = RepNCSPELAN4(*cfg.stages[1], name="stage2")(
            h, train, emit_scale=gb
        )
        h = ADown(cfg.downs[1], name="down3")(p3, train, emit_q=True)
        p4 = RepNCSPELAN4(*cfg.stages[2], name="stage3")(
            h, train, emit_scale=ga
        )
        h = ADown(cfg.downs[2], name="down4")(p4, train, emit_q=True)
        h = RepNCSPELAN4(*cfg.stages[3], name="stage4")(h, train, emit_q=True)
        p5 = SPPELAN(*cfg.sppelan, name="sppelan")(h, train, emit_scale=ga)

        # nearest 2x upsample rides the s8 bytes (layers.resize_nearest_2x)
        rec_a: list = []
        rec_b: list = []
        y = qconcat([resize_nearest_2x(p5), p4])
        rec_a.append(y)
        t1 = RepNCSPELAN4(*cfg.neck[0], name="fpn4")(y, train, emit_scale=gb)
        y = qconcat([resize_nearest_2x(t1), p3])
        rec_b.append(y)
        # neck exits emit s8 for the head's dense 3x3 entry convs
        n3 = RepNCSPELAN4(*cfg.neck[1], name="fpn3")(y, train, emit_q=True)
        y = ADown(cfg.neck_downs[0], name="pan3")(n3, train, emit_scale=gb)
        y = qconcat([y, t1])
        rec_b.append(y)
        n4 = RepNCSPELAN4(*cfg.neck[2], name="pan4")(y, train, emit_q=True)
        y = ADown(cfg.neck_downs[1], name="pan5_down")(
            n4, train, emit_scale=ga
        )
        y = qconcat([y, p5])
        rec_a.append(y)
        n5 = RepNCSPELAN4(*cfg.neck[3], name="pan5")(y, train, emit_q=True)
        s8_group_record(self, rec_a, name="neck_a_xmax")
        s8_group_record(self, rec_b, name="neck_b_xmax")

        xywh, cls = DetectHeadV8(self.spec, name="head")(
            (n3, n4, n5), train
        )
        return jnp.concatenate([xywh, cls], axis=-1).transpose(0, 2, 1)
