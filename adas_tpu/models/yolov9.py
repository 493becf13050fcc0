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
        hidden = int(self.features * self.expansion)
        y = RepConvN(hidden, name="cv1")(x, train)
        y = ConvBN(self.features, (3, 3), name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class RepNCSP(nn.Module):
    """CSP block over RepNBottlenecks (the C3 shape with Rep convs)."""

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        a = ConvBN(hidden, (1, 1), name="cv1")(x, train)
        for i in range(self.n):
            a = RepNBottleneck(
                hidden, self.shortcut, expansion=1.0, name=f"m{i}"
            )(a, train)
        b = ConvBN(hidden, (1, 1), name="cv2")(x, train)
        return ConvBN(self.features, (1, 1), name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class RepNCSPELAN4(nn.Module):
    """GELAN aggregation block: split + two RepNCSP->Conv branches,
    concat everything."""

    c2: int  # output channels
    c3: int  # first 1x1 width (split in half)
    c4: int  # branch width
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.c3 // 2
        y = ConvBN(self.c3, (1, 1), name="cv1")(x, train)
        parts = [y[..., :half], y[..., half:]]
        h = RepNCSP(self.c4, self.n, name="cv2_csp")(parts[-1], train)
        h = ConvBN(self.c4, (3, 3), name="cv2_conv")(h, train)
        parts.append(h)
        h = RepNCSP(self.c4, self.n, name="cv3_csp")(parts[-1], train)
        h = ConvBN(self.c4, (3, 3), name="cv3_conv")(h, train)
        parts.append(h)
        return ConvBN(self.c2, (1, 1), name="cv4")(
            jnp.concatenate(parts, axis=-1), train
        )


class ADown(nn.Module):
    """Attentional downsample: avg-pool + strided conv on one half,
    max-pool + 1x1 on the other."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        # torch F.avg_pool2d(x, 2, 1, 0): unpadded, map shrinks to
        # (H-1, W-1); the stride-2 conv/maxpool below (torch p=1) restore
        # H/2 for even H.  Zero-padding here would average in fake border
        # zeros and diverge from checkpoint training semantics.
        x = nn.avg_pool(x, (2, 2), strides=(1, 1))
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        x1 = ConvBN(half, (3, 3), strides=(2, 2), name="cv1")(x1, train)
        x2 = max_pool(x2, 3, 2, pad=1)
        x2 = ConvBN(half, (1, 1), name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """SPP-ELAN: 1x1 in, 3 cascaded 5x5 maxpools, concat, 1x1 out."""

    c2: int
    c3: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c3, (1, 1), name="cv1")(x, train)
        p1 = max_pool(y, 5, 1, pad=2)
        p2 = max_pool(p1, 5, 1, pad=2)
        p3 = max_pool(p2, 5, 1, pad=2)
        return ConvBN(self.c2, (1, 1), name="cv5")(
            jnp.concatenate([y, p1, p2, p3], axis=-1), train
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
        cfg = GELAN_CONFIGS[self.variant]
        h = ConvBN(cfg.stem[0], (3, 3), strides=(2, 2), name="stem")(x, train)
        h = ConvBN(cfg.stem[1], (3, 3), strides=(2, 2), name="down1")(h, train)
        h = RepNCSPELAN4(*cfg.stages[0], name="stage1")(h, train)
        h = ADown(cfg.downs[0], name="down2")(h, train)
        p3 = RepNCSPELAN4(*cfg.stages[1], name="stage2")(h, train)
        h = ADown(cfg.downs[1], name="down3")(p3, train)
        p4 = RepNCSPELAN4(*cfg.stages[2], name="stage3")(h, train)
        h = ADown(cfg.downs[2], name="down4")(p4, train)
        h = RepNCSPELAN4(*cfg.stages[3], name="stage4")(h, train)
        p5 = SPPELAN(*cfg.sppelan, name="sppelan")(h, train)

        def up2(t):
            b, hh, ww, c = t.shape
            t = jnp.broadcast_to(
                t[:, :, None, :, None, :], (b, hh, 2, ww, 2, c)
            )
            return t.reshape(b, hh * 2, ww * 2, c)

        y = jnp.concatenate([up2(p5), p4], axis=-1)
        t1 = RepNCSPELAN4(*cfg.neck[0], name="fpn4")(y, train)
        y = jnp.concatenate([up2(t1), p3], axis=-1)
        n3 = RepNCSPELAN4(*cfg.neck[1], name="fpn3")(y, train)
        y = ADown(cfg.neck_downs[0], name="pan3")(n3, train)
        n4 = RepNCSPELAN4(*cfg.neck[2], name="pan4")(
            jnp.concatenate([y, t1], axis=-1), train
        )
        y = ADown(cfg.neck_downs[1], name="pan5_down")(n4, train)
        n5 = RepNCSPELAN4(*cfg.neck[3], name="pan5")(
            jnp.concatenate([y, p5], axis=-1), train
        )

        xywh, cls = DetectHeadV8(self.spec, name="head")(
            (n3, n4, n5), train
        )
        return jnp.concatenate([xywh, cls], axis=-1).transpose(0, 2, 1)
