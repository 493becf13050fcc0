"""EfficientDet (D0–D2) in flax: EfficientNet trunk + BiFPN + anchor heads.

The reference runs EfficientDet only through a pre-exported ONNX model
whose graph already contains decode+NMS and returns an already-NMSed
(boxes, ids, confs) triple (ObjectDetector/efficientdetDetector.py:67-83).
Here the network is native: EfficientNet-B{0..2} MBConv trunk, fast-
normalized-fusion BiFPN, class/box heads with per-level BatchNorm —
architecture per the public EfficientDet paper/implementation — and decode
+ fixed-shape NMS run on device in the same jitted step (ops/nms.py), so
the engine artifact is one XLA graph like the YOLO path.

NHWC everywhere; anchors are static per input size (computed at trace
time).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (width_mult, depth_mult, input_size, fpn_channels, fpn_layers, head_layers)
_D_CONFIGS = {
    0: (1.0, 1.0, 512, 64, 3, 3),
    1: (1.0, 1.1, 640, 88, 4, 3),
    2: (1.1, 1.2, 768, 112, 5, 3),
}

# EfficientNet-B0 stage table: expand, kernel, stride, channels, repeats
_MBCONV_STAGES = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]


def _round_channels(c: float, width: float, divisor: int = 8) -> int:
    c *= width
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(r * depth))


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(
                inp * self.expand, (1, 1), use_bias=False,
                dtype=self.dtype, name="expand_conv",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name="expand_bn",
            )(h)
            h = nn.silu(h)
        p = self.kernel // 2
        h = nn.Conv(
            h.shape[-1], (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=h.shape[-1],
            use_bias=False, dtype=self.dtype, name="dw_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="dw_bn",
        )(h)
        h = nn.silu(h)
        h = SqueezeExcite(
            max(1, int(inp * self.se_ratio)), dtype=self.dtype, name="se"
        )(h)
        h = nn.Conv(
            self.features, (1, 1), use_bias=False,
            dtype=self.dtype, name="project_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="project_bn",
        )(h)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class EfficientNetFeatures(nn.Module):
    """EfficientNet trunk returning (C3, C4, C5) at strides 8/16/32."""

    width: float = 1.0
    depth: float = 1.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            _round_channels(32, self.width), (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="stem_bn",
        )(h)
        h = nn.silu(h)

        feats = []
        for si, (expand, k, s, c, r) in enumerate(_MBCONV_STAGES):
            c = _round_channels(c, self.width)
            r = _round_repeats(r, self.depth)
            for bi in range(r):
                h = MBConv(
                    c, expand, k, s if bi == 0 else 1,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(h, train=train)
            if si in (2, 4, 6):  # strides 8, 16, 32
                feats.append(h)
        return tuple(feats)


class SeparableConvBN(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (+BN); the BiFPN/head conv cell."""

    features: int
    use_bn: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            x.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=x.shape[-1], use_bias=False,
            dtype=self.dtype, name="dw",
        )(x)
        h = nn.Conv(
            self.features, (1, 1), use_bias=not self.use_bn,
            dtype=self.dtype, name="pw",
        )(h)
        if self.use_bn:
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name="bn",
            )(h)
        return h


def _fuse(name_scope, inputs: List[jnp.ndarray], module) -> jnp.ndarray:
    """Fast normalized fusion: softmax-free positive weighted sum."""
    w = module.param(
        name_scope, nn.initializers.ones, (len(inputs),), jnp.float32
    )
    w = nn.relu(w)
    w = w / (jnp.sum(w) + 1e-4)
    return sum(wi * xi for wi, xi in zip(w, inputs))


class BiFPNLayer(nn.Module):
    channels: int
    dtype: object = jnp.float32

    def _down(self, x):
        return nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

    @staticmethod
    def _up(x):
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return x.reshape(b, h * 2, w * 2, c)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        p3, p4, p5, p6, p7 = feats

        # top-down pathway
        p6_td = SeparableConvBN(self.channels, dtype=self.dtype, name="td6")(
            nn.silu(_fuse("w_td6", [p6, self._up(p7)], self)), train=train
        )
        p5_td = SeparableConvBN(self.channels, dtype=self.dtype, name="td5")(
            nn.silu(_fuse("w_td5", [p5, self._up(p6_td)], self)), train=train
        )
        p4_td = SeparableConvBN(self.channels, dtype=self.dtype, name="td4")(
            nn.silu(_fuse("w_td4", [p4, self._up(p5_td)], self)), train=train
        )
        p3_out = SeparableConvBN(self.channels, dtype=self.dtype, name="out3")(
            nn.silu(_fuse("w_out3", [p3, self._up(p4_td)], self)), train=train
        )
        # bottom-up pathway
        p4_out = SeparableConvBN(self.channels, dtype=self.dtype, name="out4")(
            nn.silu(
                _fuse("w_out4", [p4, p4_td, self._down(p3_out)], self)
            ),
            train=train,
        )
        p5_out = SeparableConvBN(self.channels, dtype=self.dtype, name="out5")(
            nn.silu(
                _fuse("w_out5", [p5, p5_td, self._down(p4_out)], self)
            ),
            train=train,
        )
        p6_out = SeparableConvBN(self.channels, dtype=self.dtype, name="out6")(
            nn.silu(
                _fuse("w_out6", [p6, p6_td, self._down(p5_out)], self)
            ),
            train=train,
        )
        p7_out = SeparableConvBN(self.channels, dtype=self.dtype, name="out7")(
            nn.silu(_fuse("w_out7", [p7, self._down(p6_out)], self)),
            train=train,
        )
        return (p3_out, p4_out, p5_out, p6_out, p7_out)


class PredictionHead(nn.Module):
    """Shared sepconvs with per-level BatchNorm, final projection."""

    channels: int
    layers: int
    out_features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        convs = [
            SeparableConvBN(
                self.channels, use_bn=False, dtype=self.dtype,
                name=f"conv{i}",
            )
            for i in range(self.layers)
        ]
        final = SeparableConvBN(
            self.out_features, use_bn=False, dtype=self.dtype, name="final"
        )
        outs = []
        for li, f in enumerate(feats):
            h = f
            for ci, conv in enumerate(convs):
                h = conv(h, train=train)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99,
                    epsilon=1e-3, dtype=self.dtype, name=f"bn_l{li}_c{ci}",
                )(h)
                h = nn.silu(h)
            outs.append(final(h, train=train))
        return outs


@dataclass(frozen=True)
class EfficientDetSpec:
    compound: int = 0
    num_classes: int = 90
    anchor_scale: float = 4.0

    @property
    def config(self):
        return _D_CONFIGS[self.compound]

    @property
    def input_size(self) -> int:
        return self.config[2]


def build_anchors(
    input_size: int, anchor_scale: float = 4.0
) -> np.ndarray:
    """Static (N, 4) anchor boxes (y1, x1, y2, x2) over P3..P7."""
    scales = [2 ** 0, 2 ** (1.0 / 3), 2 ** (2.0 / 3)]
    ratios = [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]
    all_boxes = []
    for level in range(3, 8):
        stride = 2 ** level
        base = anchor_scale * stride
        fsize = input_size // stride
        cy, cx = np.meshgrid(
            (np.arange(fsize) + 0.5) * stride,
            (np.arange(fsize) + 0.5) * stride,
            indexing="ij",
        )
        for scale in scales:
            for rw, rh in ratios:
                w = base * scale * rw / 2.0
                h = base * scale * rh / 2.0
                boxes = np.stack(
                    [cy - h, cx - w, cy + h, cx + w], axis=-1
                ).reshape(-1, 4)
                all_boxes.append(boxes)
        # interleave anchors per cell (official memory layout:
        # (cell, anchor) ordering)
    per_level = []
    idx = 0
    for level in range(3, 8):
        fsize = input_size // (2 ** level)
        cells = fsize * fsize
        lvl = np.stack(all_boxes[idx : idx + 9], axis=1).reshape(-1, 4)
        assert lvl.shape[0] == cells * 9
        per_level.append(lvl)
        idx += 9
    return np.concatenate(per_level, axis=0)


def decode_boxes(
    regression: jnp.ndarray, anchors: jnp.ndarray
) -> jnp.ndarray:
    """(dy, dx, dh, dw) regression → xyxy boxes."""
    ay = (anchors[:, 0] + anchors[:, 2]) / 2
    ax = (anchors[:, 1] + anchors[:, 3]) / 2
    ah = anchors[:, 2] - anchors[:, 0]
    aw = anchors[:, 3] - anchors[:, 1]
    dy, dx, dh, dw = (
        regression[..., 0], regression[..., 1],
        regression[..., 2], regression[..., 3],
    )
    cy = dy * ah + ay
    cx = dx * aw + ax
    h = jnp.exp(dh) * ah
    w = jnp.exp(dw) * aw
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


class EfficientDet(nn.Module):
    """Full detector; returns (boxes_xyxy, class_probs) per image."""

    spec: EfficientDetSpec
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth, size, fpn_ch, fpn_layers, head_layers = self.spec.config
        c3, c4, c5 = EfficientNetFeatures(
            width, depth, dtype=self.dtype, name="backbone"
        )(x, train=train)

        def lateral(name, f):
            h = nn.Conv(fpn_ch, (1, 1), dtype=self.dtype, name=name + "_pw")(f)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=name + "_bn",
            )(h)

        p3 = lateral("lat3", c3)
        p4 = lateral("lat4", c4)
        p5 = lateral("lat5", c5)
        p6 = lateral("lat6", c5)
        p6 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = (p3, p4, p5, p6, p7)

        for i in range(fpn_layers):
            feats = BiFPNLayer(
                fpn_ch, dtype=self.dtype, name=f"bifpn{i}"
            )(feats, train=train)

        cls_outs = PredictionHead(
            fpn_ch, head_layers, 9 * self.spec.num_classes,
            dtype=self.dtype, name="class_net",
        )(feats, train=train)
        box_outs = PredictionHead(
            fpn_ch, head_layers, 9 * 4, dtype=self.dtype, name="box_net"
        )(feats, train=train)

        b = x.shape[0]
        cls = jnp.concatenate(
            [o.reshape(b, -1, self.spec.num_classes) for o in cls_outs],
            axis=1,
        )
        box = jnp.concatenate(
            [o.reshape(b, -1, 4) for o in box_outs], axis=1
        )
        anchors = jnp.asarray(
            build_anchors(x.shape[1], self.spec.anchor_scale),
            self.dtype,
        )
        boxes = decode_boxes(box, anchors)
        return boxes, nn.sigmoid(cls)
