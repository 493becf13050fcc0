"""EfficientDet (D0–D7) in flax: EfficientNet trunk + BiFPN + anchor heads.

The reference runs EfficientDet only through a pre-exported ONNX model
whose graph already contains decode+NMS and returns an already-NMSed
(boxes, ids, confs) triple (ObjectDetector/efficientdetDetector.py:67-83).
Those exports come from the zylo117 Yet-Another-EfficientDet-Pytorch
weights, so this native graph mirrors that implementation *exactly* —
TF-style SAME padding everywhere (stride-2 convs/pools pad bottom/right),
a first BiFPN layer with its own channel-reduction laterals (including
the separate ``*_down_channel_2`` skip laterals), fast-attention fusion
weights, separable convs with always-biased pointwise stage, and heads
with shared convs but per-level BatchNorm lists — so released
checkpoints ingest 1:1 (tools/efficientdet_import.py).

NHWC everywhere; anchors are static per input size (computed at trace
time); decode + fixed-shape NMS run in the same jitted step as the net.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import layers as _layers

# (width_mult, depth_mult, input_size, fpn_channels, fpn_layers, head_layers)
# — the zylo117 compound table (reference consumes their exports,
# efficientdetDetector.py:38): backbones B0..B6 (d7 reuses B6) with
# fpn_num_filters / fpn_cell_repeats / box_class_repeats rows d0..d7
_D_CONFIGS = {
    0: (1.0, 1.0, 512, 64, 3, 3),
    1: (1.0, 1.1, 640, 88, 4, 3),
    2: (1.1, 1.2, 768, 112, 5, 3),
    3: (1.2, 1.4, 896, 160, 6, 4),
    4: (1.4, 1.8, 1024, 224, 7, 4),
    5: (1.6, 2.2, 1280, 288, 7, 4),
    6: (1.8, 2.6, 1280, 384, 8, 5),
    7: (1.8, 2.6, 1536, 384, 8, 5),
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




def _same_pads(x_shape, kernel, strides):
    """TF-SAME padding as explicit (lo, hi) pairs for the two spatial
    dims of an NHWC input (what lax "SAME" computes internally)."""
    pads = []
    for size, k, st in zip(x_shape[1:3], kernel, strides):
        out = -(-size // st)
        total = max((out - 1) * st + k - size, 0)
        pads.append((total // 2, total - total // 2))
    return pads


def _conv_same(x, features, kernel, strides=(1, 1), groups=1,
               use_bias=False, dtype=jnp.float32, name=None,
               quantize=True):
    """SAME-padded conv that becomes a W8A8 Int8Conv (identical
    ``{name}/kernel[/bias]`` tree) under ``quantized("int8")`` — the
    EfficientDet analogue of models/resnet._conv_bn.  ``quantize=False``
    pins final predictors to f32.  Depthwise convs (groups==C) and the
    tiny-C_in stem are int8-ineligible (layers.int8_conv_eligible —
    VPU/padding-bound, int8 buys nothing) and serve bf16 instead."""
    int8_mode = quantize and _layers._QUANT_MODE in _layers.INT8_MODES
    if int8_mode and _layers.int8_conv_eligible(groups, x.shape[-1]):
        return _layers.Int8Conv(
            features, kernel, strides=strides,
            padding=_same_pads(x.shape, kernel, strides),
            feature_group_count=groups, use_bias=use_bias, name=name,
        )(x)
    if int8_mode:
        dtype = jnp.bfloat16
    return nn.Conv(
        features, kernel, strides=strides, padding="SAME",
        feature_group_count=groups, use_bias=use_bias, dtype=dtype,
        name=name,
    )(x)


def _conv_bn_act(x, features, kernel, strides=(1, 1), groups=1,
                 use_bias=False, conv_name=None, bn_name=None, act=None,
                 dtype=jnp.float32, train=False):
    """Conv + BatchNorm(eps 1e-3) + activation; under ``quantized("int8")``
    (inference, int8-eligible layer) the BN affine FOLDS into the
    Int8Conv's dequant epilogue via layers.BNFoldParams — identical
    variable layout, one fused elementwise pass instead of three."""
    if (
        _layers._QUANT_MODE in _layers.INT8_MODES
        and not train
        and _layers.int8_conv_eligible(groups, x.shape[-1])
    ):
        fold = _layers.BNFoldParams(epsilon=1e-3, name=bn_name)(features)
        return _layers.Int8Conv(
            features, kernel, strides=strides,
            padding=_same_pads(x.shape, kernel, strides),
            feature_group_count=groups, use_bias=use_bias, name=conv_name,
        )(x, fold=fold, act=act)
    if _layers._QUANT_MODE in _layers.INT8_MODES:
        dtype = jnp.bfloat16
    h = _conv_same(
        x, features, kernel, strides=strides, groups=groups,
        use_bias=use_bias, dtype=dtype, name=conv_name,
    )
    h = _bn(train, bn_name, dtype)(h)
    if act is not None:
        h = act(h)
    return h


def _round_channels(c: float, width: float, divisor: int = 8) -> int:
    c *= width
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(r * depth))


def mbconv_plan(width: float, depth: float) -> List[tuple]:
    """Flat (expand, kernel, stride, channels) list — the lukemelas /
    zylo117 ``_blocks.{i}`` indexing the checkpoints use."""
    plan = []
    for expand, k, s, c, r in _MBCONV_STAGES:
        c = _round_channels(c, width)
        for bi in range(_round_repeats(r, depth)):
            plan.append((expand, k, s if bi == 0 else 1, c))
    return plan


def _bn(train: bool, name: str, dtype=jnp.float32):
    # torch momentum 0.01 == flax momentum 0.99; eps 1e-3 (lukemelas)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1e-3,
        dtype=dtype, name=name,
    )


def _same_pool(x, window: int = 3, stride: int = 2):
    """TF-SAME max pool (zylo117 MaxPool2dStaticSamePadding).

    zylo117 implements this as ``ZeroPad2d`` + MaxPool2d — i.e. the
    padding competes as literal ZEROS, not -inf, so negative border
    activations are clipped up to 0 in the padded ring.  Quirk preserved
    for checkpoint faithfulness (caught by the TorchEfficientDet oracle;
    lax max_pool's padding would use -inf instead)."""
    h, w = x.shape[-3], x.shape[-2]

    def pad_for(size):
        out = -(-size // stride)
        total = max((out - 1) * stride + window - size, 0)
        return (total // 2, total - total // 2)

    x = jnp.pad(
        x, ((0, 0), pad_for(h), pad_for(w), (0, 0)), constant_values=0.0
    )
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class MBConv(nn.Module):
    """lukemelas MBConvBlock (zylo117 backbone unit): SAME padding,
    swish, SE, drop-connect omitted at inference."""

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
            h = _conv_bn_act(
                h, inp * self.expand, (1, 1), conv_name="expand_conv",
                bn_name="bn0", act=nn.silu, dtype=self.dtype, train=train,
            )
        h = _conv_bn_act(
            h, h.shape[-1], (self.kernel, self.kernel),
            strides=(self.stride, self.stride), groups=h.shape[-1],
            conv_name="dw_conv", bn_name="bn1", act=nn.silu,
            dtype=self.dtype, train=train,
        )
        # squeeze-excite (reduce/expand 1x1 convs with bias)
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            max(1, int(inp * self.se_ratio)), (1, 1), dtype=self.dtype,
            name="se_reduce",
        )(s)
        s = nn.silu(s)
        s = nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype, name="se_expand")(
            s
        )
        h = h * nn.sigmoid(s)
        h = _conv_bn_act(
            h, self.features, (1, 1), conv_name="project_conv",
            bn_name="bn2", dtype=self.dtype, train=train,
        )
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class EfficientNetFeatures(nn.Module):
    """EfficientNet trunk returning (C3, C4, C5) at strides 8/16/32.
    Blocks are named flat (``block{i}``) to mirror checkpoint indexing."""

    width: float = 1.0
    depth: float = 1.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv_bn_act(
            x, _round_channels(32, self.width), (3, 3), strides=(2, 2),
            conv_name="stem_conv", bn_name="stem_bn", act=nn.silu,
            dtype=self.dtype, train=train,
        )

        plan = mbconv_plan(self.width, self.depth)
        feats = []
        for i, (expand, k, s, c) in enumerate(plan):
            # a feature map is tapped just before each stride-2 block at
            # strides 16/32 and at the very end — i.e. C3, C4, C5
            if s == 2 and h.shape[-3] * 2 <= x.shape[-3] // 4:
                feats.append(h)
            h = MBConv(
                c, expand, k, s, dtype=self.dtype, name=f"block{i}"
            )(h, train=train)
        feats.append(h)
        return tuple(feats[-3:])


class SeparableConvBlock(nn.Module):
    """zylo117 SeparableConvBlock: dw 3×3 (no bias, SAME) + pw 1×1
    (ALWAYS biased — the checkpoints carry the bias even under BN) + BN."""

    features: int
    use_bn: bool = True
    #: False pins this block to f32 under quantized("int8") — used for
    #: the final box/class "header" projections
    quantize: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv_same(
            x, x.shape[-1], (3, 3), groups=x.shape[-1],
            dtype=self.dtype, name="dw", quantize=self.quantize,
        )
        if self.use_bn and self.quantize and not train:
            # pw conv + BN folds into one int8 epilogue when eligible
            return _conv_bn_act(
                h, self.features, (1, 1), use_bias=True,
                conv_name="pw", bn_name="bn", dtype=self.dtype,
                train=train,
            )
        h = _conv_same(
            h, self.features, (1, 1), use_bias=True,
            dtype=self.dtype, name="pw", quantize=self.quantize,
        )
        if self.use_bn:
            h = _bn(train, "bn", self.dtype)(h)
        return h


class _DownChannel(nn.Module):
    """1×1 conv + BN lateral (zylo117 ``*_down_channel`` Sequential)."""

    features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _conv_bn_act(
            x, self.features, (1, 1), use_bias=True, conv_name="conv",
            bn_name="bn", dtype=self.dtype, train=train,
        )


class BiFPNLayer(nn.Module):
    """One zylo117 BiFPN layer.  ``first_time`` layers own the channel
    reduction laterals (including the separate `_2` skip laterals for the
    bottom-up fusion) and build P6/P7 from C5."""

    channels: int
    first_time: bool = False
    #: fast-attention weighted fusion; zylo117 disables it for d6/d7
    #: (``use_attention = compound < 6``) in favor of a plain sum
    attention: bool = True
    dtype: object = jnp.float32

    @staticmethod
    def _up(x):
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return x.reshape(b, h * 2, w * 2, c)

    def _fuse(self, name, inputs):
        if not self.attention:
            return nn.silu(sum(inputs))
        w = self.param(
            name, nn.initializers.ones, (len(inputs),), jnp.float32
        )
        w = nn.relu(w)
        w = w / (jnp.sum(w) + 1e-4)
        return nn.silu(sum(wi * xi for wi, xi in zip(w, inputs)))

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ch = self.channels
        if self.first_time:
            c3, c4, c5 = feats
            p3_in = _DownChannel(ch, self.dtype, name="p3_down_channel")(
                c3, train
            )
            p4_in = _DownChannel(ch, self.dtype, name="p4_down_channel")(
                c4, train
            )
            p5_in = _DownChannel(ch, self.dtype, name="p5_down_channel")(
                c5, train
            )
            p6_in = _same_pool(
                _DownChannel(ch, self.dtype, name="p5_to_p6")(c5, train)
            )
            p7_in = _same_pool(p6_in)
            # separate laterals for the bottom-up skip connections
            p4_in_2 = _DownChannel(
                ch, self.dtype, name="p4_down_channel_2"
            )(c4, train)
            p5_in_2 = _DownChannel(
                ch, self.dtype, name="p5_down_channel_2"
            )(c5, train)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = feats
            p4_in_2, p5_in_2 = p4_in, p5_in

        sep = lambda name: SeparableConvBlock(  # noqa: E731
            ch, dtype=self.dtype, name=name
        )
        # top-down
        p6_td = sep("conv6_up")(
            self._fuse("p6_w1", [p6_in, self._up(p7_in)]), train
        )
        p5_td = sep("conv5_up")(
            self._fuse("p5_w1", [p5_in, self._up(p6_td)]), train
        )
        p4_td = sep("conv4_up")(
            self._fuse("p4_w1", [p4_in, self._up(p5_td)]), train
        )
        p3_out = sep("conv3_up")(
            self._fuse("p3_w1", [p3_in, self._up(p4_td)]), train
        )
        # bottom-up
        p4_out = sep("conv4_down")(
            self._fuse(
                "p4_w2", [p4_in_2, p4_td, _same_pool(p3_out)]
            ),
            train,
        )
        p5_out = sep("conv5_down")(
            self._fuse(
                "p5_w2", [p5_in_2, p5_td, _same_pool(p4_out)]
            ),
            train,
        )
        p6_out = sep("conv6_down")(
            self._fuse(
                "p6_w2", [p6_in, p6_td, _same_pool(p5_out)]
            ),
            train,
        )
        p7_out = sep("conv7_down")(
            self._fuse("p7_w2", [p7_in, _same_pool(p6_out)]), train
        )
        return (p3_out, p4_out, p5_out, p6_out, p7_out)


class PredictionHead(nn.Module):
    """zylo117 Regressor/Classifier: shared separable convs (no BN
    inside), per-level BatchNorm lists, biased ``header`` projection."""

    channels: int
    layers: int
    out_features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        convs = [
            SeparableConvBlock(
                self.channels, use_bn=False, dtype=self.dtype,
                name=f"conv{i}",
            )
            for i in range(self.layers)
        ]
        final = SeparableConvBlock(
            self.out_features, use_bn=False, quantize=False,
            dtype=self.dtype, name="header",
        )
        outs = []
        for li, f in enumerate(feats):
            h = f
            for ci, conv in enumerate(convs):
                h = conv(h, train=train)
                h = _bn(train, f"bn_l{li}_c{ci}", self.dtype)(h)
                h = nn.silu(h)
            outs.append(final(h, train=train))
        return outs


@dataclass(frozen=True)
class EfficientDetSpec:
    compound: int = 0
    num_classes: int = 90
    #: None -> zylo117 default (4.0; 5.0 for d7)
    anchor_scale: object = None
    #: serve at a non-default square resolution (multiple of 128 so P7
    #: stays integral); anchors rebuild to match.  The reference bakes
    #: one size into each ONNX export — this is the TRT-style reshape
    #: knob (coreEngine.py:120-157 loads whatever shape the engine was
    #: built with).  None -> the compound's paper resolution.
    input_size_override: object = None

    @property
    def config(self):
        return _D_CONFIGS[self.compound]

    @property
    def input_size(self) -> int:
        if self.input_size_override is not None:
            s = int(self.input_size_override)
            if s % 128:
                raise ValueError(
                    f"input_size_override {s} not a multiple of 128 "
                    "(P7 stride)"
                )
            return s
        return self.config[2]

    @property
    def resolved_anchor_scale(self) -> float:
        if self.anchor_scale is not None:
            return float(self.anchor_scale)
        return 5.0 if self.compound == 7 else 4.0


def build_anchors(
    input_size: int, anchor_scale: float = 4.0
) -> np.ndarray:
    """Static (N, 4) anchor boxes (y1, x1, y2, x2) over P3..P7,
    cell-major with 9 anchors interleaved per cell (zylo117 layout)."""
    scales = [2 ** 0, 2 ** (1.0 / 3), 2 ** (2.0 / 3)]
    ratios = [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]
    per_level = []
    for level in range(3, 8):
        stride = 2 ** level
        base = anchor_scale * stride
        fsize = input_size // stride
        cy, cx = np.meshgrid(
            (np.arange(fsize) + 0.5) * stride,
            (np.arange(fsize) + 0.5) * stride,
            indexing="ij",
        )
        boxes = []
        for scale in scales:
            for rw, rh in ratios:
                w = base * scale * rw / 2.0
                h = base * scale * rh / 2.0
                boxes.append(
                    np.stack(
                        [cy - h, cx - w, cy + h, cx + w], axis=-1
                    ).reshape(-1, 4)
                )
        lvl = np.stack(boxes, axis=1).reshape(-1, 4)
        per_level.append(lvl)
    return np.concatenate(per_level, axis=0)


def decode_boxes(
    regression: jnp.ndarray, anchors: jnp.ndarray
) -> jnp.ndarray:
    """(dy, dx, dh, dw) regression → xyxy boxes (zylo117 BBoxTransform)."""
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
        feats = EfficientNetFeatures(
            width, depth, dtype=self.dtype, name="backbone"
        )(x, train=train)

        for i in range(fpn_layers):
            feats = BiFPNLayer(
                fpn_ch, first_time=(i == 0),
                attention=self.spec.compound < 6, dtype=self.dtype,
                name=f"bifpn{i}",
            )(feats, train=train)

        box_outs = PredictionHead(
            fpn_ch, head_layers, 9 * 4, dtype=self.dtype, name="regressor"
        )(feats, train=train)
        cls_outs = PredictionHead(
            fpn_ch, head_layers, 9 * self.spec.num_classes,
            dtype=self.dtype, name="classifier",
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
            build_anchors(x.shape[1], self.spec.resolved_anchor_scale),
            self.dtype,
        )
        boxes = decode_boxes(box, anchors)
        return boxes, nn.sigmoid(cls)
