"""ResNet backbones (18/34/50) in flax, NHWC, multi-scale outputs.

Feature extractor for the UFLD lane detectors: returns the stride-8/16/32
feature maps (x2, x3, x4) like the reference export backbone
(TrafficLaneDetector/ufldDetector/exportLib/ultrafastLaneV2/backbone.py:49-58).
Weight names follow the torchvision layout (conv1/bn1/layer{1..4}.{i}.conv{j})
so the torch-checkpoint importer can map state dicts 1:1.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import layers as _layers
from .layers import max_pool

_NHWC = ("NHWC", "HWIO", "NHWC")


def _conv(features, kernel, strides=(1, 1), padding=((0, 0), (0, 0)),
          dtype=jnp.float32, name=None):
    """nn.Conv (bias-free) or, under ``quantized("int8")``, Int8Conv with
    the identical ``{name}/kernel`` parameter tree — the same trace-time
    switch ConvBN uses, extended to the torchvision-layout trunk."""
    if _layers._QUANT_MODE in ("int8", "int8_calib"):
        return _layers.Int8Conv(
            features, kernel, strides=strides, padding=padding, name=name
        )
    return nn.Conv(
        features, kernel, strides=strides, padding=padding,
        use_bias=False, dtype=dtype, name=name,
    )


class StemConv(nn.Module):
    """The 7x7/2 stem conv, evaluated as an exact polyphase
    (space-to-depth) 4x4/1 conv.

    XLA's lowering of a stride-2 7x7 conv with C_in=3 pads the 3 input
    channels up to the lane width, wasting ~98% of the MXU (measured
    ~3 ms for 8x320x1600 bf16 on v5e).  Rewriting over the four stride-2
    polyphases — x_s2d[(r,t,c)] = x[2m+r, 2n+t, c], kernel
    w2[a,b,(r,t,c)] = w[2a+r-1, 2b+t-1, c] (zero where out of range),
    padding (2,1) — computes the identical convolution 3x faster.  The
    parameter keeps the torchvision (7,7,C,O) layout under the same
    ``conv1/kernel`` tree path, so checkpoint ingestion is unchanged.
    """

    features: int = 64
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c, self.features),
        )
        h, w = x.shape[1], x.shape[2]
        if _layers._QUANT_MODE in ("int8", "int8_calib"):
            from .layers import int8_conv_apply

            return int8_conv_apply(
                x, kernel, (2, 2), ((3, 3), (3, 3))
            )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if h % 2 or w % 2:  # odd inputs: fall back to the direct conv
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, kernel.shape, _NHWC
                ),
            )
        from .layers import polyphase_stride2_conv

        return polyphase_stride2_conv(x, kernel)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = _conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = _conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = _conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = self.features * 4
        identity = x

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        y = _conv(self.features, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = _conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = _conv(out_features, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = _conv(
                out_features, (1, 1), strides=(self.strides, self.strides),
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(identity)
        return nn.relu(y + identity)


_CONFIGS = {
    "18": (BasicBlock, (2, 2, 2, 2)),
    "34": (BasicBlock, (3, 4, 6, 3)),
    "50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNetFeatures(nn.Module):
    """ResNet trunk emitting (stride-8, stride-16, stride-32) features."""

    depth: str = "18"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        block, stages = _CONFIGS[self.depth]
        x = StemConv(64, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, pad=1)

        feats = []
        for stage_idx, n_blocks in enumerate(stages):
            width = 64 * (2 ** stage_idx)
            for block_idx in range(n_blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                x = block(
                    features=width, strides=strides, dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train=train)
            feats.append(x)
        # x2 (stride 8), x3 (stride 16), x4 (stride 32)
        return feats[1], feats[2], feats[3]

    @staticmethod
    def stage_channels(depth: str) -> Sequence[int]:
        block, _ = _CONFIGS[depth]
        mult = 4 if block is Bottleneck else 1
        return [64 * mult, 128 * mult, 256 * mult, 512 * mult]
