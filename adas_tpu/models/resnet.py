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
import jax.numpy as jnp

from .layers import max_pool


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
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

        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = nn.Conv(
                out_features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
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
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
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
