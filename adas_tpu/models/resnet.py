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


def _conv_bn(x, features, kernel, strides=(1, 1), padding=((0, 0), (0, 0)),
             conv_name=None, bn_name=None, act=None, dtype=jnp.float32,
             train: bool = False, emit_q: bool = False):
    """Conv (torchvision layout: bias-free ``{conv_name}/kernel`` +
    separate ``{bn_name}`` BatchNorm) with optional activation.

    Under ``quantized("int8")`` (inference) the pair lowers to ONE
    Int8Conv with the BatchNorm affine FOLDED into its dequant epilogue
    (layers.BNFoldParams keeps the identical variable layout) — the
    TRT-grade Conv+BN fusion, extended to the torchvision-layout trunk.
    ``emit_q``: s8-chain the output to a single conv consumer
    (layers._S8_CHAIN).
    """
    if (
        _layers._QUANT_MODE in _layers.INT8_MODES
        and not train
        and _layers.int8_conv_eligible(1, x.shape[-1])
    ):
        fold = _layers.BNFoldParams(epsilon=1e-5, name=bn_name)(features)
        return _layers.Int8Conv(
            features, kernel, strides=strides, padding=padding,
            name=conv_name,
        )(x, fold=fold, act=act, emit_q=emit_q)
    if isinstance(x, _layers.QTensor):
        x = x.dequant()
    y = nn.Conv(
        features, kernel, strides=strides, padding=padding,
        use_bias=False, dtype=dtype, name=conv_name,
    )(x)
    y = nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=bn_name,
    )(y)
    if act is not None:
        y = act(y)
    return y


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

    Under ``quantized("int8")`` the stem serves in bf16 (via the same
    polyphase): C_in=3 is lane-padding-bound on the MXU, so int8 buys
    nothing while its quantize passes cost — the per-layer precision
    call TRT's tactic selection makes (layers.int8_conv_eligible).
    """

    features: int = 64
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.preprocess import S2DInput

        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c, self.features),
        )
        h, w = x.shape[1], x.shape[2]
        dtype = self.dtype
        if _layers._QUANT_MODE in _layers.INT8_MODES:
            dtype = jnp.bfloat16
        kernel = kernel.astype(dtype)
        if isinstance(x, S2DInput):
            x = S2DInput(x.data.astype(dtype), x.shape)
        else:
            x = x.astype(dtype)
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
        # conv1 -> conv2 is a single-consumer edge: s8-chain it
        # (layers._S8_CHAIN) so the bf16 intermediate never lands in HBM
        y = _conv_bn(
            x, self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), conv_name="conv1", bn_name="bn1",
            act=nn.relu, dtype=self.dtype, train=train, emit_q=True,
        )
        y = _conv_bn(
            y, self.features, (3, 3), padding=((1, 1), (1, 1)),
            conv_name="conv2", bn_name="bn2", dtype=self.dtype, train=train,
        )
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = _conv_bn(
                x, self.features, (1, 1),
                strides=(self.strides, self.strides),
                conv_name="downsample_conv", bn_name="downsample_bn",
                dtype=self.dtype, train=train,
            )
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = self.features * 4
        identity = x
        # conv1 -> conv2 -> conv3 are single-consumer edges: s8-chain
        y = _conv_bn(
            x, self.features, (1, 1), conv_name="conv1", bn_name="bn1",
            act=nn.relu, dtype=self.dtype, train=train, emit_q=True,
        )
        y = _conv_bn(
            y, self.features, (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), conv_name="conv2", bn_name="bn2",
            act=nn.relu, dtype=self.dtype, train=train, emit_q=True,
        )
        y = _conv_bn(
            y, out_features, (1, 1), conv_name="conv3", bn_name="bn3",
            dtype=self.dtype, train=train,
        )
        if self.strides != 1 or x.shape[-1] != out_features:
            identity = _conv_bn(
                x, out_features, (1, 1),
                strides=(self.strides, self.strides),
                conv_name="downsample_conv", bn_name="downsample_bn",
                dtype=self.dtype, train=train,
            )
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
        from ..ops.preprocess import S2DPlanes

        block, stages = _CONFIGS[self.depth]
        if isinstance(x, S2DPlanes) and not train:
            # Pallas fused stem (ops/pallas_stem.py): conv7x7/2 + folded
            # bn1 + relu + maxpool3x3/2 in ONE kernel on the planar
            # polyphase input the resize dots emit — the full-resolution
            # stem activation (131 MB bf16 for CULane x8) never touches
            # HBM.  Same parameter tree: conv1/kernel + bn1/{...}.
            pdtype = (
                jnp.bfloat16
                if _layers._QUANT_MODE in _layers.INT8_MODES
                else self.dtype
            )
            x = _layers.consume_planes_stem(
                x, 64, (7, 7), conv_name="conv1", bn_name="bn1",
                act="relu", pool=True, dtype=pdtype,
            )
        else:
            # under int8 the net's declared dtype stays f32 (convs lower
            # to Int8Conv at trace time), but this stem BN is the one
            # UNfolded normalization left — running it f32 forced the
            # 160x800x64 stem/pool/residual chain to f32 (2x the
            # policy's bf16 HBM bytes; measured ~0.9 ms/8-frame step).
            # bf16 matches the precision every ConvBN serves under int8.
            bn_dtype = (
                jnp.bfloat16
                if _layers._QUANT_MODE in _layers.INT8_MODES
                else self.dtype
            )
            x = StemConv(64, dtype=self.dtype, name="conv1")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=bn_dtype, name="bn1",
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
