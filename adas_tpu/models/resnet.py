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
    """conv3x3 -> conv3x3 + residual (torchvision layout).

    Under calibrated int8 serving, stride-1 same-width blocks at
    roofline-winnable shapes route BOTH convs + the residual add through
    ONE fused Pallas kernel (ops/pallas_block.py): the mid activation
    stays in VMEM and blocks chain through the padded-planar s8 domain,
    so a stage pays one relayout at entry/exit instead of per conv.
    The XLA path is the exact fallback (and the calibration/packing
    path); parameter and calibration trees are identical either way."""

    features: int
    strides: int = 1
    dtype: object = jnp.float32

    @staticmethod
    def fuse_eligible(hw, cin: int, features: int, strides: int) -> bool:
        """Static part of the fused-kernel predicate (shape + config) —
        ResNetFeatures uses it for the emit_planar chaining hint."""
        from ..ops.pallas_block import block_enabled, block_shape_wins

        return (
            block_enabled()
            and strides == 1
            and cin == features
            and block_shape_wins(hw[0], hw[1], cin)
        )

    @nn.compact
    def __call__(self, x, train: bool = False, emit_planar: bool = False):
        from ..ops import pallas_block as PBK

        y = self._fused(x, train, emit_planar)
        if y is not None:
            return y
        if isinstance(x, PBK.PlanarQ):
            # a planar chain reaching an unfusable block (probe failure,
            # missing scales): re-enter the NHWC domain losslessly
            x = _layers.QTensor(PBK.from_planar(x), x.scale)
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
        if isinstance(identity, _layers.QTensor):
            identity = identity.dequant()
        out = nn.relu(y + identity)
        if (
            _layers._QUANT_MODE == "int8_calib"
            and _layers._S8_CHAIN
            and self.strides == 1
            and not train
        ):
            # block-output absmax: the fused kernel's s8 output scale
            # (self-contained producer-scale chaining — the consumer
            # reads the QTensor at it, same math as its own xmax
            # quantize of the bf16 value)
            seen = self.variable(
                "act_scales", "out_ymax",
                lambda: jnp.zeros((), jnp.float32),
            )
            seen.value = jnp.maximum(
                seen.value, jnp.max(jnp.abs(out.astype(jnp.float32)))
            )
        return out

    def _fused(self, x, train: bool, emit_planar: bool):
        """The fused two-conv Pallas path; None -> caller runs XLA."""
        from ..ops import pallas_block as PBK

        if _layers._QUANT_MODE != "int8" or train:
            return None
        if isinstance(x, PBK.PlanarQ):
            hw, cin = x.hw, x.data.shape[2]
        else:
            hw, cin = (x.shape[1], x.shape[2]), x.shape[-1]
        if not self.fuse_eligible(hw, cin, self.features, self.strides):
            return None
        if not self.has_variable("act_scales", "out_ymax"):
            return None  # calibrated before this path existed
        # every fused/XLA decision must happen BEFORE the first flax
        # submodule is created: a later fallback would re-create the
        # same names in the XLA path (flax NameInUseError) — the
        # compile probe only needs shapes
        interpret = jax.default_backend() != "tpu"
        nhwc = PBK.block_layout() == "nhwc"
        if nhwc and isinstance(x, PBK.PlanarQ):
            x = _layers.QTensor(PBK.from_planar(x), x.scale)
        if not interpret:
            n = x.data.shape[0] if isinstance(x, PBK.PlanarQ) else x.shape[0]
            probe = (
                PBK.block_nhwc_compile_ok if nhwc else PBK.block_compile_ok
            )
            if not probe(
                n, hw[0], hw[1], cin, self.features, self.features,
                "relu", None, "relu", True,
            ):
                return None
        w1q, w1s, x1s, y1s = _layers.QConvParams(
            self.features, (3, 3), name="conv1"
        )(cin)
        gain1, fb1 = _layers.BNFoldParams(epsilon=1e-5, name="bn1")(
            self.features
        )
        w2q, w2s, _, _ = _layers.QConvParams(
            self.features, (3, 3), name="conv2"
        )(self.features)
        gain2, fb2 = _layers.BNFoldParams(epsilon=1e-5, name="bn2")(
            self.features
        )
        if isinstance(x, (PBK.PlanarQ, _layers.QTensor)):
            xscale = x.scale
        else:
            xscale = x1s
        if y1s is None or xscale is None:
            # out_ymax present guarantees the same calibration pass
            # recorded conv1's xmax/ymax (emit_q=True) — reaching here
            # means an inconsistent act_scales tree, and falling back
            # would re-create module names; fail loudly instead
            raise ValueError(
                "inconsistent calibration tree: out_ymax present but "
                "conv1 xmax/ymax missing (recalibrate the model)"
            )
        so = (
            jnp.maximum(self.get_variable("act_scales", "out_ymax"), 1e-12)
            / 127.0
        )
        _layers._TRACE_STATS["pallas_blocks"] += 1
        if nhwc:
            if isinstance(x, _layers.QTensor):
                xq = x.data
            else:
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / xscale), -127, 127
                ).astype(jnp.int8)
            out = PBK.fused_block_nhwc(
                xq, xscale,
                w1q, w1s * xscale * gain1, fb1, y1s,
                w2q, w2s * y1s * gain2, fb2, so,
                act1="relu", act2=None, act_post="relu", residual=True,
                interpret=interpret,
            )
            return _layers.QTensor(out, so)
        if isinstance(x, _layers.QTensor):
            xp = PBK.to_planar(x.data, x.scale)
        elif isinstance(x, PBK.PlanarQ):
            xp = x
        else:
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / xscale), -127, 127
            ).astype(jnp.int8)
            xp = PBK.to_planar(xq, xscale)
        out = PBK.fused_block(
            xp,
            w1q, w1s * xscale * gain1, fb1, y1s,
            w2q, w2s * y1s * gain2, fb2, so,
            act1="relu", act2=None, act_post="relu", residual=True,
            interpret=interpret,
        )
        if emit_planar:
            return out
        return _layers.QTensor(PBK.from_planar(out), so)


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

        from ..ops.pallas_block import PlanarQ

        feats = []
        for stage_idx, n_blocks in enumerate(stages):
            width = 64 * (2 ** stage_idx)
            for block_idx in range(n_blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                kwargs = {}
                if block is BasicBlock:
                    # chaining hint: keep the planar s8 domain between
                    # consecutive fusable blocks (ops/pallas_block.py) —
                    # a best-effort hint, every block handles either
                    # input form
                    hw = x.hw if isinstance(x, PlanarQ) else (
                        x.shape[1], x.shape[2]
                    )
                    nxt_hw = (
                        (hw[0] // strides, hw[1] // strides)
                        if strides == 2
                        else hw
                    )
                    kwargs["emit_planar"] = (
                        block_idx + 1 < n_blocks
                        and BasicBlock.fuse_eligible(
                            nxt_hw, width, width, 1
                        )
                    )
                x = block(
                    features=width, strides=strides, dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train=train, **kwargs)
            # a stage tap must be an array for the lane head; a fused
            # last block hands the next stage its s8 QTensor while the
            # tap takes the bf16 view (exactly the value the consumer's
            # own input quantize would reconstruct)
            feats.append(
                x.dequant() if isinstance(x, _layers.QTensor) else x
            )
        # x2 (stride 8), x3 (stride 16), x4 (stride 32)
        return feats[1], feats[2], feats[3]

    @staticmethod
    def stage_channels(depth: str) -> Sequence[int]:
        block, _ = _CONFIGS[depth]
        mult = 4 if block is Bottleneck else 1
        return [64 * mult, 128 * mult, 256 * mult, 512 * mult]
