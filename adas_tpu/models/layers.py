"""Shared flax building blocks for the model zoo.

All models are NHWC (TPU-native layout); weights ingested from torch/ONNX
checkpoints are transposed accordingly by the importers in
``adas_tpu.tools``.  BatchNorm runs in inference mode by default — the
training path passes ``train=True`` and mutates the ``batch_stats``
collection.
"""
from __future__ import annotations

import contextlib
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

#: trace-time quantization switch (see :func:`quantized`); read when a
#: ConvBN is traced, so the jitted graph bakes in the chosen conv path
_QUANT_MODE: Optional[str] = None


@contextlib.contextmanager
def quantized(mode: Optional[str] = "int8"):
    """Trace the enclosed model application with quantized convs.

    Enter this context around ``net.apply`` *inside* the function being
    jitted (trace time), and every ``ConvBN`` lowers its conv to W8A8
    int8 on the MXU (s8×s8→s32, 2× bf16 throughput on v5e): per-output-
    channel symmetric weight quant + per-tensor dynamic activation quant,
    dequantized into f32 before BN/activation.  The reference only
    sketches int8 (convertOnnxToTensorRT.py:28-99, calibrator commented
    out); this is the real compute path it never shipped.
    """
    global _QUANT_MODE
    prev = _QUANT_MODE
    _QUANT_MODE = mode
    try:
        yield
    finally:
        _QUANT_MODE = prev


class Int8Conv(nn.Module):
    """Drop-in conv with int8 MXU arithmetic and nn.Conv's param layout
    (``kernel`` HWIO + optional ``bias``), so f32 checkpoints load
    unchanged and quantization happens in-graph:

      w_q  = round(w / s_w),  s_w per output channel (absmax/127)
      x_q  = round(x / s_x),  s_x per tensor, dynamic (absmax/127)
      y    = conv_s8(x_q, w_q) * s_w * s_x   (+ bias, f32)

    The head's final 1×1 convs stay f32 (see ConvBN.__call__) — standard
    practice to protect box/class regression precision.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))
    feature_group_count: int = 1
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_per_group = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_per_group, self.features),
            jnp.float32,
        )
        # activation scale: static when a calibrated "act_scales"
        # collection is served (the TensorRT-calibrator analogue the
        # reference sketches, convertOnnxToTensorRT.py:28-99); dynamic
        # per-tensor absmax otherwise.  quantized("int8_calib") RECORDS
        # the running absmax into the mutable collection instead.
        xscale = None
        calibrating = _QUANT_MODE == "int8_calib"
        if calibrating:
            seen = self.variable(
                "act_scales", "xmax", lambda: jnp.zeros((), jnp.float32)
            )
            xmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            seen.value = jnp.maximum(seen.value, xmax)
        elif self.has_variable("act_scales", "xmax"):
            xscale = (
                jnp.maximum(
                    self.get_variable("act_scales", "xmax"), 1e-12
                )
                / 127.0
            )
        y = int8_conv_apply(
            x, kernel, self.strides, self.padding,
            feature_group_count=self.feature_group_count,
            kernel_dilation=self.kernel_dilation,
            xscale=xscale,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        return y


def int8_conv_apply(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int],
    padding: Sequence[Tuple[int, int]],
    feature_group_count: int = 1,
    kernel_dilation: Tuple[int, int] = (1, 1),
    xscale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The W8A8 conv math of :class:`Int8Conv` as a free function, so
    modules that own their kernel param (ResNet stem, plain-nn.Conv
    blocks) can run it without changing their parameter tree.

    ``xscale``: calibrated static activation scale; None computes the
    dynamic per-tensor absmax (a global reduce before the conv — this is
    what calibration removes from the critical path)."""
    kernel = jnp.asarray(kernel, jnp.float32)
    wmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True)
    wscale = jnp.maximum(wmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(kernel / wscale), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    if xscale is None:
        xmax = jnp.max(jnp.abs(xf))
        xscale = jnp.maximum(xmax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        strides,
        [tuple(p) for p in padding],
        rhs_dilation=kernel_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (wscale.reshape(1, 1, 1, -1) * xscale)


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation, the universal CNN cell."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: object = None  # None -> torch-style symmetric k//2 padding
    groups: int = 1
    dilation: Tuple[int, int] = (1, 1)
    act: Optional[Callable] = nn.silu
    use_bn: bool = True
    use_bias: bool = False
    #: None = infer from inputs+params (flax promotion): storing bf16
    #: params and feeding bf16 activations runs the whole conv stack on
    #: the MXU in bf16 with no per-module dtype plumbing.
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch semantics (pad=k//2 symmetric) differ from lax "SAME" on
        # stride-2 / even inputs; default to the torch convention since all
        # ingested checkpoints assume it.
        padding = self.padding
        if padding is None:
            padding = [
                (d * (k - 1) // 2, d * (k - 1) // 2)
                for k, d in zip(self.kernel, self.dilation)
            ]
        # tiny-C_in stride-2 stems (the first conv of every backbone):
        # evaluate via polyphases — identical math and parameter tree,
        # ~3x faster on the MXU (see polyphase_stride2_conv)
        polyphase_ok = (
            self.strides == (2, 2)
            and self.groups == 1
            and self.dilation == (1, 1)
            and self.kernel[0] % 2 == 1
            and self.kernel[1] % 2 == 1
            and x.shape[-1] <= 4
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and self.padding is None
            and _QUANT_MODE not in ("int8", "int8_calib")
        )
        if polyphase_ok:
            x = PolyphaseStemConv(
                self.features, self.kernel,
                use_bias=self.use_bias or not self.use_bn,
                dtype=self.dtype, name="conv",
            )(x)
        elif _QUANT_MODE in ("int8", "int8_calib") and isinstance(
            padding, (list, tuple)
        ):
            x = Int8Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=tuple(tuple(p) for p in padding),
                feature_group_count=self.groups,
                kernel_dilation=self.dilation,
                use_bias=self.use_bias or not self.use_bn,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=padding,
                feature_group_count=self.groups,
                kernel_dilation=self.dilation,
                use_bias=self.use_bias or not self.use_bn,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def polyphase_stride2_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact stride-2 odd-k conv evaluated over 2x2 polyphases.

    XLA's direct lowering of a stride-2 conv with C_in=3 pads the input
    channels to the lane width and wastes ~98% of the MXU.  Space-to-
    depth the input (x_s2d[(r,t,c)] = x[2m+r, 2n+t, c]), rearrange the
    kernel into the matching polyphase taps
    (w2[a,b,(r,t,c)] = w[2a+r-1, 2b+t-1, c], zero out of range), and the
    identical convolution (torch ``pad=k//2`` semantics) runs ~3x faster
    on the stem convs (measured on the ResNet 7x7 and YOLO 3x3 stems).
    Requires odd k, stride 2, even H/W, no groups/dilation.
    """
    kh, kw, c, f = kernel.shape
    n, h, w, _ = x.shape
    assert kh % 2 == 1 and kw % 2 == 1 and h % 2 == 0 and w % 2 == 0
    xs = (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )
    # tap alignment: output tap u = 2i + p - k//2 lands on phase r when
    # p ≡ k//2 + r (mod 2); shift the kernel by δ = (k//2) & 1 so taps
    # split evenly into 2-phase groups of na = (k+δ+1)//2
    da, db = (kh // 2) & 1, (kw // 2) & 1
    na, nb = (kh + da + 1) // 2, (kw + db + 1) // 2
    wp = jnp.pad(
        kernel,
        (
            (da, 2 * na - kh - da),
            (db, 2 * nb - kw - db),
            (0, 0),
            (0, 0),
        ),
    )
    w2 = (
        wp.reshape(na, 2, nb, 2, c, f)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(na, nb, 4 * c, f)
    )
    pad_a = (kh // 2 + da) // 2
    pad_b = (kw // 2 + db) // 2
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1),
        ((pad_a, na - 1 - pad_a), (pad_b, nb - 1 - pad_b)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )


class PolyphaseStemConv(nn.Module):
    """Drop-in for ``nn.Conv`` on tiny-C_in stride-2 stems: identical
    parameter tree (``kernel``/``bias`` in HWIO layout) so checkpoint
    ingestion is unchanged, but evaluated via
    ``polyphase_stride2_conv``."""

    features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
        )
        args = [x, kernel]
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            args.append(bias)
        promoted = nn.dtypes.promote_dtype(*args, dtype=self.dtype)
        x, kernel = promoted[0], promoted[1]
        y = polyphase_stride2_conv(x, kernel)
        if self.use_bias:
            y = y + promoted[2]
        return y


def max_pool(x, window: int, stride: int, pad: int = 0):
    """Max pool with torch-style symmetric integer padding."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )


def resize_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of NHWC, matching torch
    ``interpolate(mode='nearest', scale_factor=2)``."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def autopad_torch(kernel: int, dilation: int = 1) -> Sequence[Tuple[int, int]]:
    """Symmetric torch-style padding (k//2) as explicit lax padding."""
    p = dilation * (kernel - 1) // 2
    return ((p, p), (p, p))


class CoordConv(nn.Module):
    """Conv over input concatenated with normalized (x, y) coordinate
    planes.  Utility parity with the reference's unused CoordConv
    (exportLib/ultrafastLaneV2/layer.py:83-128); available for lane-head
    experiments."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
        yy = jnp.broadcast_to(ys[:, None], (h, w))
        xx = jnp.broadcast_to(xs[None, :], (h, w))
        coords = jnp.broadcast_to(
            jnp.stack([xx, yy], axis=-1)[None], (b, h, w, 2)
        ).astype(x.dtype)
        return ConvBN(
            self.features, self.kernel, strides=self.strides,
            dtype=self.dtype, name="conv",
        )(jnp.concatenate([x, coords], axis=-1), train)
