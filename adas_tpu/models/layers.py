"""Shared flax building blocks for the model zoo.

All models are NHWC (TPU-native layout); weights ingested from torch/ONNX
checkpoints are transposed accordingly by the importers in
``adas_tpu.tools``.  BatchNorm runs in inference mode by default — the
training path passes ``train=True`` and mutates the ``batch_stats``
collection.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


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
