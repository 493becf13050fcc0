"""Fused Pallas int8 3x3 conv (ops/pallas_conv.py) parity vs the XLA
int8 path (models/layers.int8_conv_apply's conv_general_dilated
formulation) — integer accumulator math identical, epilogue to f32
rounding, requantize to exact s8.  Runs the kernel in interpreter mode
on the CPU test backend."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.ops.pallas_conv import int8_conv3x3, pack_w2


def _ref_conv(xq, wq, scale, bias, act, out_scale):
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale.reshape(-1)
    if bias is not None:
        y = y + bias.reshape(-1)
    if act == "silu":
        y = jax.nn.silu(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    if out_scale is not None:
        return jnp.clip(
            jnp.round(y / out_scale), -127, 127
        ).astype(jnp.int8)
    return y.astype(jnp.bfloat16)


def _rand_case(rng, n=2, h=8, w=12, cin=16, cout=24):
    xq = jnp.asarray(
        rng.integers(-127, 128, (n, h, w, cin)), jnp.int8
    )
    wq = jnp.asarray(
        rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8
    )
    scale = jnp.asarray(
        rng.uniform(1e-4, 2e-3, (cout,)), jnp.float32
    )
    bias = jnp.asarray(rng.normal(0, 0.5, (cout,)), jnp.float32)
    return xq, wq, scale, bias


@pytest.mark.parametrize("act", [None, "relu", "silu"])
def test_bf16_output_matches_xla(rng, act):
    xq, wq, scale, bias = _rand_case(rng)
    got = int8_conv3x3(xq, wq, scale, bias, act, interpret=True)
    want = _ref_conv(xq, wq, scale, bias, act, None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_requantized_output_matches_xla(rng):
    xq, wq, scale, bias = _rand_case(rng, cin=32, cout=16)
    out_scale = jnp.float32(0.07)
    got = int8_conv3x3(
        xq, wq, scale, bias, "silu", out_scale=out_scale, interpret=True
    )
    want = _ref_conv(xq, wq, scale, bias, "silu", out_scale)
    assert got.dtype == jnp.int8
    # identical integer accumulators; the requant round() may flip
    # values on an exact .5 boundary (f32 fusion order) — allow <=1 lsb
    # on a vanishing fraction
    diff = np.abs(
        np.asarray(got, np.int32) - np.asarray(want, np.int32)
    )
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_no_bias(rng):
    xq, wq, scale, _ = _rand_case(rng, n=1, cin=8, cout=8)
    got = int8_conv3x3(xq, wq, scale, None, None, interpret=True)
    want = _ref_conv(xq, wq, scale, None, None, None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_vmap_folds_batch_into_grid(rng):
    """The multistream step vmaps the model over streams: the
    custom_vmap rule must fold the mapped axis into grid dim 0."""
    xq, wq, scale, bias = _rand_case(rng, n=3, cin=8, cout=8)
    xs = xq[:, None]  # (3, 1, h, w, c): vmap over dim 0

    def f(x1):
        return int8_conv3x3(x1, wq, scale, bias, "silu", interpret=True)

    got = jax.vmap(f)(xs)
    want = int8_conv3x3(xq, wq, scale, bias, "silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got[:, 0], np.float32), np.asarray(want, np.float32),
    )


def test_pack_w2_layout(rng):
    wq = jnp.asarray(rng.integers(-5, 6, (3, 3, 4, 6)), jnp.int8)
    w2 = pack_w2(wq)
    assert w2.shape == (3, 6, 12)  # (dx, cout, 3cin)
    # K order must be (dy, cin) per W-tap dx — matching the kernel's
    # (3, cin, wl) -> (3cin, wl) scratch reshape
    for dx in range(3):
        for dy in range(3):
            np.testing.assert_array_equal(
                np.asarray(w2[dx, :, dy * 4 : (dy + 1) * 4]),
                np.asarray(wq[dy, dx]).T,
            )


def test_convbn_routes_through_kernel(rng, monkeypatch):
    """End-to-end: a calibrated int8 ConvBN serves through the Pallas
    kernel when ADAS_PALLAS_CONV=1 and produces the XLA path's values."""
    import flax.linen as nn

    from adas_tpu.models.layers import ConvBN, quantized
    from adas_tpu.tools.quantize import calibrate_act_scales

    net = ConvBN(24, (3, 3), act=nn.silu)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16)), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x)
    cal = calibrate_act_scales(
        lambda vv, xi: net.apply(vv, xi, mutable=["act_scales"]), v, [x]
    )

    def run():
        with quantized("int8"):
            return np.asarray(net.apply(cal, x), np.float32)

    monkeypatch.delenv("ADAS_PALLAS_CONV", raising=False)
    xla = run()
    monkeypatch.setenv("ADAS_PALLAS_CONV", "1")
    pallas = run()
    np.testing.assert_allclose(pallas, xla, rtol=1e-2, atol=1e-2)
