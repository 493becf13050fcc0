"""W-phase channel-merge rewrite of narrow strided s8 convs
(models/layers._maybe_w2c_down_conv).

The rewrite turns a 3x3 stride-(2,2) conv with Cin<=64 into a 3x2
stride-(2,1) conv on a (N,H,W/2,2C) bitcast view.  Its correctness
claim is *bit-identical s32 accumulators* — these tests pin that
exactly (integer equality, not allclose), plus eligibility gating and
the end-to-end `int8_conv_apply` path with fused epilogue/requantize.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.models import layers as L


@pytest.fixture(autouse=True)
def _enable_w2c(monkeypatch):
    # the rewrite is retired in production (default ADAS_W2C_DOWN=0 —
    # measured layout-relayout regression, see layers.py docstring);
    # these tests pin the arithmetic of the opt-in path on tiny shapes
    monkeypatch.setenv("ADAS_W2C_DOWN", "1")
    monkeypatch.setenv("ADAS_W2C_MINDIM", "1")


def _direct(xq, wq, strides=(2, 2), padding=((1, 1), (1, 1)), groups=1,
            dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


@pytest.mark.parametrize(
    "n,h,w,c,cout",
    [
        (2, 16, 16, 3, 8),     # stem-like Cin=3
        (1, 10, 20, 64, 128),  # v8l down1 shape family (Cin=64)
        (2, 8, 12, 32, 16),
        (1, 7, 8, 5, 6),       # odd H is fine; only W must be even
    ],
)
def test_accumulator_bit_exact(rng, n, h, w, c, cout):
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w, c)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, c, cout)), jnp.int8)
    acc = L._maybe_w2c_down_conv(
        xq, wq, (2, 2), ((1, 1), (1, 1)), 1, (1, 1)
    )
    assert acc is not None
    want = _direct(xq, wq)
    assert acc.shape == want.shape
    assert bool(jnp.array_equal(acc, want))


def test_eligibility_gates(rng):
    xq = jnp.zeros((1, 8, 8, 16), jnp.int8)
    wq = jnp.zeros((3, 3, 16, 8), jnp.int8)
    ok = dict(strides=(2, 2), padding=((1, 1), (1, 1)), groups=1,
              dilation=(1, 1))

    def run(x=xq, w=wq, **over):
        kw = {**ok, **over}
        return L._maybe_w2c_down_conv(
            x, w, kw["strides"], kw["padding"], kw["groups"],
            kw["dilation"],
        )

    assert run() is not None
    assert run(strides=(1, 1)) is None
    assert run(strides=(2, 1)) is None
    assert run(padding=((0, 0), (1, 1))) is None
    assert run(groups=16, w=jnp.zeros((3, 3, 1, 16), jnp.int8)) is None
    assert run(dilation=(2, 2)) is None
    assert run(x=jnp.zeros((1, 8, 7, 16), jnp.int8)) is None  # odd W
    assert run(x=jnp.zeros((1, 8, 8, 96), jnp.int8),
               w=jnp.zeros((3, 3, 96, 8), jnp.int8)) is None  # Cin>64
    assert run(w=jnp.zeros((5, 5, 16, 8), jnp.int8)) is None  # not 3x3


def test_mindim_gate(rng, monkeypatch):
    """Default eligibility requires min(H, W) >= 160 — the measured
    `{3,0,2,1}`-pathology shapes; small feature maps (e.g. the lane
    trunk's 80x400 layer2 down conv) stay on the direct conv."""
    monkeypatch.delenv("ADAS_W2C_MINDIM", raising=False)
    wq = jnp.zeros((3, 3, 16, 8), jnp.int8)
    small = jnp.zeros((1, 80, 400, 16), jnp.int8)
    big = jnp.zeros((1, 160, 320, 16), jnp.int8)
    args = ((2, 2), ((1, 1), (1, 1)), 1, (1, 1))
    assert L._maybe_w2c_down_conv(small, wq, *args) is None
    assert L._maybe_w2c_down_conv(big, wq, *args) is not None


def test_env_kill_switch(rng, monkeypatch):
    xq = jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 16)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 16, 8)), jnp.int8)
    monkeypatch.setenv("ADAS_W2C_DOWN", "0")
    assert L._maybe_w2c_down_conv(
        xq, wq, (2, 2), ((1, 1), (1, 1)), 1, (1, 1)
    ) is None


def test_int8_conv_apply_end_to_end(rng):
    """Through the public entry: epilogue/requantize output must be
    byte-identical with the rewrite on vs off (s32 accumulators are
    bit-equal, so every downstream byte is too)."""
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 16, 48)), jnp.float32)
    kernel = jnp.asarray(
        rng.normal(0, 0.1, (3, 3, 48, 32)), jnp.float32
    )
    gain = jnp.asarray(rng.uniform(0.5, 1.5, (32,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (32,)), jnp.float32)
    out_scale = jnp.float32(0.02)

    def run():
        return L.int8_conv_apply(
            x, kernel, (2, 2), ((1, 1), (1, 1)),
            fold=(gain, bias), act=jax.nn.silu, out_scale=out_scale,
        )

    L._TRACE_STATS["w2c_downs"] = 0
    on = run()
    assert L._TRACE_STATS["w2c_downs"] == 1
    try:
        import os
        os.environ["ADAS_W2C_DOWN"] = "0"
        off = run()
    finally:
        os.environ.pop("ADAS_W2C_DOWN", None)
    assert on.scale is off.scale or bool(
        jnp.array_equal(on.scale, off.scale)
    )
    assert bool(jnp.array_equal(on.data, off.data))
