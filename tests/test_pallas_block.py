"""Correctness of the fused residual-block Pallas kernel
(ops/pallas_block.py) against an XLA composition of the identical math
— the int8 conv + fused-epilogue semantics of models/layers.py
``int8_conv_apply`` chained twice with a VMEM mid requantize.

Runs in interpreter mode on CPU (like tests/test_pallas_conv.py); the
s32 accumulators must be bit-identical, the f32 epilogues equal to
fusion rounding, and the s8 outputs equal except for values landing
exactly on a .5 rounding boundary (none occur with the seeded data)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.ops import pallas_block as PB


def _conv_s8(xq, wq):
    return jax.lax.conv_general_dilated(
        xq.astype(jnp.int8), wq.astype(jnp.int8), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _act(name):
    return {None: lambda v: v, "relu": jax.nn.relu, "silu": jax.nn.silu}[
        name
    ]


def xla_block_ref(
    xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so,
    act1, act2, act_post, residual,
):
    """The identical two-conv block in plain XLA ops (NHWC)."""
    y1 = _act(act1)(
        _conv_s8(xq, w1q).astype(jnp.float32) * s1.reshape(-1)
        + b1.reshape(-1)
    )
    q1 = jnp.clip(jnp.round(y1 / sm), -127, 127).astype(jnp.int8)
    y2 = _act(act2)(
        _conv_s8(q1, w2q).astype(jnp.float32) * s2.reshape(-1)
        + b2.reshape(-1)
    )
    if residual:
        y2 = y2 + xq.astype(jnp.float32) * sx
    y = _act(act_post)(y2)
    return jnp.clip(jnp.round(y / so), -127, 127).astype(jnp.int8)


def _mk(rng, n, h, w, cin, cmid, cout):
    xq = jnp.asarray(
        rng.integers(-100, 100, (n, h, w, cin)), jnp.int8
    )
    w1q = jnp.asarray(rng.integers(-80, 80, (3, 3, cin, cmid)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-80, 80, (3, 3, cmid, cout)), jnp.int8)
    s1 = jnp.asarray(rng.uniform(1e-4, 3e-4, (cmid,)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.2, (cmid,)), jnp.float32)
    s2 = jnp.asarray(rng.uniform(1e-4, 3e-4, (cout,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.2, (cout,)), jnp.float32)
    sx = jnp.float32(0.021)
    sm = jnp.float32(0.034)
    so = jnp.float32(0.027)
    return xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so


CASES = [
    # (acts, residual) — the two integration patterns
    (("relu", None, "relu"), True),    # ResNet BasicBlock body
    (("silu", "silu", None), True),    # YOLO C2f/C3 bottleneck body
    (("silu", "silu", None), False),   # no-shortcut bottleneck
]


@pytest.mark.parametrize("acts,residual", CASES)
@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 40, 8, 8),     # tiny fast case
        (1, 8, 130, 32, 32),   # W spans >1 lane tile, real sublane depth
    ],
)
def test_fused_block_matches_xla(rng, acts, residual, shape):
    n, h, w, cin, cmid = shape
    cout = cin  # residual requires it
    act1, act2, act_post = acts
    xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so = _mk(
        rng, n, h, w, cin, cmid, cout
    )
    ref = xla_block_ref(
        xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so,
        act1, act2, act_post, residual,
    )
    p = PB.to_planar(xq, sx)
    # s1/s2 are already the FULL epilogue scales in the reference
    # (w_scale * x_scale * gain folded by the caller)
    out = PB.fused_block(
        p, w1q, s1, b1, sm, w2q, s2, b2, so,
        act1=act1, act2=act2, act_post=act_post, residual=residual,
        interpret=True,
    )
    got = PB.from_planar(out)
    assert got.shape == ref.shape
    # s32 accumulators are bit-identical; the f32 epilogue may round
    # differently only exactly on .5 boundaries — require near-total
    # equality and off-by-one elsewhere
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 5e-3


@pytest.mark.parametrize("acts,residual", CASES)
@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 40, 8, 8),
        (1, 8, 130, 32, 32),
    ],
)
def test_fused_block_nhwc_matches_xla(rng, acts, residual, shape):
    """The NHWC-I/O variant (in-kernel relayout, no XLA transposes)
    computes the identical block."""
    n, h, w, cin, cmid = shape
    cout = cin
    act1, act2, act_post = acts
    xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so = _mk(
        rng, n, h, w, cin, cmid, cout
    )
    ref = xla_block_ref(
        xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so,
        act1, act2, act_post, residual,
    )
    got = PB.fused_block_nhwc(
        xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so,
        act1=act1, act2=act2, act_post=act_post, residual=residual,
        interpret=True,
    )
    assert got.shape == ref.shape and got.dtype == jnp.int8
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 5e-3


def test_planar_roundtrip(rng):
    xq = jnp.asarray(rng.integers(-100, 100, (2, 10, 50, 16)), jnp.int8)
    p = PB.to_planar(xq, jnp.float32(0.1))
    assert p.data.shape == (2, 14, 16, PB.planar_wpad(50))
    # pad regions are zero
    np.testing.assert_array_equal(np.asarray(p.data[:, :2]), 0)
    np.testing.assert_array_equal(np.asarray(p.data[:, -2:]), 0)
    np.testing.assert_array_equal(np.asarray(p.data[..., :2]), 0)
    np.testing.assert_array_equal(np.asarray(p.data[..., 52:]), 0)
    np.testing.assert_array_equal(np.asarray(PB.from_planar(p)), np.asarray(xq))


def test_residual_requires_matching_channels(rng):
    xq = jnp.asarray(rng.integers(-5, 5, (1, 8, 16, 8)), jnp.int8)
    p = PB.to_planar(xq, jnp.float32(0.1))
    w1q = jnp.zeros((3, 3, 8, 8), jnp.int8)
    w2q = jnp.zeros((3, 3, 8, 16), jnp.int8)
    with pytest.raises(ValueError, match="cout == cin"):
        PB.fused_block(
            p, w1q, jnp.ones(8), None, jnp.float32(1.0),
            w2q, jnp.ones(16), None, jnp.float32(1.0),
            act1=None, act2=None, act_post=None, residual=True,
            interpret=True,
        )


def test_vmap_over_streams(rng):
    """The multistream pipeline vmaps the step over streams; the
    custom_vmap rule folds the stream axis into grid dim 0."""
    n, h, w, c = 2, 8, 40, 8
    xq, sx, w1q, s1, b1, sm, w2q, s2, b2, so = _mk(
        rng, 3 * n, h, w, c, c, c
    )
    xq = xq.reshape(3, n, h, w, c)

    def one(x):
        p = PB.to_planar(x, sx)
        out = PB.fused_block(
            p, w1q, s1, b1, sm, w2q, s2, b2, so,
            act1="silu", act2="silu", act_post=None, residual=True,
            interpret=True,
        )
        return PB.from_planar(out)

    got = jax.vmap(one)(xq)
    want = jnp.stack([one(xq[i]) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
