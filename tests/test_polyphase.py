"""Polyphase (space-to-depth) stride-2 stem conv: exactness vs the
direct XLA lowering.

The rewrite exists purely for MXU utilization (tiny-C_in stride-2 stems
pad input channels to the lane width); it must be bit-for-bit the same
convolution as ``lax.conv_general_dilated`` with torch ``pad=k//2``
semantics for every odd k.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.models.layers import polyphase_stride2_conv

_NHWC = ("NHWC", "HWIO", "NHWC")


def _direct(x, w):
    kh, kw = w.shape[0], w.shape[1]
    return jax.lax.conv_general_dilated(
        x, w, (2, 2),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, _NHWC
        ),
    )


@pytest.mark.parametrize("k", [1, 3, 5, 7, 9])
@pytest.mark.parametrize("c", [1, 3, 4])
def test_polyphase_matches_direct(rng, k, c):
    x = jnp.asarray(rng.standard_normal((2, 16, 24, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, c, 8)), jnp.float32)
    got = polyphase_stride2_conv(x, w)
    want = _direct(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_polyphase_rect_kernel(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 7, 3, 5)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(polyphase_stride2_conv(x, w)),
        np.asarray(_direct(x, w)),
        rtol=1e-5, atol=1e-5,
    )


def test_resnet_stem_odd_input_falls_back(rng):
    """Odd H/W can't space-to-depth; StemConv must still be exact."""
    from adas_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.standard_normal((1, 15, 21, 3)), jnp.float32)
    mod = StemConv(8)
    params = mod.init(jax.random.PRNGKey(0), x)
    w = params["params"]["kernel"]
    got = mod.apply(params, x)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, _NHWC
        ),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
