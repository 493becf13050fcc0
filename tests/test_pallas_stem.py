"""Pallas fused-stem kernel parity (CPU interpret mode).

Pins: fused conv+affine+act(+maxpool) == the XLA chain
(models.layers.polyphase_stride2_conv + affine + act + nn.max_pool) that
itself is parity-tested against the torch stems; planes emission
(ops.preprocess S2DPlanes) == the logical space-to-depth of the NHWC
tensor; vmap (the multistream step maps the kernel over streams).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adas_tpu.models.layers import max_pool, polyphase_stride2_conv
from adas_tpu.ops.pallas_stem import fused_stem, stem_margins
from adas_tpu.ops.preprocess import S2DPlanes

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


def _ref_chain(x_nhwc, k, gain, bias, act, pool):
    y = polyphase_stride2_conv(jnp.asarray(x_nhwc), jnp.asarray(k))
    y = y * gain + bias
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "silu":
        y = jax.nn.silu(y)
    if pool:
        y = max_pool(y, 3, 2, pad=1)
    return np.asarray(y)


def _planes_from_nhwc(x_nhwc, margins):
    n, h, w, c = x_nhwc.shape
    xs = (
        x_nhwc.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 2, 4, 5, 3)  # n i r t c j
        .reshape(n, h // 2, 4 * c, w // 2)
    )
    (mt, mb), (ml, mr) = margins
    xs = np.pad(xs, ((0, 0), (mt, mb), (0, 0), (ml, mr)))
    return S2DPlanes(jnp.asarray(xs), (n, h, w, c), margins)


@pytest.mark.parametrize(
    "kk,pool,act,hw",
    [
        (7, True, "relu", (64, 160)),  # the ResNet stem chain shape family
        (3, False, "silu", (64, 96)),  # the YOLO stem
        (7, True, "relu", (80, 80)),
        (3, False, None, (32, 64)),
        # multi-band grids (nbands > 1): the bi-dependent DMA offsets
        # and band-edge masking that the real serving shapes use
        # (CULane hs=160 -> band 16, 5 bands) are otherwise untested
        (3, False, "silu", (128, 64)),  # ho=64, band=32, 2 bands
        (7, True, "relu", (256, 64)),  # ho=64, band=32, 2 bands, pooled
        # unsound-for-the-kernel pool combos: routed to the XLA chain
        # (zero-realized -inf padding is only exact post-ReLU; odd hs
        # pools to ceil(hs/2) rows) — parity must still hold
        (7, True, "silu", (64, 160)),
        (7, True, "relu", (66, 160)),
    ],
)
def test_fused_stem_matches_xla_chain(kk, pool, act, hw):
    rng = np.random.default_rng(0)
    h, w = hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    k = (rng.standard_normal((kk, kk, 3, 64)) * 0.1).astype(np.float32)
    gain = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    ref = _ref_chain(x, k, gain, bias, act, pool)
    planes = _planes_from_nhwc(x, stem_margins(kk, kk, pool))
    got = np.asarray(
        fused_stem(
            planes.data, jnp.asarray(k), gain, bias, logical_hw=(h, w),
            pool=pool, act=act, out_dtype=jnp.float32,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused_stem_xla_fallback_parity(monkeypatch):
    """The XLA-chain fallback (taken when the Pallas kernel cannot
    compile on the serving backend, or ADAS_DISABLE_PALLAS_STEM=1) must
    produce the identical stem output."""
    monkeypatch.setenv("ADAS_DISABLE_PALLAS_STEM", "1")
    rng = np.random.default_rng(7)
    for kk, pool, act, hw in [(7, True, "relu", (64, 160)),
                              (3, False, "silu", (64, 96))]:
        h, w = hw
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        k = (rng.standard_normal((kk, kk, 3, 64)) * 0.1).astype(np.float32)
        gain = rng.standard_normal(64).astype(np.float32)
        bias = rng.standard_normal(64).astype(np.float32)
        ref = _ref_chain(x, k, gain, bias, act, pool)
        planes = _planes_from_nhwc(x, stem_margins(kk, kk, pool))
        got = np.asarray(
            fused_stem(
                planes.data, jnp.asarray(k), gain, bias, logical_hw=(h, w),
                pool=pool, act=act, out_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused_stem_under_vmap():
    """The multistream step vmaps the per-frame computation over the
    stream batch — the kernel must batch correctly."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 1, 64, 96, 3)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, 64)) * 0.1).astype(np.float32)
    gain = np.ones(64, np.float32)
    bias = np.zeros(64, np.float32)
    m = stem_margins(3, 3, False)
    planes = np.stack(
        [np.asarray(_planes_from_nhwc(x[i], m).data) for i in range(4)]
    )
    f = lambda p: fused_stem(
        p, jnp.asarray(k), gain, bias, logical_hw=(64, 96), pool=False,
        act="silu", out_dtype=jnp.float32,
    )
    got = np.asarray(jax.vmap(f)(jnp.asarray(planes)))
    ref = np.stack(
        [_ref_chain(x[i], k, gain, bias, "silu", False) for i in range(4)]
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_planes_emission_matches_s2d():
    """yolo_preprocess_planes data == the (i, (r,t,c), j) relabeling of
    yolo_preprocess_planar(s2d=True).data plus the zero margins."""
    from adas_tpu.ops.preprocess import (
        LetterboxGeometry,
        bgr_to_i420,
        i420_to_bgr_planar,
        yolo_preprocess_planar,
        yolo_preprocess_planes,
    )

    frame = np.random.default_rng(2).integers(
        0, 255, (108, 192, 3), dtype=np.uint8
    )
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 64, 64)
    margins = ((1, 0), (1, 0))
    planes = yolo_preprocess_planes(bgr_p[None], geom, margins=margins)
    s2d = yolo_preprocess_planar(bgr_p[None], geom, s2d=True)
    (mt, mb), (ml, mr) = margins
    n, hs, ws = 1, 32, 32
    want = np.asarray(s2d.data).reshape(n, hs, ws, 12).transpose(0, 1, 3, 2)
    got = np.asarray(planes.data)
    assert got.shape == (n, hs + mt + mb, 12, ws + ml + mr)
    core = got[:, mt : mt + hs, :, ml : ml + ws]
    np.testing.assert_allclose(core, want, atol=1e-6)
    # margins are exact zeros (conv padding)
    assert np.all(got[:, :mt] == 0) and np.all(got[:, mt + hs :] == 0)
    assert np.all(got[..., :ml] == 0) and np.all(got[..., ml + ws :] == 0)


def test_ufld_planes_emission_matches_s2d():
    from adas_tpu.ops.preprocess import (
        bgr_to_i420,
        i420_to_bgr_planar,
        ufld_v2_preprocess_planar,
        ufld_v2_preprocess_planes,
    )

    frame = np.random.default_rng(3).integers(
        0, 255, (108, 192, 3), dtype=np.uint8
    )
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    margins = ((3, 2), (3, 2))
    planes = ufld_v2_preprocess_planes(
        bgr_p[None], 64, 128, 0.8, margins=margins
    )
    s2d = ufld_v2_preprocess_planar(bgr_p[None], 64, 128, 0.8, s2d=True)
    n, hs, ws = 1, 32, 64
    want = np.asarray(s2d.data).reshape(n, hs, ws, 12).transpose(0, 1, 3, 2)
    got = np.asarray(planes.data)
    assert got.shape == (n, hs + 5, 12, ws + 5)
    np.testing.assert_allclose(
        got[:, 3 : 3 + hs, :, 3 : 3 + ws], want, atol=1e-6
    )


def test_fused_stem_rejects_mismatched_margins():
    """A margin SPLIT that disagrees with stem_margins but matches the
    total padded shape would silently shift every conv window —
    fused_stem cross-checks the S2DPlanes' own margins field."""
    rng = np.random.default_rng(3)
    h, w = 64, 96
    x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    good = stem_margins(3, 3, False)
    (mt, mb), (ml, mr) = good
    bad = ((mb, mt), (ml, mr)) if mt != mb else ((mt, mb), (mr, ml))
    assert bad != good
    planes = _planes_from_nhwc(x, bad)
    k = (rng.standard_normal((3, 3, 3, 8)) * 0.1).astype(np.float32)
    with pytest.raises(ValueError, match="margins"):
        fused_stem(
            planes.data, jnp.asarray(k), np.ones(8, np.float32),
            np.zeros(8, np.float32), logical_hw=(h, w), pool=False,
            act="silu", out_dtype=jnp.float32,
            expect_margins=planes.margins,
        )
