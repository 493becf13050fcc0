"""Planar (channel-major) serving-path preprocessing parity.

The I420 transport keeps W in the 128-lane minor dimension end to end
(ops/preprocess planar functions) and can emit the stems' space-to-depth
layout directly (S2DInput), skipping the polyphase transpose inside the
model.  These tests pin: planar == channel-minor numerics, S2DInput ==
NHWC model forward, and the fused multistream step end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adas_tpu.ops.preprocess import (
    LetterboxGeometry,
    S2DInput,
    bgr_to_i420,
    i420_to_bgr,
    i420_to_bgr_planar,
    imagenet_preprocess,
    imagenet_preprocess_planar,
    ufld_v2_preprocess,
    ufld_v2_preprocess_planar,
    yolo_preprocess,
    yolo_preprocess_planar,
)


@pytest.fixture(scope="module")
def frame():
    return np.random.default_rng(0).integers(
        0, 255, (108, 192, 3), dtype=np.uint8
    )


def test_i420_planar_matches_channel_minor(frame):
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr = np.asarray(i420_to_bgr(yuv, 108, 192))
    bgr_p = np.asarray(i420_to_bgr_planar(yuv, 108, 192))
    assert bgr_p.shape == (3, 108, 192)
    np.testing.assert_array_equal(np.moveaxis(bgr_p, 0, -1), bgr)


def test_yolo_preprocess_planar_parity(frame):
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr = i420_to_bgr(yuv, 108, 192)
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 64, 64)
    a = np.asarray(yolo_preprocess(bgr[None], geom))
    b = np.asarray(yolo_preprocess_planar(bgr_p[None], geom))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_imagenet_preprocess_planar_parity(frame):
    """EfficientDet's batched-serving preprocess: planar == channel-minor
    (reference normalize: ObjectDetector/efficientdetDetector.py:57-65)."""
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr = i420_to_bgr(yuv, 108, 192)
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 128, 128)
    a = np.asarray(imagenet_preprocess(bgr[None], geom))
    b = np.asarray(imagenet_preprocess_planar(bgr_p[None], geom))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_ufld_preprocess_planar_parity(frame):
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr = i420_to_bgr(yuv, 108, 192)
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    a = np.asarray(ufld_v2_preprocess(bgr[None], 32, 80, 0.8))
    b = np.asarray(ufld_v2_preprocess_planar(bgr_p[None], 32, 80, 0.8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_s2d_layout_matches_model_transform(frame):
    """S2DInput.data must equal the exact xs that
    polyphase_stride2_conv builds from the NHWC tensor (same (r, t, c)
    channel order) — otherwise the stem would silently compute a
    permuted convolution."""
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 64, 64)
    nhwc = yolo_preprocess_planar(bgr_p[None], geom)
    s2d = yolo_preprocess_planar(bgr_p[None], geom, s2d=True)
    assert isinstance(s2d, S2DInput)
    assert s2d.shape == nhwc.shape
    n, h, w, c = nhwc.shape
    want = np.asarray(
        jnp.reshape(nhwc, (n, h // 2, 2, w // 2, 2, c))
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )
    np.testing.assert_allclose(np.asarray(s2d.data), want, atol=1e-6)


def test_yolo_forward_s2d_equals_nhwc(frame):
    """Full YoloV8 forward on S2DInput == forward on the NHWC tensor."""
    from adas_tpu.models.yolo import YoloSpec, build_yolo

    spec = YoloSpec(
        family="v8", scale="n", num_classes=8, input_size=(64, 64)
    )
    net = build_yolo(spec)
    assert net.stem_s2d_ok
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 64, 64)
    x = yolo_preprocess_planar(bgr_p[None], geom)
    xs = yolo_preprocess_planar(bgr_p[None], geom, s2d=True)
    variables = net.init(jax.random.PRNGKey(0), x)
    a = np.asarray(net.apply(variables, x))
    b = np.asarray(net.apply(variables, xs))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_ufld_forward_s2d_equals_nhwc(frame):
    """UFLDv2Net forward (ResNet StemConv) on S2DInput == NHWC."""
    from adas_tpu.models.ufld import UFLDv2Spec, UFLDv2Net

    spec = UFLDv2Spec(
        input_height=64, input_width=128, crop_ratio=0.8,
        num_cell_row=16, num_row=8, num_cell_col=16, num_col=8,
        fc_norm=True, mlp_mid=64, img_w=128, img_h=64,
    )
    net = UFLDv2Net(spec)
    assert net.stem_s2d_ok
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    x = ufld_v2_preprocess_planar(bgr_p[None], 64, 128, 0.8)
    xs = ufld_v2_preprocess_planar(bgr_p[None], 64, 128, 0.8, s2d=True)
    variables = net.init(jax.random.PRNGKey(0), x)
    a = net.apply(variables, x)
    b = net.apply(variables, xs)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, err_msg=k
        )


def test_s2d_rejected_by_non_polyphase_conv(frame):
    """A v5 (6x6 even stem) graph must refuse S2DInput loudly."""
    from adas_tpu.models.yolo import YoloSpec, build_yolo

    spec = YoloSpec(
        family="v5", scale="n", num_classes=8, input_size=(64, 64)
    )
    net = build_yolo(spec)
    # YoloV5 has no stem_s2d_ok: the multistream getattr default keeps
    # it on the plain NHWC path
    assert not getattr(net, "stem_s2d_ok", False)
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 64, 64)
    x = yolo_preprocess_planar(bgr_p[None], geom)
    xs = yolo_preprocess_planar(bgr_p[None], geom, s2d=True)
    variables = net.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="pre-space-to-depth"):
        net.apply(variables, xs)


def _bgr_planes_unrounded(yuv_np, h, w):
    """i420_to_bgr_planar's math WITHOUT the uint8 round/clip — the
    exact linear chain the YUV-direct path folds into its matrices."""
    y = yuv_np[:h].astype(np.float32)
    u = yuv_np[h : h + h // 4].reshape(h // 2, w // 2).astype(np.float32)
    v = yuv_np[h + h // 4 :].reshape(h // 2, w // 2).astype(np.float32)
    up = lambda p: p.repeat(2, axis=0).repeat(2, axis=1)
    uu, vv = up(u) - 128.0, up(v) - 128.0
    yy = 1.164 * (y - 16.0)
    r = yy + 1.596 * vv
    g = yy - 0.391 * uu - 0.813 * vv
    b = yy + 2.018 * uu
    return np.stack([b, g, r])


def test_yolo_planes_yuv_exact_vs_unrounded_chain(frame):
    """YUV-direct emission == the planes path fed the UNROUNDED BGR
    (the two differ only by the dropped uint8 round/clip)."""
    from adas_tpu.ops.preprocess import (
        yolo_preprocess_planes,
        yolo_preprocess_planes_yuv,
    )

    yuv = bgr_to_i420(frame)
    geom = LetterboxGeometry(108, 192, 64, 64)
    bgr_u = jnp.asarray(_bgr_planes_unrounded(yuv, 108, 192))
    want = np.asarray(yolo_preprocess_planes(bgr_u[None], geom).data)
    got = yolo_preprocess_planes_yuv(jnp.asarray(yuv), 108, 192, geom)
    np.testing.assert_allclose(np.asarray(got.data), want, atol=1e-4)
    assert got.shape == (1, 64, 64, 3)
    assert got.margins == ((1, 0), (1, 0))


def test_ufld_planes_yuv_exact_vs_unrounded_chain(frame):
    from adas_tpu.ops.preprocess import (
        ufld_v2_preprocess_planes,
        ufld_v2_preprocess_planes_yuv,
    )

    yuv = bgr_to_i420(frame)
    bgr_u = jnp.asarray(_bgr_planes_unrounded(yuv, 108, 192))
    want = np.asarray(
        ufld_v2_preprocess_planes(bgr_u[None], 64, 128, 0.8).data
    )
    got = ufld_v2_preprocess_planes_yuv(
        jnp.asarray(yuv), 108, 192, 64, 128, 0.8
    )
    np.testing.assert_allclose(np.asarray(got.data), want, atol=5e-4)


def test_planes_yuv_close_to_rounded_path():
    """Against the SERVED rounded path the divergence is bounded by the
    resize of +-0.5 uint8 rounding (documented in ops/preprocess).

    Uses a smooth in-gamut frame: the bound is a VIDEO contract.  Pure
    uint8 noise is pathological for 4:2:0 — chroma averaging over 2x2
    blocks of uncorrelated colors reconstructs far outside [0, 255], so
    the rounded path's clip (cv2 decode parity) diverges arbitrarily
    from any linear chain.  The noise-frame case is still pinned by the
    exact-vs-unrounded tests above.
    """
    from adas_tpu.ops.preprocess import (
        ufld_v2_preprocess_planes,
        ufld_v2_preprocess_planes_yuv,
        yolo_preprocess_planes,
        yolo_preprocess_planes_yuv,
    )

    yy, xx = np.mgrid[0:108, 0:192].astype(np.float32)
    frame = np.stack(
        [
            20 + 200 * yy / 107,
            20 + 200 * xx / 191,
            20 + 100 * (yy / 107 + xx / 191),
        ],
        axis=-1,
    ).astype(np.uint8)
    yuv = jnp.asarray(bgr_to_i420(frame))
    bgr_p = i420_to_bgr_planar(yuv, 108, 192)
    geom = LetterboxGeometry(108, 192, 64, 64)
    a = np.asarray(yolo_preprocess_planes(bgr_p[None], geom).data)
    b = np.asarray(
        yolo_preprocess_planes_yuv(yuv, 108, 192, geom).data
    )
    np.testing.assert_allclose(a, b, atol=3e-3)
    a = np.asarray(
        ufld_v2_preprocess_planes(bgr_p[None], 64, 128, 0.8).data
    )
    b = np.asarray(
        ufld_v2_preprocess_planes_yuv(yuv, 108, 192, 64, 128, 0.8).data
    )
    np.testing.assert_allclose(a, b, atol=1.5e-2)


def test_planes_yuv_under_vmap(frame):
    """The multistream step vmaps the emission over the stream batch."""
    from adas_tpu.ops.preprocess import yolo_preprocess_planes_yuv

    rng = np.random.default_rng(5)
    frames = [frame, rng.integers(0, 255, (108, 192, 3), dtype=np.uint8)]
    stacks = jnp.asarray(np.stack([bgr_to_i420(f) for f in frames]))
    geom = LetterboxGeometry(108, 192, 64, 64)
    f = lambda s: yolo_preprocess_planes_yuv(s, 108, 192, geom).data
    got = np.asarray(jax.vmap(f)(stacks))
    want = np.stack([np.asarray(f(stacks[i])) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_multistream_i420_planar_end_to_end():
    """The fused multistream step serves the planar+s2d path: results
    carry the full per-stream contract and trackers advance."""
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    ms = MultiStreamADAS(
        yolo, lane, 2, frame_hw=(180, 320),
        host_downscale=(88, 160), transport="i420",
    )
    rng = np.random.default_rng(3)
    for _ in range(2):
        frames = rng.integers(0, 255, (2, 180, 320, 3), dtype=np.uint8)
        results = ms.process_batch(frames)
    assert len(results) == 2
    for r in results:
        assert {"objects", "tracks", "collision", "offset"} <= set(r)
    assert all(s.tracker.frame_id == 2 for s in ms.streams)
