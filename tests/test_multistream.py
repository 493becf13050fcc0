"""Multi-stream DP pipeline test on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from adas_tpu.parallel import make_mesh
from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
from adas_tpu.perception.object_detector import YoloDetector
from adas_tpu.pipeline.multistream import MultiStreamADAS
from adas_tpu.utils.types import LaneModelType, ObjectModelType

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


def test_multistream_batch_over_mesh():
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    mesh = make_mesh(8, model_parallel=1)
    n = 8
    ms = MultiStreamADAS(yolo, lane, n, frame_hw=(180, 320), mesh=mesh)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n, 180, 320, 3), dtype=np.uint8)

    results = ms.process_batch(frames)
    assert len(results) == n
    for r in results:
        assert {"objects", "tracks", "collision", "offset", "curvature"} <= set(r)
    # per-stream temporal state is independent: run a second batch and
    # check trackers advanced independently
    results2 = ms.process_batch(frames)
    assert len(results2) == n
    assert all(s.tracker.frame_id == 2 for s in ms.streams)


def test_multistream_matches_per_stream_detections():
    """Stream i's detections equal running the single-frame path on its
    frame (DP is exact)."""
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    n = 2
    ms = MultiStreamADAS(yolo, lane, n, frame_hw=(180, 320), mesh=None)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (n, 180, 320, 3), dtype=np.uint8)
    results = ms.process_batch(frames)

    for i in range(n):
        yolo.DetectFrame(frames[i])
        expected = [
            (o.label, round(o.conf, 4)) for o in yolo.object_info
        ]
        got = [(o.label, round(o.conf, 4)) for o in results[i]["objects"]]
        assert got == expected


def test_multistream_fetch_dedupes_replica_shards():
    """(data=4, model=2) mesh: each data shard has 2 replicas; fetch must
    not double-count them."""
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    mesh = make_mesh(8)  # default: model_parallel=2
    assert mesh.devices.shape == (4, 2)
    ms = MultiStreamADAS(yolo, lane, 4, frame_hw=(180, 320), mesh=mesh)
    frames = np.random.default_rng(1).integers(
        0, 255, (4, 180, 320, 3), dtype=np.uint8
    )
    results = ms.process_batch(frames)
    assert len(results) == 4


def test_per_stream_lane_isolation_and_probe():
    """Each stream owns its lane_info (results include per-stream lane
    geometry), and the compute probe runs chained steps in one dispatch."""
    import jax

    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    n = 2
    ms = MultiStreamADAS(yolo, lane, n, frame_hw=(180, 320), mesh=None)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (n, 180, 320, 3), dtype=np.uint8)
    results = ms.process_batch(frames)

    infos = [r["lane_info"] for r in results]
    assert infos[0] is not infos[1]
    assert infos[0] is ms.streams[0].lane_info
    assert infos[1] is ms.streams[1].lane_info
    for r in results:
        assert "lanes_points" in r and "lanes_status" in r
        assert "area_status" in r

    probe = ms.make_compute_probe(2)
    x = np.asarray(ms._host_prep(frames))
    out = jax.block_until_ready(
        probe(ms.yolo.variables, ms.lane.variables, x)
    )
    assert np.isfinite(float(out))


def test_device_kf_ops_predict_equivalence():
    """ops/kalman_jax.predict reproduces the host tracker's batched
    predict through the generic ``update(predicted=)`` seam.

    The round-3 device-KF SERVING mode was retired in round 5 (VERDICT
    r4 #4; design note in pipeline/multistream.py): it could never
    pipeline, and pipelined host-KF serving beats it >2x.  The batched
    device predict remains a tested library op."""
    import copy

    import jax

    from adas_tpu.ops import kalman_jax
    from adas_tpu.tracking import BYTETracker
    from adas_tpu.tracking.strack import STrack

    # Build a tracker with live tracked + lost tracks.
    tracker = BYTETracker(names={"person": (0, 255, 0)})
    rng = np.random.default_rng(3)
    boxes = np.abs(rng.normal(100, 30, (6, 4)))
    boxes[:, 2:] = boxes[:, :2] + np.abs(rng.normal(40, 10, (6, 2)))
    frame = np.zeros((240, 320, 3), np.uint8)
    tracker.update(boxes, np.full(6, 0.9), np.zeros(6, int), frame)
    tracker.update(boxes + 2, np.full(6, 0.9), np.zeros(6, int), frame)
    tracker.update(boxes[:4] + 4, np.full(4, 0.9), np.zeros(4, int), frame)
    pool = tracker.predict_pool()
    assert len(pool) >= 4

    # Device predict on the gathered state == host multi_predict.
    means, covs = STrack.gather_state(pool)
    pm, pc = jax.jit(kalman_jax.predict)(
        means.astype(np.float32), covs.astype(np.float32)
    )
    host = copy.deepcopy(tracker)
    dev = copy.deepcopy(tracker)
    dets = boxes[:4] + 6
    host.update(dets, np.full(4, 0.9), np.zeros(4, int), frame)
    dev.update(
        dets, np.full(4, 0.9), np.zeros(4, int), frame,
        predicted=(np.asarray(pm), np.asarray(pc)),
    )
    assert len(host.tracked_stracks) == len(dev.tracked_stracks)
    for a, b in zip(host.tracked_stracks, dev.tracked_stracks):
        assert a.track_id == b.track_id
        np.testing.assert_allclose(a.mean, b.mean, atol=1e-3)


def test_multistream_rejects_device_kf_kwarg():
    """The retired serving flag must fail loudly, not be ignored."""
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    with pytest.raises(TypeError):
        MultiStreamADAS(
            yolo, lane, 2, frame_hw=(180, 320), device_kf=True
        )


def test_multistream_matches_per_stream_detections():
    """Stream i's detections equal running the single-frame path on its
    frame (DP is exact)."""
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    n = 2
    ms = MultiStreamADAS(yolo, lane, n, frame_hw=(180, 320), mesh=None)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (n, 180, 320, 3), dtype=np.uint8)
    results = ms.process_batch(frames)

    for i in range(n):
        yolo.DetectFrame(frames[i])
        expected = [
            (o.label, round(o.conf, 4)) for o in yolo.object_info
        ]
        got = [(o.label, round(o.conf, 4)) for o in results[i]["objects"]]
        assert got == expected


def test_multistream_fetch_dedupes_replica_shards():
    """(data=4, model=2) mesh: each data shard has 2 replicas; fetch must
    not double-count them."""
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    mesh = make_mesh(8)  # default: model_parallel=2
    assert mesh.devices.shape == (4, 2)
    ms = MultiStreamADAS(yolo, lane, 4, frame_hw=(180, 320), mesh=mesh)
    frames = np.random.default_rng(1).integers(
        0, 255, (4, 180, 320, 3), dtype=np.uint8
    )
    results = ms.process_batch(frames)
    assert len(results) == 4


def test_per_stream_lane_isolation_and_probe():
    """Each stream owns its lane_info (results include per-stream lane
    geometry), and the compute probe runs chained steps in one dispatch."""
    import jax

    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
        input_size=(160, 160), box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    n = 2
    ms = MultiStreamADAS(yolo, lane, n, frame_hw=(180, 320), mesh=None)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (n, 180, 320, 3), dtype=np.uint8)
    results = ms.process_batch(frames)

    infos = [r["lane_info"] for r in results]
    assert infos[0] is not infos[1]
    assert infos[0] is ms.streams[0].lane_info
    assert infos[1] is ms.streams[1].lane_info
    for r in results:
        assert "lanes_points" in r and "lanes_status" in r
        assert "area_status" in r

    probe = ms.make_compute_probe(2)
    x = np.asarray(ms._host_prep(frames))
    out = jax.block_until_ready(
        probe(ms.yolo.variables, ms.lane.variables, x)
    )
    assert np.isfinite(float(out))


def test_multistream_nms_free_v10():
    """BASELINE config-5 serving shape: the v10 one-to-one head inside
    the batched step, no NMS stage."""
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV10, scale="n",
        input_size=(160, 160), box_score=0.05, nms_free=True,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    ms = MultiStreamADAS(yolo, lane, 2, frame_hw=(180, 320), mesh=None)
    frames = np.random.default_rng(2).integers(
        0, 255, (2, 180, 320, 3), dtype=np.uint8
    )
    results = ms.process_batch(frames)
    assert len(results) == 2

    # per-stream detections equal the single-frame nms_free facade path
    yolo.DetectFrame(frames[0])
    single = [(o.tolist(), round(o.conf, 5)) for o in yolo.object_info]
    batched = [
        (o.tolist(), round(o.conf, 5)) for o in results[0]["objects"]
    ]
    assert single == batched


def test_multistream_efficientdet_batched():
    """BASELINE config 5 as written: EfficientDet in the batched
    multi-stream step (reference's interchangeable second detector,
    ObjectDetector/efficientdetDetector.py:38-83).  The batched bgr-path
    detections must equal the facade's own DetectFrame."""
    from adas_tpu.perception.efficientdet_detector import (
        EfficientdetDetector,
    )

    eff = EfficientdetDetector(
        model_path=None, compound=0, input_size=128, box_score=0.05,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    ms = MultiStreamADAS(eff, lane, 2, frame_hw=(180, 320), mesh=None)
    frames = np.random.default_rng(4).integers(
        0, 255, (2, 180, 320, 3), dtype=np.uint8
    )
    results = ms.process_batch(frames)
    assert len(results) == 2
    for r in results:
        assert {"objects", "tracks", "collision", "offset"} <= set(r)

    eff.DetectFrame(frames[0])
    single = [(o.label, round(o.conf, 5)) for o in eff.object_info]
    batched = [
        (o.label, round(o.conf, 5)) for o in results[0]["objects"]
    ]
    assert single == batched
    assert len(single) > 0  # the scenario actually detects something

    # i420 transport: chroma subsampling perturbs values slightly but the
    # pipeline must serve end to end
    ms2 = MultiStreamADAS(
        eff, lane, 2, frame_hw=(180, 320), mesh=None, transport="i420"
    )
    r2 = ms2.process_batch(frames)
    assert len(r2) == 2


def test_multistream_efficientdet_over_mesh():
    """EfficientDet DP-shards over the 8-virtual-device mesh like YOLO."""
    from adas_tpu.perception.efficientdet_detector import (
        EfficientdetDetector,
    )

    eff = EfficientdetDetector(
        model_path=None, compound=0, input_size=128, box_score=0.05,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    mesh = make_mesh(8, model_parallel=1)
    ms = MultiStreamADAS(eff, lane, 8, frame_hw=(180, 320), mesh=mesh)
    frames = np.random.default_rng(6).integers(
        0, 255, (8, 180, 320, 3), dtype=np.uint8
    )
    results = ms.process_batch(frames)
    assert len(results) == 8


def test_serve_pipelined_matches_sequential():
    """The 3-stage pipeline (upload thread / dispatch / fetch+analytics
    thread) produces the SAME ordered per-tick signals as sequential
    process_batch ticks — overlap must not reorder or corrupt the
    per-stream tracker/conditions state."""

    def build():
        yolo = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
            input_size=(160, 160), box_score=0.25,
        )
        lane = UltrafastLaneDetectorV2(
            model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
        )
        return MultiStreamADAS(yolo, lane, 2, frame_hw=(180, 320), mesh=None)

    rng = np.random.default_rng(11)
    ticks = [
        rng.integers(0, 255, (2, 180, 320, 3), dtype=np.uint8)
        for _ in range(4)
    ]

    def digest(results):
        return [
            (
                [(o.label, round(o.conf, 4)) for o in r["objects"]],
                r.get("tracks"),
            )
            for r in results
        ]

    ms_seq = build()
    expected = [digest(ms_seq.process_batch(f)) for f in ticks]

    ms_pipe = build()
    got = {}
    n = ms_pipe.serve_pipelined(
        iter(ticks), depth=2,
        on_result=lambda i, res: got.__setitem__(i, digest(res)),
    )
    assert n == len(ticks)
    assert sorted(got) == list(range(len(ticks)))  # in-order, complete
    assert [got[i] for i in range(len(ticks))] == expected


def test_multistream_step_artifact_roundtrip(tmp_path):
    """The WHOLE pipeline's device work serves from one .adas file:
    export a weighted pipeline, rebuild with facades whose weights are
    then corrupted, and the artifact-served pipeline still reproduces
    the exporter's outputs tick for tick — every weight, the preprocess,
    decode and NMS ride the artifact (the pipeline-scale analogue of the
    reference's .trt engines, convertOnnxToTensorRT.py:150-173)."""
    import jax

    def facades():
        yolo = YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV8, scale="n",
            input_size=(160, 160), box_score=0.25,
        )
        lane = UltrafastLaneDetectorV2(
            model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
        )
        return yolo, lane

    kw = dict(
        frame_hw=(180, 320), host_downscale=(88, 160), transport="i420",
    )
    yolo, lane = facades()
    ms = MultiStreamADAS(yolo, lane, 2, **kw)
    path = str(tmp_path / "pipeline.adas")
    meta = ms.export_fused(path)
    assert meta["kind"] == "multistream" and "pack_tree" in meta

    rng = np.random.default_rng(21)
    ticks = [
        rng.integers(0, 255, (2, 180, 320, 3), dtype=np.uint8)
        for _ in range(2)
    ]

    def digest(results):
        return [
            (
                [(o.label, round(o.conf, 4), o.tolist()) for o in r["objects"]],
                r.get("tracks"),
            )
            for r in results
        ]

    expected = [digest(ms.process_batch(f)) for f in ticks]

    y2, l2 = facades()
    # corrupt the fresh facades' weights: serving must not consult them
    y2.variables = jax.tree_util.tree_map(lambda a: a * 0, y2.variables)
    l2.variables = jax.tree_util.tree_map(lambda a: a * 0, l2.variables)
    ms2 = MultiStreamADAS(y2, l2, 2, step_artifact=path, **kw)
    got = [digest(ms2.process_batch(f)) for f in ticks]
    assert got == expected

    # config mismatch is rejected loudly
    y3, l3 = facades()
    with pytest.raises(ValueError, match="artifact was built"):
        MultiStreamADAS(
            y3, l3, 4, frame_hw=(180, 320), host_downscale=(88, 160),
            transport="i420", step_artifact=path,
        )


def test_multistream_artifact_efficientdet(tmp_path):
    """The pipeline artifact also covers the EfficientDet object side
    (BASELINE config 5 names both detectors)."""
    from adas_tpu.perception.efficientdet_detector import (
        EfficientdetDetector,
    )

    eff = EfficientdetDetector(
        model_path=None, compound=0, input_size=128, box_score=0.05,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_TUSIMPLE
    )
    kw = dict(frame_hw=(180, 320), transport="bgr")
    ms = MultiStreamADAS(eff, lane, 2, **kw)
    path = str(tmp_path / "ed_pipe.adas")
    ms.export_fused(path)
    frames = np.random.default_rng(4).integers(
        0, 255, (2, 180, 320, 3), dtype=np.uint8
    )
    expected = [
        [(o.label, round(o.conf, 4)) for o in r["objects"]]
        for r in ms.process_batch(frames)
    ]
    ms2 = MultiStreamADAS(eff, lane, 2, step_artifact=path, **kw)
    got = [
        [(o.label, round(o.conf, 4)) for o in r["objects"]]
        for r in ms2.process_batch(frames)
    ]
    assert got == expected and any(len(g) for g in got)
