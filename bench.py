"""Decision-grade ADAS benchmark (BASELINE.md configs; prints ONE JSON line).

Measures three things on the flagship multi-stream pipeline (N simulated
720p feeds through ONE batched fused device step — YOLOv8 + UFLDv2-CULane
bf16, I420 transport, decode+NMS on device, full host analytics per
stream):

- ``e2e_fps``      — software-pipelined end-to-end throughput (headline
                     ``value``; includes host prep, transfers, analytics).
- ``compute_fps``  — pure TPU compute: the fused step chained ``iters``
                     times on device-resident input inside one dispatch
                     (``MultiStreamADAS.make_compute_probe``), so tunnel
                     bandwidth and per-dispatch latency are excluded.
                     This is the number a locally-attached chip could
                     approach end-to-end.
- ``stages_ms``    — p50/p95 wall-clock per stage of an UNpipelined tick:
                     host_prep / upload / compute / fetch / host_analytics
                     (the reference's per-stage timers, demo.py:268-281,
                     promoted to percentiles).

``ADAS_BENCH_FULL=1`` additionally measures BASELINE configs 1-3
individually (YOLOv5n single-image, UFLDv2 single-frame, YOLOv8l +
ByteTrack 720p) and reports their p50 latency / fps under ``configs``.

vs_baseline = e2e_fps / 300 (the ≥300 FPS north star from BASELINE.json;
the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import os
import time


import numpy as np

SCALE = os.environ.get("ADAS_BENCH_SCALE", "l")
N_STREAMS = int(os.environ.get("ADAS_BENCH_STREAMS", "8"))
N_TICKS = int(os.environ.get("ADAS_BENCH_TICKS", "30"))
DEPTH = int(os.environ.get("ADAS_BENCH_DEPTH", "0"))  # 0 = adaptive
COMPUTE_ITERS = int(os.environ.get("ADAS_BENCH_COMPUTE_ITERS", "30"))
FULL = os.environ.get("ADAS_BENCH_FULL", "0") == "1"
DOWNSCALE = os.environ.get("ADAS_BENCH_DOWNSCALE", "auto")
#: headline serving precision: "int8" (calibrated + packed — the
#: TRT-grade static pipeline, fastest measured) or "bf16"
DTYPE = os.environ.get("ADAS_BENCH_DTYPE", "int8")
#: max seconds to wait for the accelerator backend to come up before
#: the first device op (the tunneled plugin flakes: backend init has
#: been observed to hang ~18 min then raise UNAVAILABLE; a bench that
#: crashes on a transient outage records nothing)
WAIT_S = float(os.environ.get("ADAS_BENCH_WAIT", "1500"))
BASELINE_FPS = 300.0


def wait_for_backend(max_wait_s: float = WAIT_S) -> None:
    """Block until a JAX backend can actually run a device op.

    Probes in a SUBPROCESS: a failed PJRT plugin init poisons the
    in-process backend cache, so retrying must happen before this
    process touches jax.  Each probe gets a generous timeout (tunnel
    init alone can take minutes); failures back off and retry until
    ``max_wait_s`` is spent, then fall through and let the real run
    raise loudly."""
    import subprocess
    import sys

    probe = (
        "import jax, jax.numpy as jnp; "
        "print(float(jnp.ones((3,), jnp.float32).sum()))"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        budget = max(min(600.0, deadline - time.monotonic()), 60.0)
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=budget,
                capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"# wait_for_backend: gave up after {attempt} probes "
                f"({max_wait_s:.0f}s) — proceeding (will raise)",
                flush=True,
            )
            return
        print(
            f"# wait_for_backend: probe {attempt} failed, retrying",
            flush=True,
        )
        time.sleep(30.0)

#: adaptive host downscale ladder (I420 transport, bytes/frame =
#: h*w*1.5): picked by the measured tunnel bandwidth so upload never
#: dominates the tick.  The deep entries exist for degraded tunnels
#: (sustained rates down to ~3 MB/s observed): a slow link costs
#: resolution, never throughput collapse.
_DOWNSCALE_LADDER = [
    (360, 640), (324, 576), (288, 512), (252, 448), (216, 384),
    (180, 320), (144, 256),
]

#: accuracy floor for the adaptive planner (VERDICT r4 #3): the ladder
#: trades resolution for throughput, and below this rung the measured
#: decode drift vs the native-resolution path (adas_tpu/pipeline/
#: transport_parity.py; table in BASELINE.md r05) is no longer
#: acceptable — nothing used to stop the planner from serving a
#: geometry at which small objects are undetectable.  The planner never
#: picks a rung below the floor no matter how slow the link; a slower
#: tunnel costs pipeline depth instead.  Override: ADAS_TRANSPORT_FLOOR
#: ("HxW", must be a ladder entry; "none" disables).
_FLOOR_ENV = os.environ.get("ADAS_TRANSPORT_FLOOR", "180x320")
if _FLOOR_ENV == "none":
    _DOWNSCALE_FLOOR = _DOWNSCALE_LADDER[-1]
else:
    _h, _w = _FLOOR_ENV.split("x")
    _DOWNSCALE_FLOOR = (int(_h), int(_w))
    if _DOWNSCALE_FLOOR not in _DOWNSCALE_LADDER:
        raise ValueError(
            f"ADAS_TRANSPORT_FLOOR {_FLOOR_ENV} is not a ladder rung"
        )


def probe_bandwidth_mbps(size_mb: float = 2.0, reps: int = 3) -> float:
    """Measured host->device bandwidth (MB/s) through whatever attaches
    the chip (PCIe locally; the ~10-35 MB/s tunnel on the test rig).

    Each rep uploads a DISTINCT freshly-allocated random array: JAX
    caches device transfers of an unchanged host array, so re-putting
    one buffer measures the cache, not the link (observed 1311 "MB/s"
    on a 27 MB/s tunnel).  Random payload because a compressing
    transport would make zeros look fast."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    bufs = [
        rng.integers(0, 255, (int(size_mb * 1e6),), dtype=np.uint8)
        for _ in range(reps + 1)
    ]
    tiny = [
        rng.integers(0, 255, (1024,), dtype=np.uint8)
        for _ in range(reps + 1)
    ]

    def put(buf) -> float:
        # float(sum()) forces the bytes onto the device: on the
        # tunneled plugin, block_until_ready on a fresh transfer can
        # return before the data actually moves
        t0 = time.perf_counter()
        float(jnp.asarray(buf).sum())
        return time.perf_counter() - t0

    put(bufs[0])
    put(tiny[0])  # warm both shapes (compiles the sum)
    big = min(put(b) for b in bufs[1:])
    floor = min(put(t) for t in tiny[1:])  # dispatch+fetch latency
    return size_mb / max(big - floor, 1e-3)


def probe_sustained_mbps(tick_mb: float, reps: int = 6) -> float:
    """Back-to-back sustained host->device rate (MB/s) at the actual
    per-tick transfer size.  The single-buffer burst probe overstates
    what the tunnel delivers tick after tick by up to ~5x (observed
    35 MB/s burst vs ~7 MB/s sustained in the same minute); planning
    the transport from the burst number is exactly how round 2 lost
    its e2e to the transport.  Distinct random buffers (put caching,
    compressing transports), forced use per put; the per-put dispatch
    floor is left IN, which under-reports slightly — conservative is
    the right direction for a planner."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = max(int(tick_mb * 1e6), 1)
    bufs = [
        rng.integers(0, 255, (n,), dtype=np.uint8) for _ in range(reps + 1)
    ]
    float(jnp.asarray(bufs[0]).sum())  # warm the shape
    t0 = time.perf_counter()
    for b in bufs[1:]:
        float(jnp.asarray(b).sum())
    return reps * tick_mb / max(time.perf_counter() - t0, 1e-6)


def choose_transport(bw_mbps: float, n_streams: int, factor: float = 0.6):
    """(host_downscale, depth): largest ladder entry whose per-tick
    upload fits a ~110 ms budget at ``factor`` x the measured bandwidth,
    depth sized so uploads stay ahead of fetch+analytics.  A
    persistently slow tunnel costs resolution, never throughput
    collapse (the round-2 regression this adaptivity exists to
    prevent).  ``factor``: 0.6 against a burst probe, 0.85 against a
    measured sustained rate."""
    budget_s = 0.110
    plan_bw = factor * bw_mbps
    floor_idx = _DOWNSCALE_LADDER.index(_DOWNSCALE_FLOOR)
    for hw in _DOWNSCALE_LADDER[: floor_idx + 1]:
        mb = hw[0] * hw[1] * 1.5 * n_streams / 1e6
        if mb / max(plan_bw, 1e-6) <= budget_s:
            return hw, 3
    # nothing above the accuracy floor fits the budget: serve the floor
    # rung with extra pipeline depth — a slow link may cost latency but
    # never detection quality beyond the documented bound
    return _DOWNSCALE_FLOOR, 4


def plan_transport(n_streams: int):
    """Two-stage transport plan: burst probe picks a candidate tick
    size, a sustained probe AT that size (the quantity that actually
    bounds pipelined throughput) makes the final pick.  Returns
    (downscale, depth, burst_mbps, sustained_mbps)."""
    burst = probe_bandwidth_mbps()
    hw, depth = choose_transport(burst, n_streams)
    tick_mb = hw[0] * hw[1] * 1.5 * n_streams / 1e6
    sustained = probe_sustained_mbps(tick_mb)
    hw, depth = choose_transport(sustained, n_streams, factor=0.85)
    return hw, depth, burst, sustained


def _calibrated(variables) -> bool:
    """True when the variables tree carries calibrated activation
    scales (the static-int8 serving precondition)."""
    return bool(
        isinstance(variables, dict) and "act_scales" in variables
    )


def _pipelined_fps(ms, batches, depth: int) -> float:
    """Software-pipelined throughput via MultiStreamADAS.serve_pipelined
    (3 stages: upload thread / dispatch / fetch+analytics thread), so
    the steady-state tick is max(upload, fetch+analytics) rather than
    upload + fetch + analytics."""

    def run_window() -> float:
        t0 = time.perf_counter()
        ms.serve_pipelined(
            (batches[i % len(batches)] for i in range(N_TICKS)),
            depth=depth,
        )
        return time.perf_counter() - t0

    # best of 5 windows: tunnel throughput to the test chip is noisy
    dt = min(run_window() for _ in range(5))
    return N_TICKS * N_STREAMS / dt


def _compute_fps(ms, batches) -> float:
    """Device-resident chained-step throughput via a TWO-POINT
    measurement: identical probes at N and 2N chained iterations, fps =
    N·streams / (t_2N − t_N).  Dispatch latency and the packed-output
    fetch cancel in the difference — no no-op floor estimate involved."""
    import jax
    import jax.numpy as jnp

    p1 = ms.make_compute_probe(COMPUTE_ITERS)
    p2 = ms.make_compute_probe(2 * COMPUTE_ITERS)
    x = jnp.asarray(ms._host_prep(batches[0]))
    yv, lv = ms.yolo.variables, ms.lane.variables

    def best_of(probe, reps: int = 3) -> float:
        # float() forces the host fetch: on the tunneled plugin
        # block_until_ready alone can return before execution completes,
        # which would overstate throughput
        float(probe(yv, lv, x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(probe(yv, lv, x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_of(p1), best_of(p2)
    return COMPUTE_ITERS * N_STREAMS / max(t2 - t1, 1e-6)


#: pinned probe geometry for ``compute_fps_fixed`` (VERDICT r4 #2): the
#: adaptive planner couples ``compute_fps`` to whatever transport the
#: tunnel weather picked (device-side resize work shrinks with the
#: frame), so round-over-round compute progress was unfalsifiable from
#: the JSONs alone (r04: 499.05 at (180,320); r03: 464.22 at (360,640)).
#: This row measures the SAME two-point chained probe at a fixed
#: (360, 640) transport and 640x640 model input every round.
_FIXED_GEOMETRY = (360, 640)


def _fixed_compute_row(yolo, lane, batches, ms_headline, downscale):
    """compute_fps at the pinned geometry, reusing the headline pipeline
    when the planner happened to pick it."""
    from adas_tpu.pipeline.multistream import MultiStreamADAS

    if tuple(downscale) == _FIXED_GEOMETRY:
        ms = ms_headline
    else:
        ms = MultiStreamADAS(
            yolo, lane, N_STREAMS, frame_hw=(720, 1280),
            host_downscale=_FIXED_GEOMETRY, transport="i420",
        )
        ms.process_batch(batches[0])  # compile + settle
    return {
        "fps": round(_compute_fps(ms, batches), 2),
        "transport": list(_FIXED_GEOMETRY),
        "model_input": [640, 640],
    }


def _staged(ms, batches, ticks: int = 12) -> dict:
    """Unpipelined per-stage p50/p95 (upload/compute/fetch split)."""
    import jax
    import jax.numpy as jnp

    from adas_tpu.utils.profiling import StageTimers

    timers = StageTimers()
    for i in range(ticks):
        frames = batches[i % len(batches)]
        with timers.stage("host_prep"):
            prep = ms._host_prep(frames)
        with timers.stage("upload"):
            x = jax.block_until_ready(jnp.asarray(prep))
        with timers.stage("compute"):
            h = jax.block_until_ready(
                ms._step(ms.yolo.variables, ms.lane.variables, x)
            )
        with timers.stage("fetch"):
            flat = ms._fetch_flat(h)
        with timers.stage("host_analytics"):
            ms._analytics(flat, frames)
    # tracker load: mean valid detections per frame entering ByteTrack
    # (random-weight sigmoid scores cluster ~0.5, so the max_det cap is
    # typically saturated — i.e. the bench exercises WORST-CASE host
    # tracker/NMS-consumer density, not an empty-scene best case)
    from adas_tpu.ops.packing import unpack

    spec = ms._spec_holder["spec"]
    dets_per_frame = float(
        np.mean(
            [
                len(ms.yolo._dets_to_rectinfo(np.asarray(unpack(flat[i], spec)[0])))
                for i in range(flat.shape[0])
            ]
        )
    )
    out = {
        k: {"p50": round(v["p50_ms"], 2), "p95": round(v["p95_ms"], 2)}
        for k, v in timers.summary().items()
    }
    out["dets_per_frame"] = round(dets_per_frame, 1)
    return out


def _latency_config(build_detector, frame, reps: int = 15) -> dict:
    det = build_detector()
    det.DetectFrame(frame)  # compile
    det.DetectFrame(frame)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        det.DetectFrame(frame)
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    return {"p50_ms": round(p50 * 1000, 2), "fps": round(1.0 / p50, 2)}


def _full_configs(rng) -> dict:
    """BASELINE configs 1-3, measured individually."""
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.tracking import BYTETracker
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    out = {}
    frame640 = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
    frame720 = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)

    out["c1_yolov5n_640"] = _latency_config(
        lambda: YoloDetector(
            model_path=None, model_type=ObjectModelType.YOLOV5,
            scale="n", input_size=(640, 640), compute_dtype="bf16",
        ),
        frame640,
    )
    out["c2_ufldv2_culane"] = _latency_config(
        lambda: UltrafastLaneDetectorV2(
            model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        ),
        frame720,
    )

    det = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV8, scale="l",
        input_size=(640, 640), compute_dtype="bf16", box_score=0.25,
    )
    tracker = BYTETracker(names=dict(det.colors_dict))
    det.DetectFrame(frame720)
    times = []
    for _ in range(15):
        t0 = time.perf_counter()
        det.DetectFrame(frame720)
        objs = det.object_info
        boxes = [o.tolist(format_type="xyxy") for o in objs]
        tracker.update(
            np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray([o.conf for o in objs], np.float64),
            [o.label for o in objs],
            frame720,
        )
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    out["c3_yolov8l_bytetrack_720p"] = {
        "p50_ms": round(p50 * 1000, 2), "fps": round(1.0 / p50, 2)
    }
    out.update(_config5(rng))
    return out


def _config5(rng) -> dict:
    """BASELINE config 5: 8 streams of int8 YOLOv10 served NMS-free (the
    one-to-one head, no NMS stage) + UFLDv2, plus EfficientDet-D0
    single-image latency."""
    import jax.numpy as jnp

    from adas_tpu.perception.efficientdet_detector import (
        EfficientdetDetector,
    )
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    out = {}
    yolo = YoloDetector(
        model_path=None, model_type=ObjectModelType.YOLOV10, scale="s",
        input_size=(640, 640), box_score=0.25,
        compute_dtype="int8", nms_free=True,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        # round 3: the calibrated+packed int8 trunk now BEATS bf16 on
        # the lane side too (7.89 vs 8.48 ms microbench), so config 5
        # serves fully int8
        dtype="int8",
    )
    downscale, depth, _, _ = plan_transport(N_STREAMS)
    import cv2

    dh, dw = downscale
    calib = [
        cv2.resize(rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8),
                   (dw, dh))
        for _ in range(2)
    ]
    yolo.calibrate_int8(calib)
    lane.calibrate_int8(calib)
    ms = MultiStreamADAS(
        yolo, lane, N_STREAMS, frame_hw=(720, 1280),
        host_downscale=downscale, transport="i420",
    )
    batches = [
        rng.integers(0, 255, (N_STREAMS, 720, 1280, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    for b in batches:
        ms.process_batch(b)
    out["c5_v10s_int8_nmsfree_8streams"] = {
        "e2e_fps": round(_pipelined_fps(ms, batches, depth), 2),
        "compute_fps": round(_compute_fps(ms, batches), 2),
    }

    # config 5 names EfficientDet as the second detector
    # (reference: ObjectDetector/efficientdetDetector.py:38-83); serve it
    # BATCHED in the same 8-stream fused step, int8 policy applied
    eff = EfficientdetDetector(
        model_path=None, compound=0, box_score=0.3, compute_dtype="int8",
    )
    eff.calibrate_int8(calib)
    ms_e = MultiStreamADAS(
        eff, lane, N_STREAMS, frame_hw=(720, 1280),
        host_downscale=downscale, transport="i420",
    )
    for b in batches:
        ms_e.process_batch(b)
    out["c5_efficientdet_d0_int8_8streams"] = {
        "e2e_fps": round(_pipelined_fps(ms_e, batches, depth), 2),
        "compute_fps": round(_compute_fps(ms_e, batches), 2),
    }

    frame = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
    out["c5_efficientdet_d0"] = _latency_config(
        lambda: EfficientdetDetector(compound=0, box_score=0.3), frame
    )
    out["c5_efficientdet_d0_int8"] = _latency_config(
        lambda: EfficientdetDetector(
            compound=0, box_score=0.3, compute_dtype="int8"
        ),
        frame,
    )
    out["c5_onnx_exec_v8n_8streams"] = _config5_onnx(rng, downscale, depth)
    return out


def _config5_onnx(rng, downscale, depth) -> dict:
    """ONNX-sourced fused serving (VERDICT r4 #5): export YOLOv8n to
    .onnx (tools/onnx_export.py), load it back through the facade's
    graph executor, and serve it INSIDE the fused multistream step
    (multistream._ExecutorNet) — "any export runs at native speed" is
    the L0 promise (reference coreEngine.py:159-186), measured on the
    serving path, not just facade calls."""
    import tempfile

    import jax.numpy as jnp

    from adas_tpu.models.yolo import YoloSpec, build_yolo
    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.tools.onnx_export import export_fn_to_onnx
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    spec = YoloSpec(
        family="v8", scale="n", num_classes=80, input_size=(640, 640)
    )
    net = build_yolo(spec)
    import jax

    v = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)
    )

    def fn(xin):
        return net.apply(v, jnp.transpose(xin, (0, 2, 3, 1)))

    path = tempfile.mktemp(suffix=".onnx")
    export_fn_to_onnx(
        fn, [jnp.zeros((1, 3, 640, 640), jnp.float32)], path,
        ["images"], ["output0"],
    )
    yolo = YoloDetector(
        model_path=path, model_type=ObjectModelType.YOLOV8,
        onnx_mode="graph", box_score=0.25,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
    )
    ms = MultiStreamADAS(
        yolo, lane, N_STREAMS, frame_hw=(720, 1280),
        host_downscale=downscale, transport="i420",
    )
    batches = [
        rng.integers(0, 255, (N_STREAMS, 720, 1280, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    for b in batches:
        ms.process_batch(b)
    return {
        "e2e_fps": round(_pipelined_fps(ms, batches, depth), 2),
        "compute_fps": round(_compute_fps(ms, batches), 2),
    }


def main() -> None:
    from adas_tpu.engine.xla_engine import enable_persistent_cache

    enable_persistent_cache()
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        wait_for_backend()
    else:
        # CPU-pinned smoke runs: keep the tunneled-TPU plugin from
        # initializing in-process (it hangs when the tunnel is down and
        # destabilizes the CPU backend — __graft_entry__.py pattern)
        import jax
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from adas_tpu.perception.lane_detector import UltrafastLaneDetectorV2
    from adas_tpu.perception.object_detector import YoloDetector
    from adas_tpu.pipeline.multistream import MultiStreamADAS
    from adas_tpu.utils.types import LaneModelType, ObjectModelType

    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 255, (N_STREAMS, 720, 1280, 3), dtype=np.uint8)
        for _ in range(4)
    ]

    # adapt the transport to the measured link BEFORE building the
    # pipeline: a slow tunnel costs resolution, not throughput
    if DOWNSCALE == "auto":
        downscale, depth, bw, sustained = plan_transport(N_STREAMS)
    else:
        h, w = DOWNSCALE.split("x")
        downscale, depth = (int(h), int(w)), 3
        bw = probe_bandwidth_mbps()
        sustained = probe_sustained_mbps(
            downscale[0] * downscale[1] * 1.5 * N_STREAMS / 1e6
        )
    if DEPTH:
        depth = DEPTH

    yolo = YoloDetector(
        model_path=None,
        model_type=ObjectModelType.YOLOV8,
        scale=SCALE,
        box_score=0.25,
        input_size=(640, 640),
        compute_dtype=DTYPE,
    )
    lane = UltrafastLaneDetectorV2(
        model_path=None, model_type=LaneModelType.UFLDV2_CULANE,
        dtype=jnp.bfloat16 if DTYPE == "bf16" else DTYPE,
    )
    if DTYPE == "int8":
        # static activation scales (TRT-calibrator analogue) so the
        # fused step runs the fully static int8 pipeline; frames at the
        # serving (downscaled) geometry
        import cv2

        dh, dw = downscale
        calib = [
            cv2.resize(batches[0][i], (dw, dh)) for i in range(2)
        ]
        yolo.calibrate_int8(calib)
        lane.calibrate_int8(calib)
    def build_warm(ds):
        # serving-path provenance: the trace-time counters attribute
        # exactly which kernel paths the compiled step contains
        # (VERDICT r3: a headline number must say what served it)
        from adas_tpu.models import layers as L
        from adas_tpu.ops import pallas_stem as PS

        L.reset_trace_stats()
        PS.reset_stem_stats()
        m = MultiStreamADAS(
            yolo, lane, N_STREAMS, frame_hw=(720, 1280),
            host_downscale=ds, transport="i420",
        )
        for b in batches:  # compile + settle the transport path
            m.process_batch(b)
        from adas_tpu.ops import pallas_block as PBK

        m.provenance = {
            "s8_chain_enabled": L._S8_CHAIN,
            "pallas_conv_policy": __import__(
                "adas_tpu.ops.pallas_conv", fromlist=["x"]
            ).pallas_conv_policy(),
            "pallas_block_policy": PBK.pallas_block_policy(),
            "pallas_block_layout": PBK.block_layout(),
            "pallas_stem": dict(PS.STEM_STATS),
            **L.trace_stats(),
            "calibrated": {
                "yolo": _calibrated(yolo.variables),
                "lane": _calibrated(lane.variables),
            },
        }
        return m

    ms = build_warm(downscale)
    stages = _staged(ms, batches)
    # the sustained probe ran before any compile; if the realized
    # per-tick upload still blows the ~110 ms budget (tunnel drifted),
    # drop one ladder rung and keep the better measurement — a slow
    # link costs resolution, never throughput collapse
    stepped_down = False
    if DOWNSCALE == "auto":
        idx = (
            _DOWNSCALE_LADDER.index(downscale)
            if downscale in _DOWNSCALE_LADDER
            else -1
        )
        if (
            stages["upload"]["p50"] > 1.3 * 110.0
            and 0 <= idx < _DOWNSCALE_LADDER.index(_DOWNSCALE_FLOOR)
        ):
            downscale = _DOWNSCALE_LADDER[idx + 1]
            stepped_down = True
            ms = build_warm(downscale)
            stages = _staged(ms, batches)

    # accuracy drift of the CHOSEN rung vs the native-resolution path
    # on the same frames (transport_parity module; the reference never
    # trades resolution for throughput — demo.py:263-269 — so when we
    # do, the bench says by how much).  Failure here must not cost the
    # throughput capture: record the error string instead.
    try:
        from adas_tpu.pipeline.transport_parity import (
            measure_transport_drift,
        )

        drift = measure_transport_drift(
            yolo, lane, [batches[0][i] for i in range(3)], downscale
        )
    except Exception as e:  # pragma: no cover - capture robustness
        drift = {"error": f"{type(e).__name__}: {e}"}

    record = {
        "metric": "e2e_fps",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "streams": N_STREAMS,
        "dtype": DTYPE,
        "tunnel_mbps": round(bw, 1),
        "tunnel_sustained_mbps": round(sustained, 1),
        "transport": {
            "downscale": list(downscale),
            "depth": depth,
            "stepped_down": stepped_down,
            "floor": list(_DOWNSCALE_FLOOR),
            "parity_drift": drift,
        },
        "compute_fps": round(_compute_fps(ms, batches), 2),
        # pinned-geometry row: comparable round over round regardless of
        # what the adaptive planner picked for e2e
        "compute_fixed": _fixed_compute_row(
            yolo, lane, batches, ms, downscale
        ),
        "stages_ms": stages,
        # which kernel paths the compiled step actually contains —
        # counted at trace time, so these attribute THIS run's graphs
        "provenance": ms.provenance,
    }
    fps = _pipelined_fps(ms, batches, depth)
    record["value"] = round(fps, 2)
    record["vs_baseline"] = round(fps / BASELINE_FPS, 3)
    if FULL:
        record["configs"] = _full_configs(rng)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
