"""Multi-stream ADAS: N video feeds through ONE batched, mesh-sharded
device step (BASELINE.md config 5, SURVEY.md §2.3).

The per-frame fused computation (YOLO + UFLDv2, pipeline/fused.py) is
vmapped over a stream batch and jitted with the batch dim sharded over the
``data`` mesh axis — pure DP, exact, no collectives at inference.  All
cross-frame state (trackers, distance, task conditions, BEV calibration)
is host-side *per stream*, mirroring the single-stream pipeline.
"""
from __future__ import annotations

import contextlib
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..analytics import (
    PerspectiveTransformation,
    SingleCamDistanceMeasure,
    TaskConditions,
)
from ..ops.packing import pack, unpack
from ..ops.preprocess import (
    LetterboxGeometry,
    bgr_to_i420,
    i420_to_bgr,
    i420_to_bgr_planar,
    imagenet_preprocess,
    imagenet_preprocess_planar,
    ufld_v2_preprocess,
    ufld_v2_preprocess_planar,
    ufld_v2_preprocess_planes,
    ufld_v2_preprocess_planes_yuv,
    yolo_preprocess,
    yolo_preprocess_planar,
    yolo_preprocess_planes,
    yolo_preprocess_planes_yuv,
)
from ..ops.ufld_decode import ufld_v2_decode
from ..ops.yolo_decode import (
    decode_predictions,
    detections_to_original,
    select_and_nms,
)
from ..tracking import BYTETracker
from ..utils.types import LaneInfo


class StreamState:
    """Host-side temporal state for one video feed.

    Every holder is per-stream — including ``lane_info``, so consumers
    can render each stream's lanes and no state bleeds across feeds."""

    def __init__(self, frame_size, colors_dict):
        self.tracker = BYTETracker(names=dict(colors_dict))
        self.distance = SingleCamDistanceMeasure()
        self.conditions = TaskConditions()
        self.perspective = PerspectiveTransformation(frame_size)
        self.lane_info = LaneInfo()


class _ExecutorNet:
    """Adapter presenting an ONNX graph executor
    (engine/onnx_engine.OnnxGraphEngine) with the native net's
    ``apply(variables, x_nhwc)`` seam, so the fused multistream step
    serves an exported ``.onnx`` graph exactly like a native flax graph
    (one jitted step, device-resident, batched over streams).  The
    executor's traceable prefix is the whole graph — a host tail
    (NonMaxSuppression/NonZero) cannot ride the fused step."""

    #: the fused preprocess's polyphase/planes fast paths are native-
    #: graph features; the executor takes the plain NHWC input
    stem_s2d_ok = False
    stem_planes_margins = None

    def __init__(self, engine):
        from ..engine.onnx_engine import OnnxGraphEngine

        if not isinstance(engine, OnnxGraphEngine):
            raise TypeError(
                "fused serving of an engine-backed detector requires an "
                f"OnnxGraphEngine, got {type(engine).__name__}"
            )
        if engine._tail:
            raise ValueError(
                "ONNX graph has a dynamic host tail (NonMaxSuppression/"
                "NonZero) — it cannot serve inside the fused device "
                "step; re-export without the embedded NMS"
            )
        self._fn = engine._make_prefix_fn()
        self._in_dtype = jnp.dtype(engine.engine_dtype)
        self.dtype = self._in_dtype

    def apply(self, variables, x):
        # fused-step preprocess emits NHWC; exported graphs take the
        # reference NCHW layout (convertPytorchToONNX.py:71-75)
        xin = jnp.transpose(x, (0, 3, 1, 2)).astype(self._in_dtype)
        return self._fn(variables, xin)[0]


class MultiStreamADAS:
    """Batch-of-streams pipeline over a (data, model) mesh."""

    def __init__(
        self,
        yolo,
        lane,
        n_streams: int,
        frame_hw: Sequence[int],
        mesh: Optional[Mesh] = None,
        host_downscale: Optional[Sequence[int]] = None,
        transport: str = "bgr",
        step_artifact: Optional[str] = None,
    ):
        # Design note (round 5, VERDICT r4 #4): the round-3 "device-KF"
        # mode — the trackers' batched KF predict (ops/kalman_jax.py)
        # riding the fused device step — is RETIRED from serving.  Its
        # predict had to see the tracker state its own fetch updates, so
        # submits could never pipeline (depth-1 only, measured 39.9 fps
        # vs 96.5 pipelined host-KF, r03); predicting from d-tick-stale
        # state under pipelining is not "late", it is WRONG — the d
        # interleaved host measurement updates are missing from the
        # state the filter propagates (reference KF update seam:
        # /root/reference/ObjectTracker/byteTrack/dtypes/kalman_filter.py:155-192).
        # The host KF on <= 64 tracks is microseconds of batched numpy
        # einsums (tracking/kalman.py).  ops/kalman_jax.py and the
        # tracker's generic ``update(predicted=)`` seam remain as
        # tested library ops.
        self.yolo = yolo
        self.lane = lane
        self.n_streams = n_streams
        self.frame_hw = tuple(frame_hw)
        self.mesh = mesh
        #: see pipeline/fused.py: shrink upload bytes on tunneled TPUs
        self.host_downscale = tuple(host_downscale) if host_downscale else None
        self.transport = transport
        self.dev_hw = self.host_downscale or self.frame_hw
        self._spec_holder = {}
        self._uploader = None
        self._prep_pool = None
        h, w = self.frame_hw
        self.streams = [
            StreamState((w, h), yolo.colors_dict) for _ in range(n_streams)
        ]
        if step_artifact is not None:
            self._step = self._load_step_artifact(step_artifact)
        else:
            self._step = self._build()

    def _build(self):
        yolo, lane = self.yolo, self.lane
        src_h, src_w = self.dev_hw
        # the object side accepts YoloDetector OR EfficientdetDetector
        # (BASELINE config 5 names both; reference demo swaps them via
        # ObjectDetector/efficientdetDetector.py:38-83) — EfficientDet
        # letterboxes to a square input and decodes anchors+sigmoid
        # instead of the YOLO head decode
        from ..utils.types import ObjectModelType

        is_effdet = (
            getattr(yolo, "model_type", None) is ObjectModelType.EfficientDet
        )
        if not hasattr(yolo, "net"):
            # ONNX-graph-executed facade (object_detector.py extension
            # dispatch): the executor's jit-able prefix serves as the
            # net INSIDE the fused step — "any export runs at native
            # speed" is the L0 promise (reference coreEngine.py:159-186)
            # and it must hold on the serving path, not just for
            # facade-level single-model calls
            yolo.net = _ExecutorNet(yolo.engine)
            if not hasattr(yolo, "variables"):
                yolo.variables = yolo.engine._params
        if is_effdet:
            h = w = int(yolo.spec.input_size)
        else:
            h, w = yolo.spec.input_size
        geom = LetterboxGeometry(src_h, src_w, h, w)
        yspec, lspec = yolo.spec, lane.spec
        box_score = float(yolo.box_score)
        iou = float(getattr(yolo, "box_nms_iou", 0.45))
        max_det = int(getattr(yolo, "max_det", 100))
        model_type = yolo.model_type
        ynet, lnet = yolo.net, lane.net
        transport = self.transport
        spec_holder = self._spec_holder
        compute_dtype = getattr(yolo, "compute_dtype", None)
        # int8 mode ALSO takes bf16 input: the stem is bf16 by the
        # precision policy (int8_conv_eligible), so casting at the
        # preprocess epilogue is the same math as the in-stem promote
        # while halving the model-input tensor's HBM traffic (measured
        # ~1.0 ms/8-frame step of convert_element_type passes)
        in_dtype = (
            jnp.bfloat16
            if compute_dtype in ("bf16", "int8")
            else jnp.float32
        )
        lane_dtype = (
            jnp.bfloat16
            if getattr(lane, "_quant", None) == "int8"
            else lnet.dtype
        )
        # pre-space-to-depth stem input: the phase-split resize dots
        # emit the stem's polyphase layout directly (ops/preprocess),
        # when the net declares support and target dims are even
        s2d_y = (
            self.transport == "i420"
            and not is_effdet
            and getattr(ynet, "stem_s2d_ok", False)
            and h % 2 == 0
            and w % 2 == 0
        )
        s2d_l = (
            self.transport == "i420"
            and getattr(lnet, "stem_s2d_ok", False)
            and lspec.input_height % 2 == 0
            and lspec.input_width % 2 == 0
        )
        # Pallas fused stem (ops/pallas_stem.py): nets that declare halo
        # margins take S2DPlanes instead — conv+BN+act(+pool) run in one
        # kernel and the full-res stem activation never touches HBM.
        # NOT under a multi-device mesh: GSPMD has no partitioning rule
        # for the Mosaic custom call, so a data-sharded step would
        # either fail to partition or replicate the whole stream batch;
        # the planar s2d path (plain XLA) shards fine and keeps most of
        # the preprocess win.
        multi_dev = self.mesh is not None and self.mesh.size > 1
        planes_y = (
            getattr(ynet, "stem_planes_margins", None)
            if s2d_y and not multi_dev
            else None
        )
        planes_l = (
            getattr(lnet, "stem_planes_margins", None)
            if s2d_l and not multi_dev
            else None
        )

        # v10 one-to-one head: serve NMS-free (BASELINE config 5), same
        # branch the single-frame facade takes (object_detector.py)
        nms_free = bool(getattr(yolo, "nms_free", False))
        if nms_free and getattr(yspec, "family", None) != "v10":
            raise ValueError("nms_free serving requires a YOLOv10 model")

        def one(yolo_vars, lane_vars, frame_in):
            from ..models.layers import quantized

            quant = (
                quantized("int8")
                if compute_dtype == "int8"
                else contextlib.nullcontext()
            )
            if transport == "i420":
                # planar serving path: the I420 buffer is already
                # channel-major, so color-convert/resize/normalize keep
                # W in the 128-lane minor dim (channel-minor (H, W, 3)
                # wastes ~97% of every VPU lane) and transpose to NHWC
                # once, on the model-input-sized tensor (ops/preprocess).
                # When BOTH stems take S2DPlanes the color convert folds
                # into the resize dots (ops/preprocess YUV-direct) and no
                # full-res plane ever materializes.
                if planes_y and planes_l:
                    x = yolo_preprocess_planes_yuv(
                        frame_in, src_h, src_w, geom, dtype=in_dtype,
                        margins=planes_y,
                    )
                else:
                    bgr_p = i420_to_bgr_planar(frame_in, src_h, src_w)
                    if is_effdet:
                        x = imagenet_preprocess_planar(
                            bgr_p[None], geom, dtype=in_dtype
                        )
                    elif planes_y:
                        x = yolo_preprocess_planes(
                            bgr_p[None], geom, dtype=in_dtype,
                            margins=planes_y,
                        )
                    else:
                        x = yolo_preprocess_planar(
                            bgr_p[None], geom, dtype=in_dtype, s2d=s2d_y
                        )
            else:
                frame_bgr = frame_in
                if is_effdet:
                    x = imagenet_preprocess(
                        frame_bgr[None], geom, dtype=in_dtype
                    )
                else:
                    x = yolo_preprocess(
                        frame_bgr[None], geom, dtype=in_dtype
                    )
            if is_effdet:
                # anchors + per-class sigmoid are decoded inside the net
                # (models/efficientdet.py); score/argmax + fixed-shape
                # NMS match the facade's own step
                # (perception/efficientdet_detector.py:_build_step)
                with quant:
                    eboxes, cls_probs = ynet.apply(yolo_vars, x)
                eboxes = eboxes[0].astype(jnp.float32)
                cls_probs = cls_probs[0].astype(jnp.float32)
                dets = select_and_nms(
                    eboxes,
                    jnp.max(cls_probs, axis=-1),
                    jnp.argmax(cls_probs, axis=-1),
                    box_score=box_score, iou_threshold=iou,
                    max_det=max_det,
                )
            elif nms_free:
                with quant:
                    dets = ynet.apply(yolo_vars, x, method=ynet.one2one)[0]
                dets = dets.astype(jnp.float32)
                keep = dets[:, 4] >= box_score
                dets = (dets * keep[:, None].astype(jnp.float32))[:max_det]
            else:
                with quant:
                    raw = ynet.apply(yolo_vars, x)[0].astype(jnp.float32)
                boxes, scores, ids = decode_predictions(
                    raw, model_type, yspec.num_classes, yspec.input_size
                )
                dets = select_and_nms(
                    boxes, scores, ids, box_score=box_score,
                    iou_threshold=iou, max_det=max_det,
                )
            dets = detections_to_original(dets, geom)
            if transport == "i420" and planes_y and planes_l:
                lx = ufld_v2_preprocess_planes_yuv(
                    frame_in, src_h, src_w, lspec.input_height,
                    lspec.input_width, lspec.crop_ratio,
                    dtype=lane_dtype, margins=planes_l,
                )
            elif transport == "i420" and planes_l:
                lx = ufld_v2_preprocess_planes(
                    bgr_p[None], lspec.input_height, lspec.input_width,
                    lspec.crop_ratio, dtype=lane_dtype, margins=planes_l,
                )
            elif transport == "i420":
                lx = ufld_v2_preprocess_planar(
                    bgr_p[None], lspec.input_height, lspec.input_width,
                    lspec.crop_ratio, dtype=lane_dtype, s2d=s2d_l,
                )
            else:
                lx = ufld_v2_preprocess(
                    frame_bgr[None], lspec.input_height, lspec.input_width,
                    lspec.crop_ratio, dtype=lnet.dtype,
                )
            lane_quant = (
                quantized("int8")
                if getattr(lane, "_quant", None) == "int8"
                else contextlib.nullcontext()
            )
            with lane_quant:
                louts = lnet.apply(lane_vars, lx)
            louts = {k: v.astype(jnp.float32)[0] for k, v in louts.items()}
            lanes = ufld_v2_decode(
                {k: v[None] for k, v in louts.items()}
            )
            flat, pack_spec = pack((dets, lanes))
            spec_holder["spec"] = pack_spec
            return flat

        batched = jax.vmap(one, in_axes=(None, None, 0))
        self._batched = batched  # unjitted; compute probe wraps it

        if self.mesh is not None:
            in_ndim = 3 if self.transport == "i420" else 4
            in_batch = NamedSharding(
                self.mesh, P("data", *([None] * (in_ndim - 1)))
            )
            repl = NamedSharding(self.mesh, P())
            params_shard = jax.tree_util.tree_map(
                lambda _: repl, (self.yolo.variables, self.lane.variables)
            )
            in_sh = [params_shard[0], params_shard[1], in_batch]
            jitted = jax.jit(
                batched,
                in_shardings=tuple(in_sh),
                out_shardings=NamedSharding(self.mesh, P("data")),
            )
        else:
            jitted = jax.jit(batched)
        return jitted

    # ---- host orchestration ----

    def _host_prep(self, frames: np.ndarray) -> np.ndarray:
        """CPU-side transport prep: optional downscale + I420 encode.

        Per-frame cv2 work fans out over a small thread pool (cv2
        releases the GIL), shortening the uploader thread's cycle —
        prep is otherwise ~10-20 ms serial inside it."""
        def prep_one(f):
            if self.host_downscale and self.host_downscale != self.frame_hw:
                import cv2

                dh, dw = self.host_downscale
                f = cv2.resize(f, (dw, dh), interpolation=cv2.INTER_LINEAR)
            if self.transport == "i420":
                f = bgr_to_i420(f)
            return f

        if (
            self.transport == "i420"
            or (self.host_downscale and self.host_downscale != self.frame_hw)
        ):
            if self._prep_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._prep_pool = ThreadPoolExecutor(
                    max_workers=4, thread_name_prefix="adas-prep"
                )
            return np.stack(list(self._prep_pool.map(prep_one, frames)))
        return frames

    def _prep_upload(self, frames: np.ndarray):
        """Host transport prep + device upload; returns the device-
        resident input batch."""
        x = jnp.asarray(self._host_prep(frames))
        if self.mesh is not None:
            x = jax.device_put(
                x, NamedSharding(self.mesh, P("data", *([None] * (x.ndim - 1))))
            )
        return x

    def prefetch(self, frames: np.ndarray):
        """Run host prep + the device upload in a background thread so
        the (tunnel-bound) transfer overlaps this tick's fetch/analytics
        on the main thread — the double-buffered ``memcpy_htod_async``
        the reference's single CUDA stream never achieves
        (coreEngine.py:107-114).  Returns a Future; pass its ``result()``
        to :meth:`submit_device`."""
        if self._uploader is None:
            from concurrent.futures import ThreadPoolExecutor

            self._uploader = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="adas-upload"
            )
        return self._uploader.submit(self._prep_upload, frames)

    def submit_device(self, x):
        """Submit a device-resident prepped batch (see prefetch)."""
        return self._step(self.yolo.variables, self.lane.variables, x)

    def submit(self, frames: np.ndarray):
        """frames: (n_streams, H, W, 3) uint8 BGR."""
        assert frames.shape[0] == self.n_streams
        x = self._prep_upload(frames)
        return self._step(self.yolo.variables, self.lane.variables, x)

    def fetch(self, handle, frames: np.ndarray) -> List[dict]:
        """Block and run per-stream host analytics; returns signal dicts."""
        return self._analytics(self._fetch_flat(handle), frames)

    def _fetch_flat(self, handle) -> np.ndarray:
        """Device→host transfer of the packed per-stream outputs.

        Assembles shard-by-shard: one transfer per addressable shard (a
        single shard on one real chip).  Also sidesteps a sporadic PJRT
        CPU-client abort seen fetching 8-way sharded arrays whole."""
        by_start = {}
        for sh in handle.addressable_shards:
            start = sh.index[0].start or 0 if sh.index else 0
            by_start.setdefault(start, sh)  # dedupe model-axis replicas
        return np.concatenate(
            [np.asarray(by_start[k].data) for k in sorted(by_start)], axis=0
        )

    def _analytics(
        self, flat: np.ndarray, frames: np.ndarray
    ) -> List[dict]:
        """Host analytics per stream on the fetched packed tensor."""
        per_stream = [
            unpack(flat[i], self._spec_holder["spec"])
            for i in range(self.n_streams)
        ]
        results = []
        sy = self.frame_hw[0] / self.dev_hw[0]
        sx = self.frame_hw[1] / self.dev_hw[1]
        for i, stream in enumerate(self.streams):
            dets, lanes_i = per_stream[i]
            dets = np.asarray(dets).copy()
            dets[:, [0, 2]] *= sx
            dets[:, [1, 3]] *= sy
            objs = self.yolo._dets_to_rectinfo(dets)
            # point the (stateless-compute) lane facade at THIS stream's
            # holder so geometry never bleeds across feeds
            self.lane.lane_info = stream.lane_info
            self.lane._assemble(
                lanes_i, self.frame_hw[1], self.frame_hw[0],
            )
            self.lane._finalize(self.frame_hw[0])
            lane_info = stream.lane_info

            boxes = [o.tolist(format_type="xyxy") for o in objs]
            scores = [o.conf for o in objs]
            labels = [o.label for o in objs]
            stream.tracker.update(
                np.asarray(boxes, dtype=np.float64).reshape(-1, 4),
                np.asarray(scores, dtype=np.float64),
                labels,
                frames[i],
            )
            stream.distance.updateDistance(objs)
            collision_pt = stream.distance.calcCollisionPoint(
                lane_info.area_points
            )
            if stream.conditions.CheckStatus() and lane_info.area_status:
                stream.perspective.updateTransformParams(
                    *lane_info.lanes_points[1:3],
                    stream.conditions.transform_status,
                )
            bird_lanes = [
                stream.perspective.transformToBirdViewPoints(p)
                for p in lane_info.lanes_points
            ]
            blank = np.zeros(
                (self.frame_hw[0], self.frame_hw[1], 3), np.uint8
            )
            (direction, curvature), offset = (
                stream.perspective.calcCurveAndOffset(
                    blank, *bird_lanes[1:3], draw=False
                )
            )
            stream.conditions.UpdateCollisionStatus(
                collision_pt, lane_info.area_status
            )
            stream.conditions.UpdateOffsetStatus(offset)
            stream.conditions.UpdateRouteStatus(direction, curvature)
            results.append(
                {
                    "objects": objs,
                    "tracks": len(stream.tracker.tracked_stracks),
                    "collision": stream.conditions.collision_msg,
                    "offset": stream.conditions.offset_msg,
                    "curvature": stream.conditions.curvature_msg,
                    # per-stream lane geometry so consumers can render
                    "lane_info": lane_info,
                    "lanes_points": lane_info.lanes_points,
                    "lanes_status": lane_info.lanes_status,
                    "area_status": lane_info.area_status,
                }
            )
        return results

    def make_compute_probe(self, iters: int):
        """A jitted fn ``(yolo_vars, lane_vars, x) -> scalar`` running the
        fused batched step ``iters`` times chained on device-resident
        input — ONE dispatch, so tunnel/dispatch latency is excluded and
        the result measures pure TPU compute throughput.

        The input is perturbed with the loop counter each iteration and
        the packed output folded into the carry, so XLA can neither hoist
        the body out of the loop nor dead-code it."""
        fn = self._batched
        if fn is None:
            raise RuntimeError(
                "compute probe needs the native graph; this pipeline "
                "serves a pre-serialized step_artifact"
            )
        def probe(yolo_vars, lane_vars, x):
            def body(i, s):
                xi = x + i.astype(x.dtype)
                flat = fn(yolo_vars, lane_vars, xi)
                return s + jnp.sum(flat).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        return jax.jit(probe)

    def process_batch(self, frames: np.ndarray) -> List[dict]:
        return self.fetch(self.submit(frames), frames)

    def _transport_input_shape(self):
        """Device-input shape of one tick after host prep."""
        h, w = self.dev_hw
        if self.transport == "i420":
            return (self.n_streams, h * 3 // 2, w)
        return (self.n_streams, h, w, 3)

    def export_fused(self, out_path: str, platforms=None) -> dict:
        """Serialize the WHOLE pipeline's device work as one ``.adas``
        engine: uint8 transport batch (all N streams) → packed
        detections/lanes, with both nets' weights, the preprocess, the
        decode and the NMS baked in.  TensorRT builds one engine per
        model and leaves the pipeline in Python
        (convertOnnxToTensorRT.py:150-173, demo.py:261-320); here the
        deploy unit IS the pipeline.  Load with
        ``MultiStreamADAS(..., step_artifact=path)`` — the facades then
        contribute only host-side decode helpers (class names/colors);
        every weight serves from the artifact."""
        if self.mesh is not None and self.mesh.size > 1:
            raise ValueError(
                "multi-device steps serialize device assignments; "
                "export from a single-device pipeline (the artifact is "
                "the per-chip deploy unit)"
            )
        from ..engine.artifact import build_step_artifact, pack_tree_meta

        yv, lv = self.yolo.variables, self.lane.variables
        batched = self._batched
        fn = lambda x: batched(yv, lv, x)  # noqa: E731
        spec = jax.ShapeDtypeStruct(self._transport_input_shape(), jnp.uint8)
        jax.eval_shape(fn, spec)  # records the pack spec
        return build_step_artifact(
            fn, spec, out_path, platforms=platforms,
            meta={
                "kind": "multistream",
                "n_streams": self.n_streams,
                "frame_hw": list(self.frame_hw),
                "dev_hw": list(self.dev_hw),
                "transport": self.transport,
                **pack_tree_meta(self._spec_holder["spec"]),
            },
        )

    def _load_step_artifact(self, path: str):
        """Serve the device step from a pipeline-scale ``.adas`` file
        (see :meth:`export_fused`); validates the serving config against
        the baked one."""
        from ..engine.artifact import CompiledEngine, pack_spec_from_meta

        eng = CompiledEngine(path)
        m = eng.meta
        if m.get("kind") != "multistream":
            raise ValueError(f"{path} is not a multistream artifact")
        baked = (
            m["n_streams"], tuple(m["dev_hw"]), m["transport"],
        )
        here = (self.n_streams, tuple(self.dev_hw), self.transport)
        if baked != here:
            raise ValueError(
                f"artifact was built for (streams, dev_hw, transport)="
                f"{baked}, pipeline configured {here}"
            )
        self._spec_holder["spec"] = pack_spec_from_meta(m)
        self._batched = None  # compute probe needs the native graph
        self._step_engine = eng
        return lambda yv, lv, x: eng.run_device(x)

    def serve_pipelined(
        self,
        batches,
        depth: int = 3,
        on_result=None,
        upload_workers: int = 1,
    ):
        """Three-stage software pipeline over a tick iterator.

        Stage 1 (upload thread(s)): host prep + device upload — the
        tunnel-bound leg.  Stage 2 (caller thread): dispatch the fused
        step, which is async.  Stage 3 (fetch thread): device→host
        transfer of the packed outputs + per-stream host analytics
        (tracker/conditions state mutation stays globally ordered on the
        single fetch worker).  Steady-state tick cost is max(upload,
        fetch+analytics, dispatch) instead of their SUM — on a ~40 MB/s
        tunnel the upload leg is the floor, and fetch+analytics ride
        inside it.  This is the TPU-serving analogue of the double-
        buffered CUDA-stream loop the reference's per-frame
        h2d→execute→d2h never overlaps (coreEngine.py:93-118).

        ``batches``: iterable of (n_streams, H, W, 3) uint8 ticks.
        ``depth``: max un-fetched device batches (HBM backpressure).
        ``on_result(tick_index, signals)``: optional callback, invoked
        on the fetch thread IN ORDER.  Returns the number of ticks.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if getattr(self, "_fetcher", None) is None:
            self._fetcher = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="adas-fetch"
            )
        if upload_workers > 1 and self._uploader is None:
            self._uploader = ThreadPoolExecutor(
                max_workers=int(upload_workers),
                thread_name_prefix="adas-upload",
            )

        def fetch_and_report(idx, handle, frames):
            out = self.fetch(handle, frames)
            if on_result is not None:
                on_result(idx, out)
            return None

        pending = deque()  # (idx, frames, Future[device batch])
        fetches = deque()  # Futures from the fetch worker
        n = 0
        for idx, frames in enumerate(batches):
            n = idx + 1
            pending.append((idx, frames, self.prefetch(frames)))
            if len(pending) >= 2:
                i, f, fut = pending.popleft()
                h = self.submit_device(fut.result())
                fetches.append(
                    self._fetcher.submit(fetch_and_report, i, h, f)
                )
            while len(fetches) > depth:
                fetches.popleft().result()
        while pending:
            i, f, fut = pending.popleft()
            h = self.submit_device(fut.result())
            fetches.append(self._fetcher.submit(fetch_and_report, i, h, f))
        while fetches:
            fetches.popleft().result()
        return n
