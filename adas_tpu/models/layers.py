"""Shared flax building blocks for the model zoo.

All models are NHWC (TPU-native layout); weights ingested from torch/ONNX
checkpoints are transposed accordingly by the importers in
``adas_tpu.tools``.  BatchNorm runs in inference mode by default — the
training path passes ``train=True`` and mutates the ``batch_stats``
collection.
"""
from __future__ import annotations

import contextlib
import os
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

#: trace-time quantization switch (see :func:`quantized`); read when a
#: ConvBN is traced, so the jitted graph bakes in the chosen conv path
_QUANT_MODE: Optional[str] = None


#: int8-family trace modes: "int8" serves, "int8_calib" records activation
#: absmax into the mutable "act_scales" collection, "int8_pack" records
#: weight-scale shapes into a mutable "wscales" collection (used under
#: jax.eval_shape to discover which kernels to pre-quantize at load time)
INT8_MODES = ("int8", "int8_calib", "int8_pack")

#: trace-time switch for s8-CHAINED activations: on single-consumer
#: conv->conv edges (model code passes ``emit_q=True``), the producer's
#: fused epilogue quantizes its post-activation output with its own
#: calibrated output scale and hands the consumer an int8 ``QTensor``
#: directly — the bf16 intermediate never exists, the consumer skips its
#: input quantize entirely.  This is the int8 activation chaining TRT's
#: engine builder does between int8 layers
#: (/root/reference/convertOnnxToTensorRT.py:28-99 builds whole-network
#: int8).  Only active for CALIBRATED int8 serving (the producer's
#: "ymax" scale must be static); uncalibrated serving falls back to the
#: per-consumer dynamic quantize unchanged.
_S8_CHAIN = os.environ.get("ADAS_INT8_S8CHAIN", "1") != "0"


#: trace-time serving-path counters (bench provenance): incremented as
#: Python side effects while a jit traces the model, so after building/
#: warming a pipeline they attribute exactly which paths the compiled
#: graph contains.  Reset before tracing, read after (bench.py embeds
#: them in the JSON — a headline number must be able to say which
#: kernels actually served it).
_TRACE_STATS = {
    "int8_convs": 0,        # convs lowered W8A8 (Int8Conv)
    "bf16_convs": 0,        # int8-mode convs kept bf16 by policy
    "s8_emits": 0,          # epilogues emitting a chained s8 QTensor
    "s8_consumes": 0,       # convs consuming a chained s8 input
    "s8_group_concats": 0,  # concats performed in the s8 domain
    "pallas_convs": 0,      # convs served by ops/pallas_conv.py
    "pallas_blocks": 0,     # two-conv bodies served by ops/pallas_block.py
    "w2c_downs": 0,         # strided convs W-phase-merged (_maybe_w2c_down_conv)
    "int8_dense": 0,        # dense layers lowered W8A8
}


def reset_trace_stats() -> None:
    for k in _TRACE_STATS:
        _TRACE_STATS[k] = 0


def trace_stats() -> dict:
    return dict(_TRACE_STATS)


def set_s8_chain(enabled: bool) -> None:
    """Enable/disable s8-chained activations (trace-time; jitted graphs
    bake the setting in, so flip BEFORE tracing).  The layer-chaining
    behavior this toggles mirrors the whole-network int8 engine the
    reference sketches (convertOnnxToTensorRT.py:28-99)."""
    global _S8_CHAIN
    _S8_CHAIN = bool(enabled)


class QTensor(NamedTuple):
    """An int8-quantized activation: ``data`` s8, per-tensor ``scale``
    (f32 scalar; dequant = data * scale).  Flows between chained
    Int8Convs so the bf16 intermediate never materializes — the
    between-layer int8 tensors of the reference's sketched TRT int8
    engine (convertOnnxToTensorRT.py:28-99; TRT keeps activations int8
    across layer chains with fused requantization)."""

    data: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def dequant(self) -> jnp.ndarray:
        """bf16 value view — the guard for a QTensor reaching an
        int8-ineligible consumer (depthwise conv, f32 head)."""
        return (
            self.data.astype(jnp.float32) * self.scale
        ).astype(jnp.bfloat16)

    def __getitem__(self, idx) -> "QTensor":
        """Channel/spatial slicing stays in the s8 domain (per-tensor
        scale is slice-invariant) — C2f's split-into-parts reads slices
        of cv1's chained emission without dequantizing."""
        return QTensor(self.data[idx], self.scale)


def quantize_to(x: jnp.ndarray, scale: jnp.ndarray) -> QTensor:
    """Explicit s8 quantize at a given static scale.  Used where a value
    is produced OUTSIDE a conv epilogue (a residual add, a concat of
    mixed producers) but its consumers read s8: XLA fuses this
    elementwise chain into the producer fusion, so only the 1-byte
    tensor lands in HBM."""
    if isinstance(x, QTensor):
        x = x.dequant()
    _TRACE_STATS["s8_emits"] += 1
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return QTensor(xq, scale)


def s8_group_scale(mod: nn.Module, name: str = "concat_xmax"):
    """Serving-time unified activation scale for an s8 CONCAT GROUP —
    TensorRT's int8 concat: every producer feeding one concatenate
    quantizes with a single calibrated scale, the concat happens on
    1-byte data, and the consumer conv reads it with no input quantize
    (the reference's sketched whole-network int8 engine,
    convertOnnxToTensorRT.py:28-99, keeps concats int8 the same way).
    ``name`` distinguishes multiple groups owned by one module (the PAN
    neck owns two UNIFIED groups — TRT's scale propagation merges the
    scales of concats that share a producer, see yolo.YoloBackboneNeck).
    None unless serving calibrated int8 with chaining enabled."""
    if (
        _QUANT_MODE == "int8"
        and _S8_CHAIN
        and mod.has_variable("act_scales", name)
    ):
        return (
            jnp.maximum(mod.get_variable("act_scales", name), 1e-12)
            / 127.0
        )
    return None


def s8_group_record(mod: nn.Module, x, name: str = "concat_xmax") -> None:
    """Calibration-time absmax of the concat group's value (call with
    the CONCATENATED tensor — or, for a unified multi-concat group, the
    list of every member concat's tensor — inside the block that owns
    the group).  Declare each ``name`` ONCE per module ``__call__``
    (flax forbids re-declaring a variable), which is why unified groups
    pass all their concats in one call."""
    if _QUANT_MODE == "int8_calib" and _S8_CHAIN:
        xs = x if isinstance(x, (list, tuple)) else [x]
        v = mod.variable(
            "act_scales", name, lambda: jnp.zeros((), jnp.float32)
        )
        m = v.value
        for xi in xs:
            if isinstance(xi, QTensor):  # pragma: no cover - calib is bf16
                xi = xi.dequant()
            m = jnp.maximum(m, jnp.max(jnp.abs(xi.astype(jnp.float32))))
        v.value = m


def qconcat(parts, axis: int = -1):
    """Concatenate an s8 group: all-QTensor parts (one shared scale by
    construction) concatenate as int8 — half the HBM bytes of the bf16
    concat and no downstream quantize; any bf16 member degrades the
    whole group to the plain bf16 concat (the consumer then quantizes
    dynamically or from its own calibrated xmax, unchanged)."""
    if parts and all(isinstance(p, QTensor) for p in parts):
        # trace-time guard (ADVICE r4): group membership is threaded
        # across module boundaries by three mechanisms (epilogue
        # emit_scale, explicit quantize_to, backbone tap plumbing) — a
        # membership mistake would otherwise dequantize non-first
        # members silently wrong.  Scale IDENTITY (not equality) is the
        # group contract and costs nothing in-graph.
        for p in parts[1:]:
            if p.scale is not parts[0].scale:
                raise ValueError(
                    "qconcat parts carry different scale objects — a "
                    "concat-group membership bug (every member must "
                    "emit at the group owner's s8_group_scale)"
                )
        _TRACE_STATS["s8_group_concats"] += 1
        return QTensor(
            jnp.concatenate([p.data for p in parts], axis=axis),
            parts[0].scale,
        )
    return jnp.concatenate(
        [p.dequant() if isinstance(p, QTensor) else p for p in parts],
        axis=axis,
    )


@contextlib.contextmanager
def quantized(mode: Optional[str] = "int8"):
    """Trace the enclosed model application with quantized convs.

    Enter this context around ``net.apply`` *inside* the function being
    jitted (trace time), and every ``ConvBN`` lowers its conv to W8A8
    int8 on the MXU (s8×s8→s32, 2× bf16 throughput on v5e) with a single
    fused epilogue: per-output-channel weight scales × per-tensor
    activation scale × the FOLDED BatchNorm affine, then bias and
    activation — the TensorRT int8 engine the reference only sketches
    (convertOnnxToTensorRT.py:28-99, calibrator commented out), built
    for real.  Depthwise/grouped convs and tiny-C_in stems are served in
    bf16 instead (VPU/padding-bound — int8 buys them nothing; TRT's
    tactic selection makes the same call per layer).
    """
    global _QUANT_MODE
    prev = _QUANT_MODE
    _QUANT_MODE = mode
    try:
        yield
    finally:
        _QUANT_MODE = prev


def int8_conv_eligible(groups: int, in_channels: int) -> bool:
    """Precision policy under ``quantized("int8")``: int8 only where the
    MXU is — dense convs with enough input channels.  Depthwise/grouped
    convs are VPU-bound and tiny-C_in stems are lane-padding-bound, so
    int8's 2× MXU rate buys nothing there while the quantize/dequantize
    elementwise passes still cost; both serve in bf16 instead."""
    return groups == 1 and in_channels > 4


class BNFoldParams(nn.Module):
    """Inference-time BatchNorm parameter holder with nn.BatchNorm's
    EXACT variable layout (``params/{scale,bias}`` + ``batch_stats/
    {mean,var}``), returning the folded per-channel affine instead of
    applying it:

        gain = scale / sqrt(var + eps);  bias' = bias - mean * gain

    so ``bn(conv(x)) == conv(x) * gain + bias'`` folds into the int8
    conv's dequant epilogue (what TensorRT's int8 engine builder does to
    every Conv+BN pair).  Checkpoints trained/ingested against
    nn.BatchNorm load unchanged."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, features: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), jnp.float32),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), jnp.float32
        )
        gain = scale.astype(jnp.float32) * jax.lax.rsqrt(
            var.value.astype(jnp.float32) + self.epsilon
        )
        return gain, bias.astype(jnp.float32) - mean.value.astype(
            jnp.float32
        ) * gain


def int8_act_scale(mod: nn.Module, x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Per-tensor activation scale for ``mod``'s input: records the
    running absmax under ``quantized("int8_calib")`` (returns None =
    caller quantizes dynamically this pass), serves the calibrated
    STATIC scale when an ``act_scales`` collection is present, else None
    (dynamic absmax — a global reduce on the critical path; calibration
    exists to remove it)."""
    if isinstance(x, QTensor):
        # chained input arrives pre-quantized with the producer's scale
        return x.scale
    if _QUANT_MODE == "int8_calib":
        seen = mod.variable(
            "act_scales", "xmax", lambda: jnp.zeros((), jnp.float32)
        )
        seen.value = jnp.maximum(
            seen.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
        )
        return None
    if mod.has_variable("act_scales", "xmax"):
        return (
            jnp.maximum(mod.get_variable("act_scales", "xmax"), 1e-12)
            / 127.0
        )
    return None


def int8_weight_qparams(
    mod: nn.Module, kernel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(wq int8, wscale (C,)) for a conv kernel.

    Pre-packed kernels (int8 dtype, produced by
    ``tools.quantize.pack_int8_weights`` at load time) pass straight
    through with their stored ``wscales`` collection entry — no per-step
    weight quantize and 4× less weight HBM traffic.  f32 kernels are
    quantized in-graph (exactly the math the packer runs on host).
    Under ``quantized("int8_pack")`` the scale's shape is recorded into
    the mutable ``wscales`` collection so the packer can discover, via
    ``jax.eval_shape``, which param-tree kernels feed int8 convs."""
    if kernel.dtype == jnp.int8:
        return kernel, mod.get_variable("wscales", "wscale")
    k = jnp.asarray(kernel, jnp.float32)
    wmax = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    wscale = jnp.maximum(wmax, 1e-8) / 127.0
    if _QUANT_MODE == "int8_pack":
        rec = mod.variable("wscales", "wscale", lambda: wscale)
        rec.value = wscale
    wq = jnp.clip(
        jnp.round(k / wscale), -127, 127
    ).astype(jnp.int8)
    return wq, wscale


class Int8Conv(nn.Module):
    """Drop-in conv with int8 MXU arithmetic and nn.Conv's param layout
    (``kernel`` HWIO + optional ``bias``), so f32 checkpoints load
    unchanged, plus the TRT-grade fused epilogue:

      w_q  = round(w / s_w),  s_w per output channel (absmax/127;
             precomputed at load by pack_int8_weights, else in-graph)
      x_q  = round(x / s_x),  s_x per tensor (static after calibration)
      y    = act( conv_s8(x_q, w_q) * (s_w·s_x·gain) + bias' )

    where (gain, bias') is the folded BatchNorm affine from
    :class:`BNFoldParams` (identity when ``fold`` is None).  The whole
    epilogue is one elementwise chain, so XLA fuses it — together with
    the NEXT conv's static input quantize — into a single pass over the
    accumulator; no f32 activation round-trips between layers.  The
    head's final 1×1 convs stay f32 (see ConvBN.__call__) — standard
    practice to protect box/class regression precision.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))
    feature_group_count: int = 1
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        fold=None,
        act: Optional[Callable] = None,
        emit_q: bool = False,
        emit_scale=None,
    ):
        """``emit_scale``: externally-owned static output scale (an s8
        concat group's unified scale, see :func:`s8_group_scale`) — the
        epilogue quantizes with IT instead of this conv's own calibrated
        ``ymax``, and no ymax is recorded (the group owner calibrates)."""
        kh, kw = self.kernel_size
        in_per_group = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_per_group, self.features),
            jnp.float32,
        )
        xscale = int8_act_scale(self, x)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        # s8-chained output (see _S8_CHAIN): only for calibrated serving
        # — the producer's static output scale ("ymax", recorded by the
        # same calibration pass that records "xmax") must exist
        want_emit = emit_q and _S8_CHAIN
        out_scale = None
        if emit_scale is not None and _QUANT_MODE == "int8" and _S8_CHAIN:
            # concat-group emission: the group's unified scale wins
            out_scale = emit_scale
        elif (
            want_emit
            and _QUANT_MODE == "int8"
            and self.has_variable("act_scales", "ymax")
        ):
            out_scale = (
                jnp.maximum(
                    self.get_variable("act_scales", "ymax"), 1e-12
                )
                / 127.0
            )
        y = int8_conv_apply(
            x, kernel, self.strides, self.padding,
            feature_group_count=self.feature_group_count,
            kernel_dilation=self.kernel_dilation,
            xscale=xscale,
            wqparams=int8_weight_qparams(self, kernel),
            conv_bias=bias,
            fold=fold,
            act=act,
            out_scale=out_scale,
        )
        if want_emit and _QUANT_MODE == "int8_calib":
            seen = self.variable(
                "act_scales", "ymax", lambda: jnp.zeros((), jnp.float32)
            )
            seen.value = jnp.maximum(
                seen.value, jnp.max(jnp.abs(y.astype(jnp.float32)))
            )
        return y


def int8_conv_apply(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int],
    padding: Sequence[Tuple[int, int]],
    feature_group_count: int = 1,
    kernel_dilation: Tuple[int, int] = (1, 1),
    xscale: Optional[jnp.ndarray] = None,
    wqparams: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    conv_bias: Optional[jnp.ndarray] = None,
    fold=None,
    act: Optional[Callable] = None,
    out_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The W8A8 conv math of :class:`Int8Conv` as a free function.

    ``xscale``: calibrated static activation scale; None computes the
    dynamic per-tensor absmax (a global reduce before the conv — this is
    what calibration removes from the critical path).  ``wqparams``:
    pre-quantized (wq, wscale); None quantizes ``kernel`` in-graph.
    ``fold``: per-channel (gain, bias) of a folded BatchNorm;
    ``conv_bias`` folds in as ``gain * conv_bias`` (torch applies conv
    bias before BN).  ``act`` runs inside the same fused epilogue.
    ``x`` may be a :class:`QTensor` (chained s8 input — skips the input
    quantize); ``out_scale`` non-None emits a QTensor quantized with it
    inside the same epilogue (s8-chained output)."""
    if wqparams is None:
        k = jnp.asarray(kernel, jnp.float32)
        wmax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
        wscale = jnp.maximum(wmax, 1e-8) / 127.0
        wq = jnp.clip(jnp.round(k / wscale), -127, 127).astype(jnp.int8)
    else:
        wq, wscale = wqparams
        wscale = wscale.reshape(-1)
    if isinstance(x, QTensor):
        _TRACE_STATS["s8_consumes"] += 1
        xq, xscale = x.data, x.scale
    else:
        xf = x.astype(jnp.float32)
        if xscale is None:
            xmax = jnp.max(jnp.abs(xf))
            xscale = jnp.maximum(xmax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    pallas_y = _maybe_pallas_conv(
        xq, wq, wscale, xscale, strides, padding, feature_group_count,
        kernel_dilation, conv_bias, fold, act, out_scale,
    )
    if pallas_y is not None:
        return pallas_y
    acc = _maybe_w2c_down_conv(
        xq, wq, strides, padding, feature_group_count, kernel_dilation
    )
    if acc is None:
        acc = jax.lax.conv_general_dilated(
            xq,
            wq,
            strides,
            [tuple(p) for p in padding],
            rhs_dilation=kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count,
            preferred_element_type=jnp.int32,
        )
    # fused epilogue: ONE per-channel affine covering dequant + BN(+bias)
    scale = wscale * xscale
    bias = None
    if fold is not None:
        gain, bias = fold
        scale = scale * gain
        if conv_bias is not None:
            bias = bias + gain * conv_bias
    elif conv_bias is not None:
        bias = conv_bias
    y = acc.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias
    if act is not None:
        y = act(y)
    if out_scale is not None:
        # s8-chained emission: the requantize rides THIS conv's fused
        # epilogue and only the 1-byte tensor lands in HBM; the
        # consumer conv reads it with no input quantize at all
        _TRACE_STATS["s8_emits"] += 1
        yq = jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
        return QTensor(yq, out_scale)
    if fold is not None:
        # folded (Conv+BN) layers emit bf16: halves inter-layer HBM
        # traffic vs f32 (the next conv's quantize and any residual/
        # concat consumers read 2 bytes, not 4); epilogue math stays f32
        y = y.astype(jnp.bfloat16)
    return y


def _maybe_w2c_down_conv(
    xq, wq, strides, padding, groups, dilation
) -> Optional[jnp.ndarray]:
    """W-phase channel-merge rewrite of a narrow strided s8 conv.

    XLA:TPU's layout heuristic turns a 3x3 stride-2 conv with Cin<=64
    (every YOLO family's first downsample after the stem at 640 input,
    e.g. v8l ``down1`` 64->128 at 320x320) into a disaster: it assigns
    the convolution a ``{3,0,2,1}`` N-interleaved layout and fuses a
    full relayout ``copy`` of the input INTO the conv fusion — measured
    39.7 TF/s in situ (765 us/tick on the 8-stream flagship) vs
    126.7 TF/s for the identical conv isolated and ~220 TF/s for its
    Cin=128 sibling ``down2`` (round-5 attribution,
    tools_dev/quant_attrib.py + down1_layout_probe.py; the layouts are
    visible in the dumped fusion).

    The fix exploits NHWC row-major adjacency: merging each pair of
    adjacent W columns into channels, ``(N,H,W,C) -> (N,H,W/2,2C)``, is
    a FREE reshape (pure bitcast — W and C are the two minor dims), and
    under it the 3x3 stride-(2,2) conv becomes an EXACTLY equivalent
    3x2 stride-(2,1) conv with Cin=2C and one zero-padded quarter in
    the rearranged kernel:

        out[m,u] = sum_{r,t} in[2m+r-1, 2u+t-1] K[r,t]
                 = sum_{r,s} x2[2m+r-1, u+s-1]  K2[r,s]
        K2[r,0,C:] = K[r,0] ; K2[r,1,:C] = K[r,1] ; K2[r,1,C:] = K[r,2]

    (s indexes the 2-tap W window, pad W=(1,0); the zero quarter makes
    the s32 accumulator BIT-IDENTICAL to the direct conv — pinned by
    tests/test_w2c_down.py).
    The earlier polyphase space-to-depth attempt (REFUTED, see
    tools_dev/s2d_down_bench.py) lost because its phase split is a real
    s8 transpose; this one is a bitcast.

    MEASURED VERDICT (round 5, same-window TPU v5e): **retired,
    default OFF**.  The "free bitcast" premise fails under TPU tiled
    layouts — with C=64 the (8,128) tile pads the lane dim, so the
    reshape materializes as standalone HBM relayout copies
    ({3,2,1,0}->{1,3,2,0}->{3,0,2,1}, 6.2 ms/10-tick vs the 5.95 ms
    conv win; tools_dev/attrib_diff.py) — and the 3x2 stride-(2,1)
    conv draws the SAME pathological `{3,0,2,1}` layout despite
    Cin=128.  Serving A/B (tools_dev/serving_w2c_ab.py): off 528.84 /
    on_all 517.84 (-2.1%) / down1-only 529.39 fps (wash).  Isolated
    (tools_dev/w2c_isolated_bench.py two-point probe): direct 237 us,
    w2c 482 us, producer-chained w2c 2813 us vs 698 us direct.  A
    third rewrite — merging N into H so the N-interleave is degenerate
    (tools_dev/nh_merge_proto.py, exact seam correction) — also loses
    (N=1/H=2560 conv runs 10x slower).  down1's ~530 us/tick in-situ
    layout tax (producer pins {3,2,1,0}, XLA fuses a 52 MB relayout
    into the conv) stands as measured cost; three exact rewrites
    could not beat it.

    Returns the s32 accumulator, or None when ineligible
    (default: always — ``ADAS_W2C_DOWN=1`` re-enables for experiments;
    eligibility = 3x3, stride (2,2), pad ((1,1),(1,1)), no
    groups/dilation, Cin<=64, even W, and min(H, W) >=
    ``ADAS_W2C_MINDIM`` [160]).
    """
    if os.environ.get("ADAS_W2C_DOWN", "0") == "0":
        return None
    mindim = int(os.environ.get("ADAS_W2C_MINDIM", "160"))
    pad = tuple(tuple(p) for p in padding)
    if (
        xq.ndim != 4
        or wq.shape[:2] != (3, 3)
        or tuple(strides) != (2, 2)
        or pad != ((1, 1), (1, 1))
        or groups != 1
        or tuple(dilation) != (1, 1)
        or xq.shape[-1] > 64
        or xq.shape[2] % 2
        or min(xq.shape[1], xq.shape[2]) < mindim
    ):
        return None
    n, h, w, c = xq.shape
    cout = wq.shape[-1]
    x2 = xq.reshape(n, h, w // 2, 2 * c)
    w2 = jnp.zeros((3, 2, 2 * c, cout), wq.dtype)
    w2 = w2.at[:, 0, c:, :].set(wq[:, 0])
    w2 = w2.at[:, 1, :c, :].set(wq[:, 1])
    w2 = w2.at[:, 1, c:, :].set(wq[:, 2])
    _TRACE_STATS["w2c_downs"] += 1
    return jax.lax.conv_general_dilated(
        x2,
        w2,
        (2, 1),
        ((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _maybe_pallas_conv(
    xq, wq, wscale, xscale, strides, padding, groups, dilation,
    conv_bias, fold, act, out_scale,
):
    """Route an eligible int8 conv to the fused Pallas kernel
    (ops/pallas_conv.py): dense 3x3 / stride 1 / pad 1, silu/relu/None
    activation, folded-BN epilogue.  Returns None (caller runs the XLA
    conv) unless ADAS_PALLAS_CONV=1 AND the config matches AND the
    kernel compile-probes on the real backend."""
    from ..ops import pallas_conv as PC

    policy = PC.pallas_conv_policy()
    if policy == "off":
        return None
    interpret = jax.default_backend() != "tpu"
    pad = tuple(tuple(p) for p in padding)
    if (
        wq.shape[:2] != (3, 3)
        or tuple(strides) != (1, 1)
        or pad != ((1, 1), (1, 1))
        or groups != 1
        or tuple(dilation) != (1, 1)
        or fold is None
        or xq.ndim != 4
    ):
        return None
    if act is nn.silu:
        act_name = "silu"
    elif act is nn.relu:
        act_name = "relu"
    elif act is None:
        act_name = None
    else:
        return None
    gain, fbias = fold
    scale = wscale * xscale * gain
    bias = fbias if conv_bias is None else fbias + gain * conv_bias
    requant = out_scale is not None
    odtype = "int8" if requant else "bfloat16"
    if not interpret:
        n, h, w, cin = xq.shape
        wpad = w + 2 + (-(w + 2) % 128)
        if not PC.conv_compile_ok(
            n, h, w, wpad, cin, wq.shape[-1], act_name, odtype, requant
        ):
            return None
    _TRACE_STATS["pallas_convs"] += 1
    y = PC.int8_conv3x3(
        xq, wq, scale, bias, act_name,
        out_scale=out_scale, interpret=interpret,
    )
    if requant:
        return QTensor(y, out_scale)
    return y


class QConvParams(nn.Module):
    """Param/variable holder with :class:`Int8Conv`'s EXACT tree
    (``params/<name>/kernel`` + ``wscales/<name>/wscale`` +
    ``act_scales/<name>/{xmax,ymax}``) that RETURNS the quantized pieces
    instead of applying the conv — the seam that lets a multi-layer
    fused kernel (ops/pallas_block.py) own two convs' arithmetic while
    the checkpoint/calibration layout stays byte-identical to the
    per-conv XLA path (same pattern as ``consume_planes_stem``'s
    ``_StemKernelParam``)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, cin: int):
        """-> (wq s8 HWIO, wscale (C,), xscale | None, yscale | None):
        per-channel weight quant params plus this conv's calibrated
        static input/output activation scales (None when absent)."""
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
            jnp.float32,
        )
        wq, wscale = int8_weight_qparams(self, kernel)
        xscale = yscale = None
        if self.has_variable("act_scales", "xmax"):
            xscale = (
                jnp.maximum(self.get_variable("act_scales", "xmax"), 1e-12)
                / 127.0
            )
        if self.has_variable("act_scales", "ymax"):
            yscale = (
                jnp.maximum(self.get_variable("act_scales", "ymax"), 1e-12)
                / 127.0
            )
        return wq, wscale.reshape(-1), xscale, yscale


class QConvBNParams(nn.Module):
    """Param/variable holder with :class:`ConvBN`'s exact tree
    (``conv/kernel`` + ``bn/{scale,bias,mean,var}``) returning the
    quantized conv pieces and the folded BN affine — the ConvBN-shaped
    counterpart of :class:`QConvParams` for block-fused kernels."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, cin: int):
        wq, wscale, xs, ys = QConvParams(
            self.features, self.kernel_size, name="conv"
        )(cin)
        gain, fbias = BNFoldParams(epsilon=1e-5, name="bn")(self.features)
        return wq, wscale, xs, ys, gain, fbias


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` with W8A8 int8 MXU arithmetic and nn.Dense's
    EXACT param layout (``kernel`` (in, features) + optional ``bias``),
    so f32 checkpoints load unchanged.

    Exists for the UFLD classifier heads (reference
    TrafficLaneDetector/exportLib/ultrafastLaneV2/model_tusimple.py
    ``cls`` MLP): ``cls_fc2`` for CULane is 2048×~60k — ~492 MB of f32
    weights streamed from HBM every step, the single largest HBM reader
    in the lane trunk's profile (495 µs measured).  int8 kernels cut the
    bytes 4× and the dot runs s8×s8→s32 on the MXU; the reference's TRT
    int8 engine quantizes these FCs the same way
    (convertOnnxToTensorRT.py:28-99 builds the WHOLE network int8).
    Shares Int8Conv's machinery: ``wscales`` packed at load by
    ``tools.quantize.pack_int8_weights``, ``act_scales`` recorded by
    ``calibrate_act_scales``."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        _TRACE_STATS["int8_dense"] += 1
        xscale = int8_act_scale(self, x)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        wq, wscale = int8_weight_qparams(self, kernel)
        if isinstance(x, QTensor):
            # chained s8 input (a producer conv's emit_q output): skip
            # the input quantize, use the producer's scale
            xq = x.data
        else:
            xf = x.astype(jnp.float32)
            if xscale is None:
                xscale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
            xq = jnp.clip(
                jnp.round(xf / xscale), -127, 127
            ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (wscale.reshape(-1) * xscale)
        if bias is not None:
            y = y + bias
        return y


def head_dense(features: int, name: str, dtype=None, use_bias: bool = True):
    """``nn.Dense`` or :class:`Int8Dense` by the trace-time quant mode —
    identical param tree either way (Int8Dense mirrors nn.Dense's
    layout), so the same variables serve both precisions."""
    if _QUANT_MODE in INT8_MODES:
        return Int8Dense(features, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class _StemKernelParam(nn.Module):
    """Kernel param holder with PolyphaseStemConv/nn.Conv's exact tree
    (``kernel`` HWIO, no bias) — lets the Pallas fused-stem path own the
    same checkpoint parameters as the plain ConvBN conv."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
        )


def consume_planes_stem(
    x, features: int, kernel_size: Tuple[int, int], *,
    conv_name: str, bn_name: str, act: Optional[str], pool: bool, dtype,
):
    """S2DPlanes fused-stem consumption shared by :class:`ConvBN` and
    ``resnet.ResNetFeatures`` (one definition so the epsilon/dtype/
    margins plumbing cannot drift between the two stems).  Creates the
    checkpoint-compatible parameters (``{conv_name}/kernel`` +
    ``{bn_name}`` BatchNorm tree) and runs ops/pallas_stem.fused_stem.
    Must execute inside the caller's ``@nn.compact`` scope."""
    from ..ops.pallas_stem import fused_stem

    kernel = _StemKernelParam(features, kernel_size, name=conv_name)(
        x.shape[-1]
    )
    gain, fbias = BNFoldParams(epsilon=1e-5, name=bn_name)(features)
    pdtype = dtype or jnp.promote_types(x.dtype, kernel.dtype)
    return fused_stem(
        x.data.astype(pdtype), kernel.astype(pdtype), gain, fbias,
        logical_hw=(x.shape[1], x.shape[2]), pool=pool, act=act,
        out_dtype=pdtype, expect_margins=x.margins,
    )


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
    def __call__(
        self, x, train: bool = False, emit_q: bool = False,
        emit_scale=None,
    ):
        # torch semantics (pad=k//2 symmetric) differ from lax "SAME" on
        # stride-2 / even inputs; default to the torch convention since all
        # ingested checkpoints assume it.
        padding = self.padding
        if padding is None:
            padding = [
                (d * (k - 1) // 2, d * (k - 1) // 2)
                for k, d in zip(self.kernel, self.dilation)
            ]
        # precision policy under quantized("int8"): dense convs with
        # real channel depth go int8+folded-epilogue; depthwise/grouped
        # convs and tiny-C_in stems serve bf16 (int8_conv_eligible)
        use_int8 = (
            _QUANT_MODE in INT8_MODES
            and not train
            and isinstance(padding, (list, tuple))
            and int8_conv_eligible(self.groups, x.shape[-1])
        )
        if isinstance(x, QTensor) and not use_int8:
            # a chained s8 input reaching an int8-ineligible consumer
            # (depthwise/grouped conv, train path): take the bf16 view
            x = x.dequant()
        if use_int8:
            _TRACE_STATS["int8_convs"] += 1
            fold = None
            if self.use_bn:
                fold = BNFoldParams(epsilon=1e-5, name="bn")(self.features)
            return Int8Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=tuple(tuple(p) for p in padding),
                feature_group_count=self.groups,
                kernel_dilation=self.dilation,
                use_bias=self.use_bias or not self.use_bn,
                name="conv",
            )(
                x, fold=fold, act=self.act, emit_q=emit_q,
                emit_scale=emit_scale,
            )
        # int8-ineligible layers under int8 mode run bf16 (MXU-native)
        dtype = self.dtype
        if _QUANT_MODE in INT8_MODES and dtype is None:
            _TRACE_STATS["bf16_convs"] += 1
            dtype = jnp.bfloat16
        # tiny-C_in stride-2 stems (the first conv of every backbone):
        # evaluate via polyphases — identical math and parameter tree,
        # ~3x faster on the MXU (see polyphase_stride2_conv)
        polyphase_ok = (
            self.strides == (2, 2)
            and self.groups == 1
            and self.dilation == (1, 1)
            and self.kernel[0] % 2 == 1
            and self.kernel[1] % 2 == 1
            and x.shape[-1] <= 4
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and self.padding is None
        )
        from ..ops.preprocess import S2DInput, S2DPlanes

        if isinstance(x, (S2DInput, S2DPlanes)) and not polyphase_ok:
            raise ValueError(
                "pre-space-to-depth input fed to a non-polyphase conv "
                f"(kernel={self.kernel}, strides={self.strides}) — only "
                "odd-kernel stride-2 stems consume it "
                "(ops/preprocess s2d/planes modes)"
            )
        if isinstance(x, S2DPlanes):
            # Pallas fused stem (ops/pallas_stem.py): conv + folded BN +
            # activation in one kernel on the planar polyphase input the
            # resize dots emit; parameter tree identical to the plain
            # path (conv/kernel + bn/{scale,bias,mean,var})
            if not self.use_bn or self.use_bias or train:
                raise ValueError(
                    "S2DPlanes stem requires inference ConvBN with BN "
                    "and no conv bias"
                )
            if self.act is nn.silu:
                act_name = "silu"
            elif self.act is nn.relu:
                act_name = "relu"
            elif self.act is None:
                act_name = None
            else:
                raise ValueError("unsupported activation for fused stem")
            return consume_planes_stem(
                x, self.features, self.kernel, conv_name="conv",
                bn_name="bn", act=act_name, pool=False, dtype=dtype,
            )
        if polyphase_ok:
            x = PolyphaseStemConv(
                self.features, self.kernel,
                use_bias=self.use_bias or not self.use_bn,
                dtype=dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=padding,
                feature_group_count=self.groups,
                kernel_dilation=self.dilation,
                use_bias=self.use_bias or not self.use_bn,
                dtype=dtype,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=dtype,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def polyphase_stride2_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    preferred_element_type=None,
) -> jnp.ndarray:
    """Exact stride-2 odd-k conv evaluated over 2x2 polyphases.

    XLA's direct lowering of a stride-2 conv with C_in=3 pads the input
    channels to the lane width and wastes ~98% of the MXU.  Space-to-
    depth the input (x_s2d[(r,t,c)] = x[2m+r, 2n+t, c]), rearrange the
    kernel into the matching polyphase taps
    (w2[a,b,(r,t,c)] = w[2a+r-1, 2b+t-1, c], zero out of range), and the
    identical convolution (torch ``pad=k//2`` semantics) runs ~3x faster
    on the stem convs (measured on the ResNet 7x7 and YOLO 3x3 stems).
    Requires odd k, stride 2, even H/W, no groups/dilation.

    ``preferred_element_type`` passes through to the conv (int32 for
    W8A8 probes).  NOTE: for s8 inputs the polyphase form measured ~4x
    SLOWER than the direct strided conv on TPU (the s8 transpose tax
    dominates; tools_dev/s2d_down_bench.py) — the int8 serving path
    deliberately does NOT use it.
    """
    from ..ops.preprocess import S2DInput

    kh, kw, c, f = kernel.shape
    n, h, w, _ = x.shape
    assert kh % 2 == 1 and kw % 2 == 1 and h % 2 == 0 and w % 2 == 0
    if isinstance(x, S2DInput):
        # preprocessing already emitted the polyphase layout — the
        # space-to-depth transpose below (a real HBM pass, ~0.6-0.8 ms
        # per 8-frame step measured) is skipped entirely
        xs = x.data
        assert xs.shape == (n, h // 2, w // 2, 4 * c), xs.shape
    else:
        xs = (
            x.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )
    # tap alignment: output tap u = 2i + p - k//2 lands on phase r when
    # p ≡ k//2 + r (mod 2); shift the kernel by δ = (k//2) & 1 so taps
    # split evenly into 2-phase groups of na = (k+δ+1)//2
    da, db = (kh // 2) & 1, (kw // 2) & 1
    na, nb = (kh + da + 1) // 2, (kw + db + 1) // 2
    wp = jnp.pad(
        kernel,
        (
            (da, 2 * na - kh - da),
            (db, 2 * nb - kw - db),
            (0, 0),
            (0, 0),
        ),
    )
    w2 = (
        wp.reshape(na, 2, nb, 2, c, f)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(na, nb, 4 * c, f)
    )
    pad_a = (kh // 2 + da) // 2
    pad_b = (kw // 2 + db) // 2
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1),
        ((pad_a, na - 1 - pad_a), (pad_b, nb - 1 - pad_b)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC")
        ),
        preferred_element_type=preferred_element_type,
    )


class PolyphaseStemConv(nn.Module):
    """Drop-in for ``nn.Conv`` on tiny-C_in stride-2 stems: identical
    parameter tree (``kernel``/``bias`` in HWIO layout) so checkpoint
    ingestion is unchanged, but evaluated via
    ``polyphase_stride2_conv``."""

    features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.preprocess import S2DInput

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
        )
        data = x.data if isinstance(x, S2DInput) else x
        args = [data, kernel]
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            args.append(bias)
        promoted = nn.dtypes.promote_dtype(*args, dtype=self.dtype)
        data, kernel = promoted[0], promoted[1]
        xin = S2DInput(data, x.shape) if isinstance(x, S2DInput) else data
        y = polyphase_stride2_conv(xin, kernel)
        if self.use_bias:
            y = y + promoted[2]
        return y


def max_pool(x, window: int, stride: int, pad: int = 0):
    """Max pool with torch-style symmetric integer padding."""
    if isinstance(x, QTensor):
        return max_pool_q(x, window, stride, pad)
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )


def max_pool_q(x: QTensor, window: int, stride: int, pad: int = 0) -> QTensor:
    """Max pool in the s8 domain: max commutes with the (positive)
    dequant scale, so pooling the quantized data IS the quantized pooled
    value — SPPF's pyramid stays 1-byte end to end.  Padding with -128
    (below any representable s8 value) is the domain's -inf."""
    y = jax.lax.reduce_window(
        x.data,
        jnp.int8(-128),
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return QTensor(y, x.scale)


def resize_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of NHWC, matching torch
    ``interpolate(mode='nearest', scale_factor=2)``.  A :class:`QTensor`
    upsamples in the s8 domain — nearest replication is a gather, so the
    replicated quantized data IS the quantized replicated value (the PAN
    neck's top-down upsample rides the 1-byte tensor)."""
    if isinstance(x, QTensor):
        return QTensor(resize_nearest_2x(x.data), x.scale)
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
