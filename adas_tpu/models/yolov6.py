"""YOLOv6 (meituan EfficientRep) in flax — the real v6 trunk, not the v5
stand-in previously aliased.

Implements the meituan/YOLOv6 2.x n/s inference topology the reference
consumes through ONNX exports (ObjectDetector/utils.py:19 enum +
yoloDetector.py's v5-contract decode — v6 exports emit
``(1, N, 5+nc)`` with objectness ≡ 1):

* ``RepVGGBlock`` — 3×3 + 1×1 + (identity BN) branches summed, ReLU.
  The PARAMETER structure stays training-form so released checkpoints
  map 1:1, but serving runs the deploy form: ``fuse_repvgg_variables``
  (switch_to_deploy at facade load) collapses the branches into one
  3×3 conv per block, and the module emits the single-conv graph
  whenever the bound tree carries the fused form.
* ``EfficientRep`` backbone — stem + 4 ER blocks (RepVGG downsample +
  RepBlock), SimSPPF on the last stage.
* ``RepPANNeck`` — SimConv lateral reductions, ConvTranspose 2×
  upsampling (meituan's ``Transpose`` layer), RepBlock fusion stages.
* ``EffiDeHead`` — per-level stem + decoupled cls/reg 3×3 convs + 1×1
  predictors, anchor-free distance decode (no DFL at n/s; 17-bin DFL
  at m/l, decoded analytically like the checkpoints' ``proj_conv``).

Scales: n (depth 1/3, width 0.25), s (1/3, 0.50) on the EfficientRep
trunk; m (0.60, 0.75, csp_e=2/3) and l (1.0, 1.0, csp_e=1/2) on the
CSPBep trunk (BepC3/BottleRep stages, meituan CSPBepBackbone /
CSPRepPANNeck).  Offline caveat: m/l faithfulness is pinned against the
in-repo torch oracle expression of the published topology
(tests/torch_nets_detect.py), not real released checkpoints.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, max_pool
from .yolo import YoloSpec, _anchor_points, _scale_channels, _scale_depth

#: base channel plan (backbone 0-4, neck 5-10) and repeat plan, meituan
#: configs/yolov6n.py
_V6_CHANNELS = (64, 128, 256, 512, 1024, 256, 128, 128, 256, 256, 512)
_V6_REPEATS = (1, 6, 12, 18, 6, 12, 12, 12, 12)
_V6_SCALES = {"n": (1 / 3, 0.25), "s": (1 / 3, 0.50)}
#: m/l (CSPBep trunk): depth, width, csp hidden-channel ratio e
#: (meituan configs/yolov6m.py csp_e=2/3, yolov6l.py csp_e=1/2)
_V6_CSP_SCALES = {"m": (0.60, 0.75, 2.0 / 3.0), "l": (1.0, 1.0, 0.5)}


def v6_plan(scale: str) -> Tuple[Sequence[int], Sequence[int]]:
    depth, width = (
        _V6_SCALES[scale]
        if scale in _V6_SCALES
        else _V6_CSP_SCALES[scale][:2]
    )
    chans = [_scale_channels(c, width, 10_000) for c in _V6_CHANNELS]
    reps = [
        r if r == 1 else _scale_depth(r, depth) for r in _V6_REPEATS
    ]
    return chans, reps


class RepVGGBlock(nn.Module):
    """3×3(+BN) + 1×1(+BN) + identity-BN branches, summed, ReLU.
    Identity branch only when in==out and stride 1 (meituan
    layers/common.py RepVGGBlock, training form)."""

    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        # deploy form: when the bound tree carries ``fused`` (produced
        # by fuse_repvgg_variables at load — RepVGG switch_to_deploy,
        # arXiv:2101.03697), the three branches have been collapsed into
        # one 3×3 ConvBN with identity BN stats.  One MXU conv instead
        # of three HBM passes + two adds, and the block becomes a dense
        # 3×3 conv the int8 policy can serve (the branch form's 1×1 and
        # BN-only adds defeated conv/quantize fusion).  The TREE decides:
        # init and train-form ingest keep the branch structure, so
        # checkpoint mappings and train paths are unchanged.
        # ``emit_q``/``emit_scale`` reach the deploy conv's epilogue
        # (s8-chained output); the branch form ignores them — the sum
        # of three branches is not a conv epilogue, and callers fall
        # back to an explicit quantize (or bf16) when needed.
        try:
            deploy = "fused" in self.variables.get("params", {})
        except ValueError:  # unbound (shape inference contexts)
            deploy = False
        if deploy and not train:
            return ConvBN(
                self.features, (3, 3), strides=self.strides, act=nn.relu,
                name="fused",
            )(x, train, emit_q=emit_q, emit_scale=emit_scale)
        dense = ConvBN(
            self.features, (3, 3), strides=self.strides, act=None,
            name="rbr_dense",
        )(x, train)
        one = ConvBN(
            self.features, (1, 1), strides=self.strides, act=None,
            name="rbr_1x1",
        )(x, train)
        out = dense + one
        if self.strides == (1, 1) and x.shape[-1] == self.features:
            ident = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="rbr_identity",
            )(x)
            out = out + ident
        return nn.relu(out)


class RepBlock(nn.Module):
    """conv1 = RepVGG(in→out) followed by (n-1) RepVGG(out→out)."""

    features: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        # deploy form is a LINEAR chain of dense 3×3 convs — every
        # internal edge is single-consumer conv→conv, so the whole
        # block rides s8 end to end (TRT's whole-network int8,
        # convertOnnxToTensorRT.py:28-99); the exit emits per the
        # caller's flags
        last = self.n - 1
        x = RepVGGBlock(self.features, name="conv1")(
            x, train, emit_q=(last > 0) or emit_q,
            emit_scale=None if last > 0 else emit_scale,
        )
        for i in range(last):
            x = RepVGGBlock(self.features, name=f"block{i}")(
                x, train, emit_q=(i < last - 1) or emit_q,
                emit_scale=None if i < last - 1 else emit_scale,
            )
        return x


class BottleRep(nn.Module):
    """meituan BottleRep (m/l trunk unit): two RepVGG blocks with a
    learnable-``alpha`` weighted residual when in==out
    (layers/common.py BottleRep, weight=True in the CSPBep stacks)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # conv1 → conv2 is a clean conv edge (s8); conv2's output joins
        # the weighted residual, so it stays bf16 (QTensor cannot ride
        # the add)
        y = RepVGGBlock(self.features, name="conv1")(x, train, emit_q=True)
        y = RepVGGBlock(self.features, name="conv2")(y, train)
        if x.shape[-1] == self.features:
            alpha = self.param(
                "alpha", nn.initializers.ones, (1,), jnp.float32
            )
            y = y + alpha * x
        return y


class BepC3(nn.Module):
    """meituan BepC3 (CSP over a BottleRep RepBlock): cv1/cv2 1×1 ReLU
    branches, ``m`` = BottleRep chain of n//2 units (each = 2 RepVGGs,
    so conv count matches the n/s RepBlock), cv3 1×1 ReLU merge.
    Child names mirror the checkpoints: cv1/cv2/cv3 + m.conv1 /
    m.block.{i}."""

    features: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import (
            QTensor, qconcat, quantize_to, s8_group_record, s8_group_scale,
        )

        c_ = int(self.features * self.e)
        gscale = s8_group_scale(self)
        a = SimConv(c_, name="cv1")(x, train, emit_q=True)
        b = SimConv(c_, name="cv2")(x, train, emit_scale=gscale)
        # RepBlock(block=BottleRep): conv1 + (n//2 - 1) inner blocks
        a = BottleRep(c_, name="m_conv1")(a, train)
        for i in range(self.n // 2 - 1):
            a = BottleRep(c_, name=f"m_block{i}")(a, train)
        # the BottleRep exit is a residual add, not a conv epilogue —
        # the group quantize fuses into its elementwise chain instead
        if gscale is not None and not isinstance(a, QTensor):
            a = quantize_to(a, gscale)
        cat = qconcat([a, b])
        s8_group_record(self, cat)
        return SimConv(self.features, name="cv3")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


def _relu(x):
    return nn.relu(x)


def SimConv(features, kernel=(1, 1), strides=(1, 1), *, name):
    """conv + BN + ReLU (meituan's SimConv); ConvBN's conv/bn children
    mirror the torch ``<name>.conv`` / ``<name>.bn`` layout."""
    return ConvBN(features, kernel, strides=strides, act=_relu, name=name)


class SimSPPF(nn.Module):
    """SPPF with ReLU convs (meituan SimSPPF, k=5)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import qconcat, s8_group_record, s8_group_scale

        hidden = x.shape[-1] // 2
        gscale = s8_group_scale(self)
        # s8 concat group (same shape as yolo.SPPF): cv1 emits at the
        # group scale, the max pools commute with the positive dequant
        # scale, cv2 reads the 1-byte concat with no input quantize
        y = SimConv(hidden, name="cv1")(x, train, emit_scale=gscale)
        p1 = max_pool(y, 5, 1, pad=2)
        p2 = max_pool(p1, 5, 1, pad=2)
        p3 = max_pool(p2, 5, 1, pad=2)
        cat = qconcat([y, p1, p2, p3])
        s8_group_record(self, cat)
        return SimConv(self.features, name="cv2")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class TransposeUp(nn.Module):
    """meituan ``Transpose``: ConvTranspose2d(k=2, s=2, bias=True).

    ``transpose_kernel=True`` (kernel layout (kh, kw, out, in), applied
    spatially flipped) is REQUIRED to match torch's ConvTranspose2d —
    flax's default convention places each kernel tap at the mirrored
    output offset (caught by the TorchYOLOv6 oracle, 38% activation
    error on the neck with the default)."""

    features: int

    @nn.compact
    def __call__(self, x):
        from .layers import QTensor

        if isinstance(x, QTensor):
            # the lateral SimConv emits s8 for its CONCAT consumer (the
            # f0/f1 taps feed both a concat group and this transpose);
            # ConvTranspose is outside the int8 policy — take the bf16
            # view
            x = x.dequant()
        return nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID",
            transpose_kernel=True, name="upsample_transpose",
        )(x)


class EfficientRep(nn.Module):
    """n/s trunk; with ``csp_e`` set this is meituan's CSPBepBackbone
    (m/l): identical downsample skeleton, RepBlock stages swapped for
    BepC3 CSP stages."""

    chans: Sequence[int]
    reps: Sequence[int]
    csp_e: float = 0.0  # 0 = RepBlock (n/s); else BepC3 ratio (m/l)

    def _stage(self, c, n, name):
        if self.csp_e:
            return BepC3(c, n, self.csp_e, name=name)
        return RepBlock(c, n, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False, emit_p3=None, emit_p4=None):
        """``emit_p3``/``emit_p4``: neck concat-group scales (owned by
        :class:`YoloV6`, see there) — the p3/p4 taps emit s8 at them so
        BOTH consumers (the next downsample conv and the PAN concat)
        read 1-byte data.  Deploy form chains s8 through every other
        backbone edge: each is single-consumer conv→conv."""
        c = self.chans
        r = self.reps
        x = RepVGGBlock(c[0], strides=(2, 2), name="stem")(x, train)
        x = RepVGGBlock(c[1], strides=(2, 2), name="ERBlock_2_0")(
            x, train, emit_q=True
        )
        x = self._stage(c[1], r[1], "ERBlock_2_1")(x, train, emit_q=True)
        x = RepVGGBlock(c[2], strides=(2, 2), name="ERBlock_3_0")(
            x, train, emit_q=True
        )
        p3 = self._stage(c[2], r[2], "ERBlock_3_1")(
            x, train, emit_scale=emit_p3
        )
        x = RepVGGBlock(c[3], strides=(2, 2), name="ERBlock_4_0")(
            p3, train, emit_q=True
        )
        p4 = self._stage(c[3], r[3], "ERBlock_4_1")(
            x, train, emit_scale=emit_p4
        )
        x = RepVGGBlock(c[4], strides=(2, 2), name="ERBlock_5_0")(
            p4, train, emit_q=True
        )
        x = self._stage(c[4], r[4], "ERBlock_5_1")(x, train, emit_q=True)
        p5 = SimSPPF(c[4], name="ERBlock_5_2")(x, train, emit_q=True)
        return p3, p4, p5


class RepPANNeck(nn.Module):
    """n/s neck; with ``csp_e`` set this is meituan's CSPRepPANNeck
    (m/l): fusion RepBlocks swapped for BepC3."""

    chans: Sequence[int]
    reps: Sequence[int]
    csp_e: float = 0.0

    def _stage(self, c, n, name):
        if self.csp_e:
            return BepC3(c, n, self.csp_e, name=name)
        return RepBlock(c, n, name=name)

    @nn.compact
    def __call__(self, feats, train: bool = False, group_scales=None,
                 record=None):
        """``group_scales``: the four neck concat-group scales (owned by
        :class:`YoloV6`); ``record``: plain dict the caller passes
        during calibration — each concat's value lands under its group
        name so the OWNER can record all groups once (flax forbids
        declaring a variable from a non-owning scope)."""
        from .layers import QTensor, qconcat, quantize_to

        p3, p4, p5 = feats
        c = self.chans
        r = self.reps
        gs = group_scales or {}

        def gq(y, name):
            # concat member not produced by a conv epilogue (the
            # ConvTranspose upsamples): explicit quantize to the group
            # scale — XLA fuses it into the producer's elementwise chain
            s = gs.get(name)
            if s is not None and not isinstance(y, QTensor):
                y = quantize_to(y, s)
            return y

        def rec(y, name):
            if record is not None:
                record.setdefault(name, []).append(y)
            return y

        # f0/f1 feed BOTH a transpose upsample (int8-ineligible — it
        # dequants, TransposeUp) and a concat group: emit at the group
        # scale so the concat rides s8
        f0 = SimConv(c[5], name="reduce_layer0")(
            p5, train, emit_scale=gs.get("neck_n4_xmax")
        )
        up0 = gq(TransposeUp(c[5], name="upsample0")(f0), "neck_p4_xmax")
        y = rec(qconcat([up0, gq(p4, "neck_p4_xmax")]), "neck_p4_xmax")
        x = self._stage(c[5], r[5], "Rep_p4")(y, train, emit_q=True)
        f1 = SimConv(c[6], name="reduce_layer1")(
            x, train, emit_scale=gs.get("neck_n3_xmax")
        )
        up1 = gq(TransposeUp(c[6], name="upsample1")(f1), "neck_p3_xmax")
        y = rec(qconcat([up1, gq(p3, "neck_p3_xmax")]), "neck_p3_xmax")
        # out_p3/out_n3 have TWO conv consumers (downsample + head
        # stem) reading the same s8 tensor at the producer's scale
        out_p3 = self._stage(c[6], r[6], "Rep_p3")(y, train, emit_q=True)
        d2 = SimConv(c[7], (3, 3), strides=(2, 2), name="downsample2")(
            out_p3, train, emit_scale=gs.get("neck_n3_xmax")
        )
        y = rec(qconcat([d2, f1]), "neck_n3_xmax")
        out_n3 = self._stage(c[8], r[7], "Rep_n3")(y, train, emit_q=True)
        d1 = SimConv(c[9], (3, 3), strides=(2, 2), name="downsample1")(
            out_n3, train, emit_scale=gs.get("neck_n4_xmax")
        )
        y = rec(qconcat([d1, f0]), "neck_n4_xmax")
        out_n4 = self._stage(c[10], r[8], "Rep_n4")(y, train, emit_q=True)
        return out_p3, out_n3, out_n4


def _silu(x):
    return nn.silu(x)


class EffiDeHead(nn.Module):
    """Decoupled head, anchor-free, no DFL (meituan effidehead n/s):
    per level stem(1×1) → cls 3×3 conv → cls 1×1 pred;
                        → reg 3×3 conv → reg 1×1 pred (ltrb distances).
    Export contract: (B, N, 5+nc) with obj ≡ 1 (meituan Detect.forward
    deploy branch)."""

    spec: YoloSpec
    head_chans: Sequence[int]
    #: m/l heads regress a 17-bin distribution per box side (reg_max=16)
    #: decoded by softmax expectation — the ``proj_conv`` arange kernel
    #: in the checkpoints, computed analytically here (like v8's DFL)
    use_dfl: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        s = self.spec
        nc = s.num_classes
        reg_max = 16
        outs = []
        for li, f in enumerate(feats):
            ch = self.head_chans[li]
            # neck exits arrive s8 (emit_q); the stem emits s8 for its
            # two conv consumers (cls/reg 3×3) — the 1×1 predictors are
            # plain nn.Conv outside the int8 policy, so cls/reg outputs
            # stay bf16
            stem = ConvBN(ch, (1, 1), act=_silu, name=f"stem{li}")(
                f, train, emit_q=True
            )
            cls = ConvBN(ch, (3, 3), act=_silu, name=f"cls_conv{li}")(
                stem, train
            )
            cls = nn.Conv(nc, (1, 1), name=f"cls_pred{li}")(cls)
            reg = ConvBN(ch, (3, 3), act=_silu, name=f"reg_conv{li}")(
                stem, train
            )
            reg_out = 4 * (reg_max + 1) if self.use_dfl else 4
            reg = nn.Conv(reg_out, (1, 1), name=f"reg_pred{li}")(reg)
            b, h, w, _ = cls.shape
            if self.use_dfl:
                # channel c = coord*(reg_max+1) + bin (meituan
                # effidehead reshape([-1, 4, reg_max+1, hw]))
                r = reg.reshape(b, h * w, 4, reg_max + 1)
                r = jax.nn.softmax(r, axis=-1)
                reg = jnp.sum(
                    r * jnp.arange(reg_max + 1, dtype=jnp.float32),
                    axis=-1,
                )
            else:
                reg = reg.reshape(b, h * w, 4)
            outs.append(
                (
                    reg,
                    jax.nn.sigmoid(cls).reshape(b, h * w, nc),
                )
            )
        reg_flat = jnp.concatenate([o[0] for o in outs], axis=1)
        cls_flat = jnp.concatenate([o[1] for o in outs], axis=1)
        anchors, strides_arr = _anchor_points(s.input_size, s.strides)
        lt, rb = reg_flat[..., :2], reg_flat[..., 2:]
        x1y1 = anchors - lt
        x2y2 = anchors + rb
        cxy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        xywh = jnp.concatenate([cxy, wh], axis=-1) * strides_arr[None, :, None]
        obj = jnp.ones_like(cls_flat[..., :1])
        return jnp.concatenate([xywh, obj, cls_flat], axis=-1)


class YoloV6(nn.Module):
    """v5-output-contract YOLOv6: (B, N, 5+nc), decode baked in like the
    official export (reference decodes it on the v5 path,
    yoloDetector.py:124-133)."""

    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import s8_group_record, s8_group_scale

        scale = self.spec.scale
        chans, reps = v6_plan(scale)
        csp_e = (
            _V6_CSP_SCALES[scale][2] if scale in _V6_CSP_SCALES else 0.0
        )
        # NECK s8 concat groups (TRT int8-concat): four independent
        # groups, one per PAN concat — no producer feeds two concats
        # here (the f0/f1 taps reach the opposite concat only THROUGH
        # the transpose upsample, which transforms the tensor, so
        # TRT's scale propagation would not merge them).  Members span
        # module scopes (backbone p3/p4 taps, neck laterals), so THIS
        # module owns the group variables and the submodules emit /
        # record through explicit plumbing.
        names = (
            "neck_p4_xmax", "neck_p3_xmax", "neck_n3_xmax", "neck_n4_xmax"
        )
        gs = {n: s8_group_scale(self, n) for n in names}
        recs: dict = {}
        feats = EfficientRep(chans, reps, csp_e, name="backbone")(
            x, train, emit_p3=gs["neck_p3_xmax"], emit_p4=gs["neck_p4_xmax"]
        )
        feats = RepPANNeck(chans, reps, csp_e, name="neck")(
            feats, train, group_scales=gs, record=recs
        )
        for n in names:
            if recs.get(n):
                s8_group_record(self, recs[n], name=n)
        head_chans = (chans[6], chans[8], chans[10])
        return EffiDeHead(
            self.spec, head_chans, use_dfl=bool(csp_e), name="detect"
        )(feats, train)


_REPVGG_EPS = 1e-5  # both torch BatchNorm2d and the flax BNs above


def fuse_repvgg_variables(variables: dict) -> dict:
    """RepVGG ``switch_to_deploy`` on an ingested flax tree.

    Every subtree carrying ``rbr_dense``/``rbr_1x1`` (and optionally
    ``rbr_identity``) collapses EXACTLY into the single-conv deploy form
    RepVGGBlock serves when it finds ``fused`` in its bound params: one
    HWIO 3×3 kernel with the summed branch biases riding an identity BN
    (scale=1, mean=0, var=1-eps).  Applied once at facade load
    (perception/object_detector._load_weights) — the serving analogue of
    what TensorRT's builder does offline with meituan's deploy exports
    (/root/reference/convertOnnxToTensorRT.py:150-173 builds from the
    already-fused ONNX).  Non-RepVGG subtrees (BottleRep ``alpha``,
    heads, plain ConvBNs) pass through untouched.
    """
    import numpy as np

    def fold(kern, bnp, bns):
        t = np.asarray(bnp["scale"], np.float32) / np.sqrt(
            np.asarray(bns["var"], np.float32) + _REPVGG_EPS
        )
        bias = (
            np.asarray(bnp["bias"], np.float32)
            - np.asarray(bns["mean"], np.float32) * t
        )
        return np.asarray(kern, np.float32) * t, bias

    def fuse_node(p, s):
        k, b = fold(
            p["rbr_dense"]["conv"]["kernel"],
            p["rbr_dense"]["bn"], s["rbr_dense"]["bn"],
        )
        k1 = np.pad(
            np.asarray(p["rbr_1x1"]["conv"]["kernel"], np.float32),
            ((1, 1), (1, 1), (0, 0), (0, 0)),
        )
        ka, ba = fold(k1, p["rbr_1x1"]["bn"], s["rbr_1x1"]["bn"])
        k, b = k + ka, b + ba
        if "rbr_identity" in p:
            cin, cout = k.shape[2], k.shape[3]
            kid = np.zeros(k.shape, np.float32)
            kid[1, 1, np.arange(cin), np.arange(cout)] = 1.0
            ki, bi = fold(kid, p["rbr_identity"], s["rbr_identity"])
            k, b = k + ki, b + bi
        o = k.shape[3]
        pn = {
            "fused": {
                "conv": {"kernel": k.astype(np.float32)},
                "bn": {
                    "scale": np.ones(o, np.float32),
                    "bias": b.astype(np.float32),
                },
            }
        }
        sn = {
            "fused": {
                "bn": {
                    "mean": np.zeros(o, np.float32),
                    "var": np.full(o, 1.0 - _REPVGG_EPS, np.float32),
                }
            }
        }
        return pn, sn

    def walk(p, s):
        if isinstance(p, dict) and "rbr_dense" in p:
            return fuse_node(p, s if isinstance(s, dict) else {})
        if not isinstance(p, dict):
            return p, s
        keys = set(p) | set(s if isinstance(s, dict) else {})
        new_p, new_s = {}, {}
        for key in keys:
            a, c = walk(
                p.get(key), s.get(key) if isinstance(s, dict) else None
            )
            if a is not None:
                new_p[key] = a
            if c is not None and not (isinstance(c, dict) and not c):
                new_s[key] = c
        return new_p, new_s

    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    new_params, new_stats = walk(params, stats)
    out = {
        k: v for k, v in variables.items()
        if k not in ("params", "batch_stats")
    }
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out
