"""YOLOv5-Lite (ppogg/YOLOv5-Lite e/s/g) in flax — the real ShuffleNetV2
trunk for e/s and the RepVGG trunk (deploy form) for g, not the v5
stand-in previously aliased.

The reference supports v5-Lite exports as a *decode contract*: the ONNX
graph stops before the anchor/grid transform and emits sigmoided
``(N, 5+nc)`` rows, which ``YoloLiteParameters.lite_postprocess``
(reference ObjectDetector/yoloDetector.py:18-50) grid-decodes on the
host.  This module supplies the matching *network*: the upstream
v5-Lite-e/s topology —

* ``StemBlock`` — 3×3/2 conv, then a (1×1 → 3×3/2) conv branch concat a
  2×2 ceil-mode max-pool branch, fused by a 1×1 conv (upstream
  models/common.py StemBlock).  Output stride 4.
* ``ShuffleV2Block`` — the ShuffleNetV2 unit: stride-1 form splits
  channels and transforms one half (1×1 → 3×3dw → 1×1, ReLU on the
  pointwise convs), stride-2 form transforms both branches; concat then
  channel-shuffle with 2 groups.
* v5-style PAN neck at a single width (96 for s, 64 for e) built from
  ``C3`` blocks, lateral 1×1 reductions and nearest-2× upsampling.
* Anchor head: per-level 1×1 convs to ``na*(5+nc)`` channels.  The
  serving output applies sigmoid and flattens **anchor-major** per level
  (``(b, na, h, w, no) → (b, na·h·w, no)``) so row order matches the
  reference's ``np.tile(grid, (na, 1))`` decode — consumed here by
  ``ops/yolo_decode.v5lite_grid_decode``.

Activation convention: ReLU inside shuffle blocks (ShuffleNetV2) and
SiLU in the Conv/C3 neck cells, matching the v5 family default.  The
e/s channel plans follow the upstream v5lite-e/s yamls; checkpoint
fidelity is validated structurally (full-tree bijection) like the other
families — no pretrained weights exist in this offline environment.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, resize_nearest_2x
from .yolo import C3, V5_ANCHORS, YoloSpec

#: scale -> (stem_ch, (stage1, stage2, stage3) ch, per-stage stride-1
#: repeats, neck/head width)
V5LITE_PLANS = {
    "e": (24, (48, 96, 192), (3, 7, 3), 64),
    "s": (32, (116, 232, 464), (3, 7, 3), 96),
}

#: v5lite-g: the RepVGG trunk variant (upstream v5lite-g.yaml uses
#: models/common.py RepVGGBlock).  Widths/depths follow the RepVGG-A0
#: profile the upstream g model is built from (48/48/96/192 stages, the
#: 1280-wide classifier stage replaced by a 384-wide detection stage);
#: each stage's first block is stride 2, P3/P4/P5 tap stages 2/3/4, SPP
#: (5/9/13) caps P5 and a single-width (128) v5 PAN follows.  Layout is
#: reconstructed — the released .pt defines ground truth and no network
#: code ships with the reference (it consumes ONNX exports only:
#: /root/reference/ObjectDetector/utils.py:15-23) — but block semantics
#: are validated end-to-end against a train-form torch twin
#: (tests/torch_nets_detect.TorchYOLOv5LiteG) through the ingest-time
#: re-parameterization below.
V5LITE_G_PLAN = {
    "widths": (48, 48, 96, 192, 384),
    "blocks": (1, 2, 4, 14, 1),
    "neck": 128,
}


def _neck_width(scale: str) -> int:
    """Single PAN width per scale (64/96/128 for e/s/g)."""
    if scale == "g":
        return V5LITE_G_PLAN["neck"]
    return V5LITE_PLANS[scale][3]


def channel_shuffle2(x: jnp.ndarray) -> jnp.ndarray:
    """ShuffleNetV2 channel shuffle with 2 groups (NHWC): interleave the
    two concatenated branch halves."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h, w, 2, c // 2)
        .transpose(0, 1, 2, 4, 3)
        .reshape(b, h, w, c)
    )


class StemBlock(nn.Module):
    """v5-Lite stem (upstream models/common.py StemBlock): output
    stride 4 via two stride-2 convs on one branch and conv+maxpool on
    the other."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features
        s1 = ConvBN(c, (3, 3), strides=(2, 2), name="stem_1")(x, train)
        y = ConvBN(c // 2, (1, 1), name="stem_2a")(s1, train)
        y = ConvBN(c, (3, 3), strides=(2, 2), name="stem_2b")(y, train)
        # torch MaxPool2d(2, 2, ceil_mode=True): pad bottom/right when odd
        h, w = s1.shape[1], s1.shape[2]
        p = nn.max_pool(
            s1, (2, 2), strides=(2, 2),
            padding=((0, h % 2), (0, w % 2)),
        )
        return ConvBN(c, (1, 1), name="stem_3")(
            jnp.concatenate([y, p], axis=-1), train
        )


class ShuffleV2Block(nn.Module):
    """ShuffleNetV2 unit (upstream Shuffle_Block).  ``features`` is the
    block output width; each branch carries ``features // 2``."""

    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bf = self.features // 2
        down = self.strides != (1, 1)
        if down:
            b1 = ConvBN(
                x.shape[-1], (3, 3), strides=self.strides,
                groups=x.shape[-1], act=None, name="b1_dw",
            )(x, train)
            b1 = ConvBN(bf, (1, 1), act=nn.relu, name="b1_pw")(b1, train)
            b2_in = x
        else:
            b1, b2_in = jnp.split(x, 2, axis=-1)
        y = ConvBN(bf, (1, 1), act=nn.relu, name="b2_pw1")(b2_in, train)
        y = ConvBN(
            bf, (3, 3), strides=self.strides, groups=bf, act=None,
            name="b2_dw",
        )(y, train)
        y = ConvBN(bf, (1, 1), act=nn.relu, name="b2_pw2")(y, train)
        return channel_shuffle2(jnp.concatenate([b1, y], axis=-1))


class SPPv5(nn.Module):
    """v5 SPP (ultralytics models/common.py SPP, k=(5, 9, 13)): cv1 to
    half width, three PARALLEL max pools of the cv1 output, concat of
    all four, cv2.  (SPPF is the cascaded refactor; the g trunk uses the
    original parallel form.)  Runs the pools in the s8 domain under int8
    like SPPF (max commutes with the positive dequant scale)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False, emit_q: bool = False,
                 emit_scale=None):
        from .layers import (
            max_pool,
            qconcat,
            s8_group_record,
            s8_group_scale,
        )

        hidden = x.shape[-1] // 2
        gscale = s8_group_scale(self)
        y = ConvBN(hidden, (1, 1), name="cv1")(x, train, emit_scale=gscale)
        pools = [max_pool(y, k, 1, pad=k // 2) for k in (5, 9, 13)]
        cat = qconcat([y, *pools])
        s8_group_record(self, cat)
        return ConvBN(self.features, (1, 1), name="cv2")(
            cat, train, emit_q=emit_q, emit_scale=emit_scale
        )


class RepBackbone(nn.Module):
    """v5lite-g backbone: RepVGG stages in DEPLOY form.

    The upstream train-form block is three branches — 3×3 conv+BN, 1×1
    conv+BN, identity BN — summed then ReLU'd (DingXiaoH RepVGG,
    arXiv:2101.03697).  Serving three branches costs three HBM-bound
    passes plus two elementwise adds per block; the whole point of the
    architecture is that they collapse EXACTLY into one 3×3 conv + bias
    ("switch_to_deploy").  We do that collapse at checkpoint INGEST
    (tools/yolo_import.fuse_repvgg_state), so the native graph is the
    single-conv form: each block is a plain ConvBN(3×3, ReLU) whose BN
    carries identity stats with the fused bias in ``bn/bias`` — which
    means every int8 / s8-chain / Pallas / polyphase-stem policy in
    layers.py applies to the g trunk unchanged.  Parity of the fusion is
    proven against the train-form torch twin (test_detect_parity)."""

    @nn.compact
    def __call__(self, x, train: bool = False, emit_p3=None, emit_p4=None):
        """``emit_p3``/``emit_p4``: neck concat-group scales (owned by
        :class:`YoloV5Lite`) — the p3/p4 taps emit s8 at them so both
        consumers (next stage's conv and the PAN concat) read 1-byte
        data.  Every other deploy-form edge is single-consumer
        conv→conv and chains per-producer."""
        widths = V5LITE_G_PLAN["widths"]
        blocks = V5LITE_G_PLAN["blocks"]
        feats = []
        for si, (w, n) in enumerate(zip(widths, blocks)):
            # stage exits at the p3/p4 taps emit at the neck group
            # scale; every other edge (internal chain + non-tap exits,
            # whose single consumer is the next conv) emits per-producer.
            # Intent named explicitly (ADVICE r4): the LAST block of a
            # TAP stage is the only emission at the group scale.
            tap = {2: emit_p3, 3: emit_p4}.get(si)
            is_tap_stage = si in (2, 3)

            def _flags(is_last_block):
                is_tap_exit = is_tap_stage and is_last_block
                return {
                    "emit_q": not is_tap_exit,
                    "emit_scale": tap if is_tap_exit else None,
                }

            x = ConvBN(
                w, (3, 3), strides=(2, 2), act=nn.relu,
                name=f"rep{si}_0",
            )(x, train, **_flags(is_last_block=n == 1))
            for bi in range(1, n):
                x = ConvBN(
                    w, (3, 3), act=nn.relu, name=f"rep{si}_{bi}"
                )(
                    x, train,
                    **_flags(is_last_block=bi == n - 1),
                )
            if si in (2, 3):
                feats.append(x)
        x = SPPv5(widths[4], name="spp")(x, train, emit_q=True)
        feats.append(x)
        return tuple(feats)


class LiteBackbone(nn.Module):
    """StemBlock + three ShuffleNetV2 stages → (P3, P4, P5) at strides
    (8, 16, 32)."""

    scale: str = "s"

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_ch, stages, repeats, _ = V5LITE_PLANS[self.scale]
        x = StemBlock(stem_ch, name="stem")(x, train)
        feats = []
        for si, (ch, reps) in enumerate(zip(stages, repeats)):
            x = ShuffleV2Block(
                ch, strides=(2, 2), name=f"stage{si}_down"
            )(x, train)
            for ri in range(reps):
                x = ShuffleV2Block(ch, name=f"stage{si}_{ri}")(x, train)
            feats.append(x)
        return tuple(feats)


class LitePAN(nn.Module):
    """v5-style PAN at a single width (upstream v5lite yaml head):
    lateral 1×1s, nearest-2× up, C3 fusions, stride-2 down path that
    concatenates the lateral outputs."""

    scale: str = "s"

    @nn.compact
    def __call__(self, feats, train: bool = False, group_scales=None,
                 record=None):
        """``group_scales``/``record``: the two unified neck concat
        groups (owned by :class:`YoloV5Lite` — members span backbone
        and neck scopes): l5 feeds both the fpn4 and pan5 concats
        (group "a"), l4 feeds both fpn3 and pan4 (group "b") — TRT's
        scale propagation merges concats sharing a producer."""
        from .layers import QTensor, qconcat, quantize_to

        p3, p4, p5 = feats
        w = _neck_width(self.scale)
        gs = group_scales or {}
        ga, gb = gs.get("a"), gs.get("b")

        def gq(y, s):
            # backbone taps not produced by a conv epilogue (the lite
            # trunks' shuffle blocks end in a channel shuffle): explicit
            # quantize into the group
            if s is not None and not isinstance(y, QTensor):
                y = quantize_to(y, s)
            return y

        def rec(y, name):
            if record is not None:
                record.setdefault(name, []).append(y)
            return y

        l5 = ConvBN(w, (1, 1), name="lat5")(p5, train, emit_scale=ga)
        y = rec(qconcat([resize_nearest_2x(l5), gq(p4, ga)]), "a")
        t4 = C3(w, 1, False, name="fpn4")(y, train, emit_q=True)
        l4 = ConvBN(w, (1, 1), name="lat4")(t4, train, emit_scale=gb)
        y = rec(qconcat([resize_nearest_2x(l4), gq(p3, gb)]), "b")
        n3 = C3(w, 1, False, name="fpn3")(y, train)
        y = ConvBN(w, (3, 3), strides=(2, 2), name="pan3")(
            n3, train, emit_scale=gb
        )
        y = rec(qconcat([y, l4]), "b")
        n4 = C3(w, 1, False, name="pan4")(y, train)
        y = ConvBN(w, (3, 3), strides=(2, 2), name="pan5_down")(
            n4, train, emit_scale=ga
        )
        y = rec(qconcat([y, l5]), "a")
        n5 = C3(w, 1, False, name="pan5")(y, train)
        return n3, n4, n5


class YoloV5Lite(nn.Module):
    """v5-Lite-contract detector: sigmoided pre-grid ``(B, N, 5+nc)``
    rows, anchor-major per level — exactly what the reference's
    ``lite_postprocess`` (yoloDetector.py:36-50) expects to receive from
    an export."""

    spec: YoloSpec

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import s8_group_record, s8_group_scale

        s = self.spec
        nc = s.num_classes
        scale = s.scale if s.scale in (*V5LITE_PLANS, "g") else "s"
        # unified neck concat groups (see LitePAN): owned here because
        # the g trunk's p3/p4 taps emit into them from the backbone
        ga = s8_group_scale(self, "neck_a_xmax")
        gb = s8_group_scale(self, "neck_b_xmax")
        recs: dict = {}
        if scale == "g":
            feats = RepBackbone(name="backbone")(
                x, train, emit_p3=gb, emit_p4=ga
            )
        else:
            feats = LiteBackbone(scale, name="backbone")(x, train)
        feats = LitePAN(scale, name="neck")(
            feats, train, group_scales={"a": ga, "b": gb}, record=recs
        )
        for key, name in (("a", "neck_a_xmax"), ("b", "neck_b_xmax")):
            if recs.get(key):
                s8_group_record(self, recs[key], name=name)
        na = len(V5_ANCHORS[0])
        outs = []
        for li, f in enumerate(feats):
            p = nn.Conv(na * (5 + nc), (1, 1), name=f"head{li}")(f)
            b, h, w, _ = p.shape
            p = jax.nn.sigmoid(p.reshape(b, h, w, na, 5 + nc))
            # anchor-major row order (reference np.tile(grid, (na, 1)))
            outs.append(
                p.transpose(0, 3, 1, 2, 4).reshape(b, na * h * w, 5 + nc)
            )
        return jnp.concatenate(outs, axis=1)
