"""Ultra-Fast Lane Detection v1/v2 networks in flax (NHWC).

Architecture parity with the reference export nets:
* v1 — ResNet trunk -> 1x1 conv 512->8 -> flatten -> MLP(1800, 2048,
  (griding+1)*rows*4) reshaped to (griding+1, rows, lanes)
  (exportLib/ultrafastLane/model.py:61-96).
* v2 — ResNet trunk -> 1x1 conv ->8ch -> flatten (h/32*w/32*8) ->
  [LayerNorm] -> MLP 2048 -> concat logits split into
  loc_row/loc_col/exist_row/exist_col
  (exportLib/ultrafastLaneV2/model_culane.py:33-63).

Dataset geometry comes from the reference training configs
(exportLib/ultrafastLaneV2/configs/*.py) and runtime ModelConfig
(ultrafastLaneDetectorV2.py:21-55).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.types import LaneModelType
from .layers import head_dense
from .resnet import ResNetFeatures


@dataclass(frozen=True)
class UFLDv2Spec:
    """Static geometry of a UFLDv2 variant."""

    input_height: int
    input_width: int
    crop_ratio: float
    num_cell_row: int  # griding cells along x for row anchors
    num_row: int  # row anchors
    num_cell_col: int  # griding cells along y for column anchors
    num_col: int  # column anchors
    num_lanes: int = 4
    fc_norm: bool = True
    backbone: str = "18"
    mlp_mid: int = 2048

    # visualisation-space geometry (reference ModelConfig img_w/img_h)
    img_w: int = 1600
    img_h: int = 320

    @property
    def row_anchor(self) -> np.ndarray:
        if self.num_row == 56:  # tusimple
            return np.linspace(160, 710, 56) / 720
        if self.input_height == 800:  # curvelanes
            return np.linspace(0.4, 1, 72)
        return np.linspace(0.42, 1, 72)  # culane

    @property
    def col_anchor(self) -> np.ndarray:
        return np.linspace(0, 1, self.num_col)

    @property
    def dims(self) -> Tuple[int, int, int, int]:
        d1 = self.num_cell_row * self.num_row * self.num_lanes
        d2 = self.num_cell_col * self.num_col * self.num_lanes
        d3 = 2 * self.num_row * self.num_lanes
        d4 = 2 * self.num_col * self.num_lanes
        return d1, d2, d3, d4


UFLDV2_SPECS: Dict[LaneModelType, UFLDv2Spec] = {
    LaneModelType.UFLDV2_CULANE: UFLDv2Spec(
        input_height=320, input_width=1600, crop_ratio=0.6,
        num_cell_row=200, num_row=72, num_cell_col=100, num_col=81,
        fc_norm=True, img_w=1600, img_h=320,
    ),
    LaneModelType.UFLDV2_TUSIMPLE: UFLDv2Spec(
        input_height=320, input_width=800, crop_ratio=0.8,
        num_cell_row=100, num_row=56, num_cell_col=100, num_col=41,
        fc_norm=False, img_w=800, img_h=320,
    ),
    LaneModelType.UFLDV2_CURVELANES: UFLDv2Spec(
        input_height=800, input_width=1600, crop_ratio=0.8,
        num_cell_row=200, num_row=72, num_cell_col=100, num_col=41,
        fc_norm=True, img_w=1600, img_h=800,
    ),
}


class SegHead(nn.Module):
    """Aux segmentation head for UFLDv2 training (reference
    exportLib/ultrafastLaneV2/seg_model.py:16-55): three lateral conv
    stacks over C2/C3/C5 + dilated combine to (lanes+1) logits."""

    num_lanes: int
    dtype: object = jnp.float32

    def _cbr(self, x, features, name, dilation=1, train=False):
        p = dilation
        x = nn.Conv(
            features, (3, 3), padding=((p, p), (p, p)),
            kernel_dilation=(dilation, dilation), use_bias=False,
            dtype=self.dtype, name=name + "_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name + "_bn",
        )(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x2, x3, fea, train: bool = False):
        h2 = x2
        for i in range(4):
            h2 = self._cbr(h2, 128, f"aux2_{i}", train=train)
        h3 = x3
        for i in range(3):
            h3 = self._cbr(h3, 128, f"aux3_{i}", train=train)
        b, hh, ww, c = h3.shape
        h3 = jax.image.resize(h3, (b, hh * 2, ww * 2, c), "bilinear")
        h4 = fea
        for i in range(2):
            h4 = self._cbr(h4, 128, f"aux4_{i}", train=train)
        b, hh, ww, c = h4.shape
        h4 = jax.image.resize(h4, (b, hh * 4, ww * 4, c), "bilinear")
        seg = jnp.concatenate([h2, h3, h4], axis=-1)
        seg = self._cbr(seg, 256, "comb0", dilation=2, train=train)
        seg = self._cbr(seg, 128, "comb1", dilation=2, train=train)
        seg = self._cbr(seg, 128, "comb2", dilation=2, train=train)
        seg = self._cbr(seg, 128, "comb3", dilation=4, train=train)
        return nn.Conv(
            self.num_lanes + 1, (1, 1), dtype=self.dtype, name="comb4"
        )(seg)


class UFLDv2Net(nn.Module):
    """UFLDv2: anchor-classification lane detector.

    ``tta=True`` reproduces the reference's 5-way shifted-feature
    test-time augmentation (model_culane.py:65-96): the pooled feature
    map is shifted left/right/up/down (mean-filled at the border), all 5
    variants run through the shared classifier, stacked on the batch dim.
    ``use_aux`` adds the training-only segmentation head.
    """

    spec: UFLDv2Spec
    dtype: object = jnp.float32
    use_aux: bool = False

    @property
    def stem_s2d_ok(self) -> bool:
        """ResNet's 7x7/2 stem is polyphase-evaluated (resnet.StemConv),
        so it consumes pre-space-to-depth input (ops/preprocess
        S2DInput) from the planar serving path."""
        return True

    @property
    def stem_planes_margins(self):
        """S2DPlanes margins for the Pallas fused ResNet stem chain
        (conv7x7/2 + bn + relu + maxpool3x3/2 — pool fused)."""
        from ..ops.pallas_stem import stem_margins

        return stem_margins(7, 7, True)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, tta: bool = False
    ) -> Dict[str, jnp.ndarray]:
        s = self.spec
        x2, x3, fea = ResNetFeatures(
            depth=s.backbone, dtype=self.dtype, name="backbone"
        )(x, train=train)
        seg_out = None
        if self.use_aux:
            seg_out = SegHead(
                s.num_lanes, dtype=self.dtype, name="seg_head"
            )(x2, x3, fea, train=train)
        fea = nn.Conv(8, (1, 1), use_bias=True, dtype=self.dtype, name="pool")(
            fea
        )
        if tta:
            # shifted copies along W / H, border replaced by the mean
            w_mean = fea.mean(axis=2, keepdims=True)
            h_mean = fea.mean(axis=1, keepdims=True)
            left = jnp.concatenate([fea[:, :, 1:, :], w_mean], axis=2)
            right = jnp.concatenate([w_mean, fea[:, :, :-1, :]], axis=2)
            up = jnp.concatenate([fea[:, 1:, :, :], h_mean], axis=1)
            down = jnp.concatenate([h_mean, fea[:, :-1, :, :]], axis=1)
            fea = jnp.concatenate([fea, left, right, up, down], axis=0)
        # torch flattens NCHW (c, h, w); transpose so ingested FC weights
        # line up with the same element order.
        b = fea.shape[0]
        fea = fea.transpose(0, 3, 1, 2).reshape(b, -1)
        if s.fc_norm:
            fea = nn.LayerNorm(dtype=self.dtype, name="cls_norm")(fea)
        # head_dense: these FCs are the trunk's biggest HBM readers
        # (cls_fc2 CULane streams ~492 MB f32 weights/step) — under
        # quantized("int8") they serve as W8A8 Int8Dense, same params
        h = head_dense(s.mlp_mid, "cls_fc1", dtype=self.dtype)(fea)
        h = nn.relu(h)
        out = head_dense(sum(s.dims), "cls_fc2", dtype=self.dtype)(h)

        d1, d2, d3, d4 = s.dims
        loc_row = out[:, :d1].reshape(b, s.num_cell_row, s.num_row, s.num_lanes)
        loc_col = out[:, d1 : d1 + d2].reshape(
            b, s.num_cell_col, s.num_col, s.num_lanes
        )
        exist_row = out[:, d1 + d2 : d1 + d2 + d3].reshape(
            b, 2, s.num_row, s.num_lanes
        )
        exist_col = out[:, d1 + d2 + d3 :].reshape(b, 2, s.num_col, s.num_lanes)
        result = {
            "loc_row": loc_row,
            "loc_col": loc_col,
            "exist_row": exist_row,
            "exist_col": exist_col,
        }
        if seg_out is not None:
            result["seg_out"] = seg_out
        return result


class UFLDv2CurveLanesNet(nn.Module):
    """UFLDv2 CurveLanes variant: the 20-lane-token conv head (reference
    exportLib/ultrafastLaneV2/model_curvelanes.py:34-75).

    ``cls_distribute`` (two 3×3 convs) emits 20 per-lane token maps; the
    pooled 8-channel feature map is replicated per token and concatenated
    with that token's map, giving 20 rows of a 9·(H/32)·(W/32) feature
    each run through the shared LayerNorm→MLP; row tokens 0-9 feed the
    row classifier, col tokens 10-19 the column classifier.  Outputs use
    the same loc/exist dict contract as the 4-lane head plus the summed
    ``lane_token_row``/``lane_token_col`` maps.
    """

    spec: UFLDv2Spec
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        s = self.spec
        _x2, _x3, fea = ResNetFeatures(
            depth=s.backbone, dtype=self.dtype, name="backbone"
        )(x, train=train)
        t = nn.Conv(
            128, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="cls_distribute0",
        )(fea)
        t = nn.relu(t)
        t = nn.Conv(
            20, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="cls_distribute2",
        )(t)
        pooled = nn.Conv(8, (1, 1), dtype=self.dtype, name="pool")(fea)

        b, hh, ww, _ = pooled.shape
        tok = t.transpose(0, 3, 1, 2)  # (B, 20, h, w) torch layout
        pooled_n = pooled.transpose(0, 3, 1, 2)  # (B, 8, h, w)
        rep = jnp.broadcast_to(
            pooled_n[:, None], (b, 20, 8, hh, ww)
        )
        fea9 = jnp.concatenate([rep, tok[:, :, None]], axis=2)
        # torch .view(-1, 9*h*w): channel-major per (batch, token) row
        flat = fea9.reshape(b * 20, 9 * hh * ww)
        flat = nn.LayerNorm(dtype=self.dtype, name="cls_norm")(flat)
        h1 = nn.relu(
            head_dense(s.mlp_mid, "cls_fc1", dtype=self.dtype)(flat)
        )
        out = h1.reshape(b, 20, s.mlp_mid)

        d1 = s.num_cell_row * s.num_row
        d3 = s.num_cell_col * s.num_col
        out_row = head_dense(
            d1 + 2 * s.num_row, "cls_row", dtype=self.dtype
        )(out[:, :10]).transpose(0, 2, 1)
        out_col = head_dense(
            d3 + 2 * s.num_col, "cls_col", dtype=self.dtype
        )(out[:, 10:]).transpose(0, 2, 1)
        return {
            "loc_row": out_row[:, :d1].reshape(
                b, s.num_cell_row, s.num_row, 10
            ),
            "loc_col": out_col[:, :d3].reshape(
                b, s.num_cell_col, s.num_col, 10
            ),
            "exist_row": out_row[:, d1:].reshape(b, 2, s.num_row, 10),
            "exist_col": out_col[:, d3:].reshape(b, 2, s.num_col, 10),
            "lane_token_row": tok[:, :10].sum(axis=1),
            "lane_token_col": tok[:, 10:].sum(axis=1),
        }


@dataclass(frozen=True)
class UFLDv1Spec:
    """Static geometry of a UFLD v1 variant."""

    input_height: int = 288
    input_width: int = 800
    griding_num: int = 100
    cls_num_per_lane: int = 56
    num_lanes: int = 4
    backbone: str = "18"
    mlp_mid: int = 2048
    img_w: int = 1280
    img_h: int = 720
    row_anchor: tuple = field(
        default_factory=lambda: tuple(np.linspace(64, 284, 56))
    )


UFLDV1_SPECS: Dict[LaneModelType, UFLDv1Spec] = {
    LaneModelType.UFLD_TUSIMPLE: UFLDv1Spec(
        griding_num=100, cls_num_per_lane=56, img_w=1280, img_h=720,
        row_anchor=tuple(np.linspace(64, 284, 56)),
    ),
    LaneModelType.UFLD_CULANE: UFLDv1Spec(
        griding_num=200, cls_num_per_lane=18, img_w=1640, img_h=590,
        row_anchor=tuple(
            round(v) for v in np.linspace(121, 287, 18)
        ),
    ),
}


class UFLDv1Net(nn.Module):
    """UFLD v1: grid-classification lane detector."""

    spec: UFLDv1Spec
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = self.spec
        _, _, fea = ResNetFeatures(
            depth=s.backbone, dtype=self.dtype, name="backbone"
        )(x, train=train)
        fea = nn.Conv(8, (1, 1), use_bias=True, dtype=self.dtype, name="pool")(
            fea
        )
        b = fea.shape[0]
        fea = fea.transpose(0, 3, 1, 2).reshape(b, -1)  # 8*(h/32)*(w/32)=1800
        h = head_dense(s.mlp_mid, "cls_fc1", dtype=self.dtype)(fea)
        h = nn.relu(h)
        out = head_dense(
            (s.griding_num + 1) * s.cls_num_per_lane * s.num_lanes,
            "cls_fc2",
            dtype=self.dtype,
        )(h)
        return out.reshape(
            b, s.griding_num + 1, s.cls_num_per_lane, s.num_lanes
        )
