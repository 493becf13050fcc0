"""Torch oracle networks for YOLOv6 / YOLOv7 / EfficientDet parity.

Independent torch implementations of the detector topologies the
reference serves through ONNX exports (meituan YOLOv6 EfficientRep,
WongKinYiu YOLOv7 E-ELAN, zylo117 EfficientDet), with state-dict key
names matching the RELEASED checkpoints exactly — so
``tools/yolo_import.yolov6_mapping`` / ``yolov7_mapping`` /
``tools/efficientdet_import`` ingest their random weights and the JAX
forwards can be asserted activation-equal (the faithfulness proof
missing from the structural bijection tests).

Reference consumption points: /root/reference/ObjectDetector/utils.py:
15-23 (model enum), yoloDetector.py:110-133 (v5-contract decode used for
v6/v7 exports), efficientdetDetector.py:38.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def swish(x):
    return x * torch.sigmoid(x)


# --------------------------------------------------------------------------
# YOLOv6 (meituan EfficientRep / RepPAN, training-form checkpoints)
# --------------------------------------------------------------------------


class CB(nn.Module):
    """conv+bn (+act) with meituan's child names ``conv`` / ``bn``."""

    def __init__(self, cin, cout, k=1, s=1, act=None, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(
            cin, cout, k, s, k // 2, groups=groups, bias=False
        )
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        y = self.bn(self.conv(x))
        if self.act == "relu":
            y = F.relu(y)
        elif self.act == "silu":
            y = F.silu(y)
        return y


class TorchRepVGGBlock(nn.Module):
    """meituan RepVGGBlock, training (unfused) form: 3x3+BN || 1x1+BN
    (+ identity BN when in==out, stride 1), summed, ReLU."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.rbr_dense = CB(cin, cout, 3, stride)
        self.rbr_1x1 = CB(cin, cout, 1, stride)
        self.rbr_identity = (
            nn.BatchNorm2d(cout) if cin == cout and stride == 1 else None
        )

    def forward(self, x):
        out = self.rbr_dense(x) + self.rbr_1x1(x)
        if self.rbr_identity is not None:
            out = out + self.rbr_identity(x)
        return F.relu(out)


class TorchRepBlock(nn.Module):
    def __init__(self, cin, cout, n=1):
        super().__init__()
        self.conv1 = TorchRepVGGBlock(cin, cout)
        self.block = (
            nn.ModuleList(
                TorchRepVGGBlock(cout, cout) for _ in range(n - 1)
            )
            if n > 1
            else None
        )

    def forward(self, x):
        x = self.conv1(x)
        if self.block is not None:
            for b in self.block:
                x = b(x)
        return x



class TorchBottleRep(nn.Module):
    """meituan BottleRep: two RepVGGs + alpha-weighted residual."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = TorchRepVGGBlock(cin, cout)
        self.conv2 = TorchRepVGGBlock(cout, cout)
        self.shortcut = cin == cout
        if self.shortcut:
            self.alpha = nn.Parameter(torch.ones(1))

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return y + self.alpha * x if self.shortcut else y


class _RepBlockBottle(nn.Module):
    """RepBlock(block=BottleRep): conv1 + block.{0..n//2-2}."""

    def __init__(self, cin, cout, n):
        super().__init__()
        self.conv1 = TorchBottleRep(cin, cout)
        k = n // 2
        self.block = (
            nn.ModuleList(TorchBottleRep(cout, cout) for _ in range(k - 1))
            if k > 1
            else None
        )

    def forward(self, x):
        x = self.conv1(x)
        if self.block is not None:
            for b in self.block:
                x = b(x)
        return x


class TorchBepC3(nn.Module):
    def __init__(self, cin, cout, n, e):
        super().__init__()
        c_ = int(cout * e)
        self.cv1 = CB(cin, c_, 1, act="relu")
        self.cv2 = CB(cin, c_, 1, act="relu")
        self.cv3 = CB(2 * c_, cout, 1, act="relu")
        self.m = _RepBlockBottle(c_, c_, n)

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


def _v6_stage(cin, cout, n, csp_e):
    if csp_e:
        return TorchBepC3(cin, cout, n, csp_e)
    return TorchRepBlock(cin, cout, n)


class TorchSimSPPF(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        c_ = cin // 2
        self.cv1 = CB(cin, c_, 1, act="relu")
        self.cv2 = CB(c_ * 4, cout, 1, act="relu")

    def forward(self, x):
        y = self.cv1(x)
        p1 = F.max_pool2d(y, 5, 1, 2)
        p2 = F.max_pool2d(p1, 5, 1, 2)
        p3 = F.max_pool2d(p2, 5, 1, 2)
        return self.cv2(torch.cat([y, p1, p2, p3], 1))


class _Transpose(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.upsample_transpose = nn.ConvTranspose2d(c, c, 2, 2, bias=True)

    def forward(self, x):
        return self.upsample_transpose(x)


class _ERBackbone(nn.Module):
    def __init__(self, chans, reps, csp_e=0.0):
        super().__init__()
        c, r = chans, reps
        self.stem = TorchRepVGGBlock(3, c[0], 2)
        self.ERBlock_2 = nn.Sequential(
            TorchRepVGGBlock(c[0], c[1], 2),
            _v6_stage(c[1], c[1], r[1], csp_e),
        )
        self.ERBlock_3 = nn.Sequential(
            TorchRepVGGBlock(c[1], c[2], 2),
            _v6_stage(c[2], c[2], r[2], csp_e),
        )
        self.ERBlock_4 = nn.Sequential(
            TorchRepVGGBlock(c[2], c[3], 2),
            _v6_stage(c[3], c[3], r[3], csp_e),
        )
        self.ERBlock_5 = nn.Sequential(
            TorchRepVGGBlock(c[3], c[4], 2),
            _v6_stage(c[4], c[4], r[4], csp_e),
            TorchSimSPPF(c[4], c[4]),
        )

    def forward(self, x):
        x = self.stem(x)
        x = self.ERBlock_2(x)
        p3 = self.ERBlock_3(x)
        p4 = self.ERBlock_4(p3)
        p5 = self.ERBlock_5(p4)
        return p3, p4, p5


class _RepPAN(nn.Module):
    def __init__(self, chans, reps, csp_e=0.0):
        super().__init__()
        c, r = chans, reps
        self.reduce_layer0 = CB(c[4], c[5], 1, act="relu")
        self.upsample0 = _Transpose(c[5])
        self.Rep_p4 = _v6_stage(c[5] + c[3], c[5], r[5], csp_e)
        self.reduce_layer1 = CB(c[5], c[6], 1, act="relu")
        self.upsample1 = _Transpose(c[6])
        self.Rep_p3 = _v6_stage(c[6] + c[2], c[6], r[6], csp_e)
        self.downsample2 = CB(c[6], c[7], 3, 2, act="relu")
        self.Rep_n3 = _v6_stage(c[7] + c[6], c[8], r[7], csp_e)
        self.downsample1 = CB(c[8], c[9], 3, 2, act="relu")
        self.Rep_n4 = _v6_stage(c[9] + c[5], c[10], r[8], csp_e)

    def forward(self, feats):
        p3, p4, p5 = feats
        f0 = self.reduce_layer0(p5)
        x = self.Rep_p4(torch.cat([self.upsample0(f0), p4], 1))
        f1 = self.reduce_layer1(x)
        out_p3 = self.Rep_p3(torch.cat([self.upsample1(f1), p3], 1))
        out_n3 = self.Rep_n3(torch.cat([self.downsample2(out_p3), f1], 1))
        out_n4 = self.Rep_n4(torch.cat([self.downsample1(out_n3), f0], 1))
        return out_p3, out_n3, out_n4


class _EffiDeHead(nn.Module):
    def __init__(self, head_chans, nc, use_dfl=False):
        super().__init__()
        self.nc = nc
        self.use_dfl = use_dfl
        self.reg_max = 16
        reg_out = 4 * (self.reg_max + 1) if use_dfl else 4
        self.stems = nn.ModuleList(
            CB(ch, ch, 1, act="silu") for ch in head_chans
        )
        self.cls_convs = nn.ModuleList(
            CB(ch, ch, 3, act="silu") for ch in head_chans
        )
        self.reg_convs = nn.ModuleList(
            CB(ch, ch, 3, act="silu") for ch in head_chans
        )
        self.cls_preds = nn.ModuleList(
            nn.Conv2d(ch, nc, 1) for ch in head_chans
        )
        self.reg_preds = nn.ModuleList(
            nn.Conv2d(ch, reg_out, 1) for ch in head_chans
        )

    def forward(self, feats):
        outs = []
        for li, f in enumerate(feats):
            s = self.stems[li](f)
            cls = torch.sigmoid(self.cls_preds[li](self.cls_convs[li](s)))
            reg = self.reg_preds[li](self.reg_convs[li](s))
            if self.use_dfl:
                # meituan effidehead deploy: reshape (b, 4, 17, hw),
                # softmax over bins, proj_conv arange expectation
                b_, _, hh, ww = reg.shape
                r = reg.reshape(b_, 4, self.reg_max + 1, hh * ww)
                r = torch.softmax(r, dim=2)
                proj = torch.arange(
                    self.reg_max + 1, dtype=torch.float32
                ).view(1, 1, -1, 1)
                reg = (r * proj).sum(2).reshape(b_, 4, hh, ww)
            b, _, h, w = cls.shape
            # NCHW -> (B, HW, C): match the export's cell-major layout
            cls = cls.permute(0, 2, 3, 1).reshape(b, h * w, self.nc)
            reg = reg.permute(0, 2, 3, 1).reshape(b, h * w, 4)
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32) + 0.5,
                torch.arange(w, dtype=torch.float32) + 0.5,
                indexing="ij",
            )
            anchors = torch.stack(
                [xs.reshape(-1), ys.reshape(-1)], -1
            )
            stride = 2 ** (3 + li)
            lt, rb = reg[..., :2], reg[..., 2:]
            x1y1 = anchors - lt
            x2y2 = anchors + rb
            cxy = (x1y1 + x2y2) / 2
            wh = x2y2 - x1y1
            xywh = torch.cat([cxy, wh], -1) * stride
            obj = torch.ones_like(cls[..., :1])
            outs.append(torch.cat([xywh, obj, cls], -1))
        return torch.cat(outs, 1)


class TorchYOLOv6(nn.Module):
    """Full meituan v6 n/s: checkpoint keys ``backbone.* / neck.* /
    detect.*`` exactly as yolov6_mapping consumes."""

    def __init__(self, chans, reps, nc=80, csp_e=0.0):
        super().__init__()
        self.backbone = _ERBackbone(chans, reps, csp_e)
        self.neck = _RepPAN(chans, reps, csp_e)
        head_chans = (chans[6], chans[8], chans[10])
        self.detect = _EffiDeHead(head_chans, nc, use_dfl=bool(csp_e))

    def forward(self, x):
        return self.detect(self.neck(self.backbone(x)))


# --------------------------------------------------------------------------
# YOLOv7 (WongKinYiu base 640 model, cfg/deploy/yolov7.yaml)
# --------------------------------------------------------------------------

V7_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)


class V7Conv(nn.Module):
    """ultralytics-style Conv (conv+bn+SiLU) — children conv/bn.
    Default padding (k-1)//2; the v5 6x6 stem uses explicit p=2 in
    ultralytics, which (k-1)//2 reproduces."""

    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class V7SPPCSPC(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        c_ = cout
        self.cv1 = V7Conv(cin, c_, 1)
        self.cv2 = V7Conv(cin, c_, 1)
        self.cv3 = V7Conv(c_, c_, 3)
        self.cv4 = V7Conv(c_, c_, 1)
        self.cv5 = V7Conv(4 * c_, c_, 1)
        self.cv6 = V7Conv(c_, c_, 3)
        self.cv7 = V7Conv(2 * c_, cout, 1)

    def forward(self, x):
        x1 = self.cv4(self.cv3(self.cv1(x)))
        pools = [F.max_pool2d(x1, k, 1, k // 2) for k in (5, 9, 13)]
        y1 = self.cv6(self.cv5(torch.cat([x1] + pools, 1)))
        y2 = self.cv2(x)
        return self.cv7(torch.cat([y1, y2], 1))


class V7RepConv(nn.Module):
    """v7 RepConv training form; branch Sequentials are UNNAMED
    (``rbr_dense.0`` = conv, ``.1`` = bn) like the release."""

    def __init__(self, cin, cout):
        super().__init__()
        self.rbr_dense = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
        )
        self.rbr_1x1 = nn.Sequential(
            nn.Conv2d(cin, cout, 1, 1, 0, bias=False),
            nn.BatchNorm2d(cout),
        )

    def forward(self, x):
        return F.silu(self.rbr_dense(x) + self.rbr_1x1(x))


class V7Implicit(nn.Module):
    def __init__(self, c, init):
        super().__init__()
        self.implicit = nn.Parameter(
            torch.full((1, c, 1, 1), float(init))
        )


class V7IDetect(nn.Module):
    def __init__(self, chans, nc):
        super().__init__()
        na = 3
        self.nc = nc
        self.m = nn.ModuleList(
            nn.Conv2d(c, na * (5 + nc), 1) for c in chans
        )
        self.ia = nn.ModuleList(V7Implicit(c, 0.0) for c in chans)
        self.im = nn.ModuleList(
            V7Implicit(na * (5 + nc), 1.0) for c in chans
        )

    def forward(self, feats):
        outs = []
        for li, f in enumerate(feats):
            p = self.m[li](f + self.ia[li].implicit) * self.im[li].implicit
            b, _, h, w = p.shape
            # (B, na*(5+nc), H, W) -> (B, H, W, na, 5+nc), cell-major
            p = (
                p.view(b, 3, 5 + self.nc, h, w)
                .permute(0, 3, 4, 1, 2)
                .sigmoid()
            )
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32),
                torch.arange(w, dtype=torch.float32),
                indexing="ij",
            )
            grid = torch.stack([xs, ys], -1)[None, :, :, None, :]
            anchors = torch.tensor(
                V7_ANCHORS[li], dtype=torch.float32
            )[None, None, None]
            stride = 2 ** (3 + li)
            xy = (p[..., :2] * 2 - 0.5 + grid) * stride
            wh = (p[..., 2:4] * 2) ** 2 * anchors
            out = torch.cat([xy, wh, p[..., 4:]], -1)
            outs.append(out.reshape(b, h * w * 3, 5 + self.nc))
        return torch.cat(outs, 1)


class TorchYOLOv7(nn.Module):
    """Base yolov7: ``model.{i}`` keys mirror cfg/deploy/yolov7.yaml."""

    def __init__(self, nc=80):
        super().__init__()
        m = {}

        def conv(i, cin, cout, k, s=1):
            m[str(i)] = V7Conv(cin, cout, k, s)

        conv(0, 3, 32, 3)
        conv(1, 32, 64, 3, 2)
        conv(2, 64, 64, 3)
        conv(3, 64, 128, 3, 2)

        def elan(i0, cin, cb, cout):
            conv(i0, cin, cb, 1)
            conv(i0 + 1, cin, cb, 1)
            for j in range(4):
                conv(i0 + 2 + j, cb, cb, 3)
            conv(i0 + 7, cb * 4, cout, 1)

        def mp_block(i0, cin, c):
            conv(i0 + 1, cin, c, 1)
            conv(i0 + 2, cin, c, 1)
            conv(i0 + 3, c, c, 3, 2)

        elan(4, 128, 64, 256)
        mp_block(12, 256, 128)
        elan(17, 256, 128, 512)
        mp_block(25, 512, 256)
        elan(30, 512, 256, 1024)
        mp_block(38, 1024, 512)
        elan(43, 1024, 256, 1024)
        m["51"] = V7SPPCSPC(1024, 512)
        conv(52, 512, 256, 1)
        conv(54, 1024, 256, 1)

        def elan_w(i0, cin, ca, cb, cout):
            conv(i0, cin, ca, 1)
            conv(i0 + 1, cin, ca, 1)
            conv(i0 + 2, ca, cb, 3)
            for j in range(3):
                conv(i0 + 3 + j, cb, cb, 3)
            conv(i0 + 7, ca * 2 + cb * 4, cout, 1)

        elan_w(56, 512, 256, 128, 256)
        conv(64, 256, 128, 1)
        conv(66, 512, 128, 1)
        elan_w(68, 256, 128, 64, 128)
        mp_block(76, 128, 128)
        elan_w(81, 512, 256, 128, 256)
        mp_block(89, 256, 256)
        elan_w(94, 1024, 512, 256, 512)
        m["102"] = V7RepConv(128, 256)
        m["103"] = V7RepConv(256, 512)
        m["104"] = V7RepConv(512, 1024)
        m["105"] = V7IDetect((256, 512, 1024), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        t = {}
        m = self.model

        def conv(i, src):
            t[i] = m[str(i)](src)
            return t[i]

        conv(0, x)
        conv(1, t[0])
        conv(2, t[1])
        conv(3, t[2])

        def elan(i0, src):
            a = conv(i0, src)
            b = conv(i0 + 1, src)
            b1 = conv(i0 + 2, b)
            b2 = conv(i0 + 3, b1)
            b3 = conv(i0 + 4, b2)
            b4 = conv(i0 + 5, b3)
            t[i0 + 6] = torch.cat([b4, b2, b, a], 1)
            return conv(i0 + 7, t[i0 + 6])

        def mp_block(i0, src):
            t[i0] = F.max_pool2d(src, 2, 2)
            a = conv(i0 + 1, t[i0])
            b = conv(i0 + 3, conv(i0 + 2, src))
            t[i0 + 4] = torch.cat([b, a], 1)
            return t[i0 + 4]

        elan(4, t[3])
        mp_block(12, t[11])
        elan(17, t[16])
        mp_block(25, t[24])
        elan(30, t[29])
        mp_block(38, t[37])
        elan(43, t[42])
        t[51] = m["51"](t[50])
        conv(52, t[51])
        t[53] = F.interpolate(t[52], scale_factor=2, mode="nearest")
        conv(54, t[37])
        t[55] = torch.cat([t[54], t[53]], 1)

        def elan_w(i0, src):
            a = conv(i0, src)
            b = conv(i0 + 1, src)
            c1 = conv(i0 + 2, b)
            c2 = conv(i0 + 3, c1)
            c3 = conv(i0 + 4, c2)
            c4 = conv(i0 + 5, c3)
            t[i0 + 6] = torch.cat([c4, c3, c2, c1, b, a], 1)
            return conv(i0 + 7, t[i0 + 6])

        elan_w(56, t[55])
        conv(64, t[63])
        t[65] = F.interpolate(t[64], scale_factor=2, mode="nearest")
        conv(66, t[24])
        t[67] = torch.cat([t[66], t[65]], 1)
        elan_w(68, t[67])

        def head_mp(i0, src, route):
            t[i0] = F.max_pool2d(src, 2, 2)
            a = conv(i0 + 1, t[i0])
            b = conv(i0 + 3, conv(i0 + 2, src))
            t[i0 + 4] = torch.cat([b, a, route], 1)
            return t[i0 + 4]

        head_mp(76, t[75], t[63])
        elan_w(81, t[80])
        head_mp(89, t[88], t[51])
        elan_w(94, t[93])
        r3 = m["102"](t[75])
        r4 = m["103"](t[88])
        r5 = m["104"](t[101])
        return m["105"]((r3, r4, r5))


# --------------------------------------------------------------------------
# EfficientDet (zylo117 Yet-Another-EfficientDet-Pytorch layout)
# --------------------------------------------------------------------------


class SamePadConv2d(nn.Module):
    """zylo117 Conv2dStaticSamePadding: TF-SAME pads then plain conv."""

    def __init__(self, cin, cout, k, s=1, groups=1, bias=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, 0, groups=groups, bias=bias)
        self.k, self.s = k, s

    def _pad(self, x):
        h, w = x.shape[-2:]
        pads = []
        for size in (w, h):  # F.pad order: (left, right, top, bottom)
            out = math.ceil(size / self.s)
            total = max((out - 1) * self.s + self.k - size, 0)
            pads += [total // 2, total - total // 2]
        return F.pad(x, pads)

    def forward(self, x):
        return self.conv(self._pad(x))


class _BareSame(nn.Module):
    """Unwrapped Conv2dStaticSamePadding (its own state-dict key is
    ``...weight`` directly — used by the lukemelas backbone)."""

    def __init__(self, cin, cout, k, s=1, groups=1, bias=False):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin // groups, k, k))
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.k, self.s, self.groups = k, s, groups

    def forward(self, x):
        h, w = x.shape[-2:]
        pads = []
        for size in (w, h):
            out = math.ceil(size / self.s)
            total = max((out - 1) * self.s + self.k - size, 0)
            pads += [total // 2, total - total // 2]
        return F.conv2d(
            F.pad(x, pads), self.weight, self.bias, self.s, 0, 1,
            self.groups,
        )


class TorchMBConv(nn.Module):
    """lukemelas MBConvBlock (inference: no drop-connect)."""

    def __init__(self, cin, cout, expand, k, s):
        super().__init__()
        mid = cin * expand
        if expand != 1:
            self._expand_conv = _BareSame(cin, mid, 1)
            self._bn0 = nn.BatchNorm2d(mid, eps=1e-3)
        self.expand = expand
        self._depthwise_conv = _BareSame(mid, mid, k, s, groups=mid)
        self._bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        se = max(1, int(cin * 0.25))
        self._se_reduce = _BareSame(mid, se, 1, bias=True)
        self._se_expand = _BareSame(se, mid, 1, bias=True)
        self._project_conv = _BareSame(mid, cout, 1)
        self._bn2 = nn.BatchNorm2d(cout, eps=1e-3)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        h = x
        if self.expand != 1:
            h = swish(self._bn0(self._expand_conv(h)))
        h = swish(self._bn1(self._depthwise_conv(h)))
        s = h.mean((2, 3), keepdim=True)
        s = self._se_expand(swish(self._se_reduce(s)))
        h = h * torch.sigmoid(s)
        h = self._bn2(self._project_conv(h))
        if self.has_skip:
            h = h + x
        return h


class _LukemelasNet(nn.Module):
    """``backbone_net.model``: stem + _blocks list (detection slice)."""

    def __init__(self, plan, stem_ch):
        super().__init__()
        self._conv_stem = _BareSame(3, stem_ch, 3, 2)
        self._bn0 = nn.BatchNorm2d(stem_ch, eps=1e-3)
        blocks = []
        cin = stem_ch
        for expand, k, s, cout in plan:
            blocks.append(TorchMBConv(cin, cout, expand, k, s))
            cin = cout
        self._blocks = nn.ModuleList(blocks)

    def forward(self, x):
        h = swish(self._bn0(self._conv_stem(x)))
        feats = []
        for b in self._blocks:
            # same tap rule as models/efficientdet.EfficientNetFeatures
            if (
                b._depthwise_conv.s == 2
                and h.shape[-2] * 2 <= x.shape[-2] // 4
            ):
                feats.append(h)
            h = b(h)
        feats.append(h)
        return feats[-3:]


class _ModelHolder(nn.Module):
    def __init__(self, model):
        super().__init__()
        self.model = model


class _SepConv(nn.Module):
    """zylo117 SeparableConvBlock: dw (no bias) + pw (bias) + BN."""

    def __init__(self, cin, cout, bn=True):
        super().__init__()
        self.depthwise_conv = SamePadConv2d(
            cin, cin, 3, groups=cin, bias=False
        )
        self.pointwise_conv = SamePadConv2d(cin, cout, 1, bias=True)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3) if bn else None

    def forward(self, x):
        h = self.pointwise_conv(self.depthwise_conv(x))
        if self.bn is not None:
            h = self.bn(h)
        return h


class _DownCh(nn.Sequential):
    """Sequential(conv-wrap, BN) with keys ``.0.conv.*`` / ``.1.*``."""

    def __init__(self, cin, cout):
        super().__init__(
            SamePadConv2d(cin, cout, 1, bias=True),
            nn.BatchNorm2d(cout, eps=1e-3),
        )


def _same_pool(x, k=3, s=2):
    """zylo117 MaxPool2dStaticSamePadding: ZeroPad2d + MaxPool2d — the
    padded ring competes as literal ZEROS (not -inf)."""
    h, w = x.shape[-2:]
    pads = []
    for size in (w, h):
        out = math.ceil(size / s)
        total = max((out - 1) * s + k - size, 0)
        pads += [total // 2, total - total // 2]
    return F.max_pool2d(F.pad(x, pads, value=0.0), k, s)


class TorchBiFPNLayer(nn.Module):
    def __init__(self, conv_ch, fpn_ch, first_time, attention=True):
        super().__init__()
        self.first_time = first_time
        self.attention = attention
        for name in (
            "conv6_up", "conv5_up", "conv4_up", "conv3_up",
            "conv4_down", "conv5_down", "conv6_down", "conv7_down",
        ):
            setattr(self, name, _SepConv(fpn_ch, fpn_ch))
        if attention:
            for name in (
                "p6_w1", "p5_w1", "p4_w1", "p3_w1",
                "p4_w2", "p5_w2", "p6_w2", "p7_w2",
            ):
                n = 3 if name.endswith("w2") and name != "p7_w2" else 2
                setattr(self, name, nn.Parameter(torch.ones(n)))
        if first_time:
            c3, c4, c5 = conv_ch
            self.p3_down_channel = _DownCh(c3, fpn_ch)
            self.p4_down_channel = _DownCh(c4, fpn_ch)
            self.p5_down_channel = _DownCh(c5, fpn_ch)
            self.p4_down_channel_2 = _DownCh(c4, fpn_ch)
            self.p5_down_channel_2 = _DownCh(c5, fpn_ch)
            self.p5_to_p6 = _DownCh(c5, fpn_ch)

    def _fuse(self, name, inputs):
        if not self.attention:
            return F.silu(sum(inputs))
        w = F.relu(getattr(self, name))
        w = w / (w.sum() + 1e-4)
        return F.silu(sum(wi * xi for wi, xi in zip(w, inputs)))

    @staticmethod
    def _up(x):
        return F.interpolate(x, scale_factor=2, mode="nearest")

    def forward(self, feats):
        if self.first_time:
            c3, c4, c5 = feats
            p3_in = self.p3_down_channel(c3)
            p4_in = self.p4_down_channel(c4)
            p5_in = self.p5_down_channel(c5)
            p6_in = _same_pool(self.p5_to_p6(c5))
            p7_in = _same_pool(p6_in)
            p4_in_2 = self.p4_down_channel_2(c4)
            p5_in_2 = self.p5_down_channel_2(c5)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = feats
            p4_in_2, p5_in_2 = p4_in, p5_in
        p6_td = self.conv6_up(self._fuse("p6_w1", [p6_in, self._up(p7_in)]))
        p5_td = self.conv5_up(self._fuse("p5_w1", [p5_in, self._up(p6_td)]))
        p4_td = self.conv4_up(self._fuse("p4_w1", [p4_in, self._up(p5_td)]))
        p3_out = self.conv3_up(self._fuse("p3_w1", [p3_in, self._up(p4_td)]))
        p4_out = self.conv4_down(
            self._fuse("p4_w2", [p4_in_2, p4_td, _same_pool(p3_out)])
        )
        p5_out = self.conv5_down(
            self._fuse("p5_w2", [p5_in_2, p5_td, _same_pool(p4_out)])
        )
        p6_out = self.conv6_down(
            self._fuse("p6_w2", [p6_in, p6_td, _same_pool(p5_out)])
        )
        p7_out = self.conv7_down(
            self._fuse("p7_w2", [p7_in, _same_pool(p6_out)])
        )
        return p3_out, p4_out, p5_out, p6_out, p7_out


class TorchPredictionHead(nn.Module):
    def __init__(self, ch, layers, out_features):
        super().__init__()
        self.conv_list = nn.ModuleList(
            _SepConv(ch, ch, bn=False) for _ in range(layers)
        )
        self.bn_list = nn.ModuleList(
            nn.ModuleList(
                nn.BatchNorm2d(ch, eps=1e-3) for _ in range(layers)
            )
            for _ in range(5)
        )
        self.header = _SepConv(ch, out_features, bn=False)

    def forward(self, feats):
        outs = []
        for li, f in enumerate(feats):
            h = f
            for ci, conv in enumerate(self.conv_list):
                h = F.silu(self.bn_list[li][ci](conv(h)))
            outs.append(self.header(h))
        return outs


class TorchEfficientDet(nn.Module):
    """zylo117 EfficientDetBackbone (d0 config by default): raw head
    maps out — box decode is asserted separately in the test."""

    def __init__(self, plan, stem_ch, conv_ch, fpn_ch, fpn_layers,
                 head_layers, num_classes=90):
        super().__init__()
        self.backbone_net = _ModelHolder(_LukemelasNet(plan, stem_ch))
        self.bifpn = nn.Sequential(
            *[
                TorchBiFPNLayer(conv_ch, fpn_ch, first_time=(i == 0))
                for i in range(fpn_layers)
            ]
        )
        self.regressor = TorchPredictionHead(fpn_ch, head_layers, 9 * 4)
        self.classifier = TorchPredictionHead(
            fpn_ch, head_layers, 9 * num_classes
        )
        self.num_classes = num_classes

    def forward(self, x):
        feats = self.backbone_net.model(x)
        feats = self.bifpn(feats)
        box = self.regressor(feats)
        cls = self.classifier(feats)
        b = x.shape[0]
        box = torch.cat(
            [o.permute(0, 2, 3, 1).reshape(b, -1, 4) for o in box], 1
        )
        cls = torch.cat(
            [
                o.permute(0, 2, 3, 1).reshape(b, -1, self.num_classes)
                for o in cls
            ],
            1,
        )
        return box, torch.sigmoid(cls)


# --------------------------------------------------------------------------
# YOLOv8 (ultralytics module-index layout, the flagship family)
# --------------------------------------------------------------------------


class V8Bottleneck(nn.Module):
    def __init__(self, cin, cout, shortcut, e=1.0, k=(3, 3)):
        super().__init__()
        c_ = int(cout * e)
        self.cv1 = V7Conv(cin, c_, k[0])
        self.cv2 = V7Conv(c_, cout, k[1])
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class V8C2f(nn.Module):
    def __init__(self, cin, cout, n, shortcut):
        super().__init__()
        self.c = cout // 2
        self.cv1 = V7Conv(cin, 2 * self.c, 1)
        self.cv2 = V7Conv((2 + n) * self.c, cout, 1)
        self.m = nn.ModuleList(
            V8Bottleneck(self.c, self.c, shortcut, e=1.0)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class V8SPPF(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        c_ = cin // 2
        self.cv1 = V7Conv(cin, c_, 1)
        self.cv2 = V7Conv(c_ * 4, cout, 1)

    def forward(self, x):
        y = self.cv1(x)
        p1 = F.max_pool2d(y, 5, 1, 2)
        p2 = F.max_pool2d(p1, 5, 1, 2)
        p3 = F.max_pool2d(p2, 5, 1, 2)
        return self.cv2(torch.cat([y, p1, p2, p3], 1))


class V8Detect(nn.Module):
    """ultralytics v8 Detect: cv2 box branch (DFL logits), cv3 cls,
    frozen dfl conv skipped (decoded analytically), export decode
    (B, 4+nc, N) with xywh in input pixels."""

    def __init__(self, chans, nc, reg_max=16):
        super().__init__()
        self.nc, self.reg_max = nc, reg_max
        c2 = max(16, chans[0] // 4, reg_max * 4)
        c3 = max(chans[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(
                V7Conv(c, c2, 3), V7Conv(c2, c2, 3),
                nn.Conv2d(c2, 4 * reg_max, 1),
            )
            for c in chans
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                V7Conv(c, c3, 3), V7Conv(c3, c3, 3),
                nn.Conv2d(c3, nc, 1),
            )
            for c in chans
        )

    def forward(self, feats):
        boxes, clss, anchors, strides = [], [], [], []
        for li, f in enumerate(feats):
            box = self.cv2[li](f)
            cls = self.cv3[li](f)
            b, _, h, w = box.shape
            # NCHW -> (B, HW, C), cell-major like the NHWC reshape
            boxes.append(
                box.permute(0, 2, 3, 1).reshape(b, h * w, 4 * self.reg_max)
            )
            clss.append(
                cls.permute(0, 2, 3, 1).reshape(b, h * w, self.nc)
            )
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32) + 0.5,
                torch.arange(w, dtype=torch.float32) + 0.5,
                indexing="ij",
            )
            anchors.append(
                torch.stack([xs.reshape(-1), ys.reshape(-1)], -1)
            )
            strides.append(
                torch.full((h * w,), float(2 ** (3 + li)))
            )
        box = torch.cat(boxes, 1)
        cls = torch.cat(clss, 1)
        anc = torch.cat(anchors, 0)
        strd = torch.cat(strides, 0)
        # DFL: softmax expectation over reg_max bins per side.
        # channel c = side*reg_max + bin (ultralytics view(4, reg_max))
        b, n, _ = box.shape
        r = box.reshape(b, n, 4, self.reg_max).softmax(-1)
        ltrb = (r * torch.arange(self.reg_max, dtype=torch.float32)).sum(-1)
        x1y1 = anc - ltrb[..., :2]
        x2y2 = anc + ltrb[..., 2:]
        cxy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        xywh = torch.cat([cxy, wh], -1) * strd[None, :, None]
        out = torch.cat([xywh, cls.sigmoid()], -1)
        return out.permute(0, 2, 1)  # (B, 4+nc, N) export contract


class TorchYOLOv8(nn.Module):
    """ultralytics yolov8 with ``model.{i}`` module indices (yolov8.yaml:
    detect at 22)."""

    def __init__(self, chans, depths, nc=80):
        super().__init__()
        ch, d = chans, depths
        m = {}
        m["0"] = V7Conv(3, ch[0], 3, 2)
        m["1"] = V7Conv(ch[0], ch[1], 3, 2)
        m["2"] = V8C2f(ch[1], ch[1], d[0], True)
        m["3"] = V7Conv(ch[1], ch[2], 3, 2)
        m["4"] = V8C2f(ch[2], ch[2], d[1], True)
        m["5"] = V7Conv(ch[2], ch[3], 3, 2)
        m["6"] = V8C2f(ch[3], ch[3], d[2], True)
        m["7"] = V7Conv(ch[3], ch[4], 3, 2)
        m["8"] = V8C2f(ch[4], ch[4], d[3], True)
        m["9"] = V8SPPF(ch[4], ch[4])
        m["12"] = V8C2f(ch[4] + ch[3], ch[3], d[0], False)
        m["15"] = V8C2f(ch[3] + ch[2], ch[2], d[0], False)
        m["16"] = V7Conv(ch[2], ch[2], 3, 2)
        m["18"] = V8C2f(ch[2] + ch[3], ch[3], d[0], False)
        m["19"] = V7Conv(ch[3], ch[3], 3, 2)
        m["21"] = V8C2f(ch[3] + ch[4], ch[4], d[0], False)
        m["22"] = V8Detect((ch[2], ch[3], ch[4]), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        m = self.model
        x = m["1"](m["0"](x))
        x = m["2"](x)
        p3 = m["4"](m["3"](x))
        p4 = m["6"](m["5"](p3))
        p5 = m["9"](m["8"](m["7"](p4)))
        up = F.interpolate(p5, scale_factor=2, mode="nearest")
        t1 = m["12"](torch.cat([up, p4], 1))
        up = F.interpolate(t1, scale_factor=2, mode="nearest")
        n3 = m["15"](torch.cat([up, p3], 1))
        n4 = m["18"](torch.cat([m["16"](n3), t1], 1))
        n5 = m["21"](torch.cat([m["19"](n4), p5], 1))
        return m["22"]((n3, n4, n5))


# --------------------------------------------------------------------------
# YOLOv5 (ultralytics v6.x layout: C3 blocks, SPPF at 9, Detect at 24)
# --------------------------------------------------------------------------

V5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


class V5C3(nn.Module):
    def __init__(self, cin, cout, n, shortcut):
        super().__init__()
        c_ = cout // 2
        self.cv1 = V7Conv(cin, c_, 1)
        self.cv2 = V7Conv(cin, c_, 1)
        self.cv3 = V7Conv(2 * c_, cout, 1)
        self.m = nn.ModuleList(
            V8Bottleneck(c_, c_, shortcut, e=1.0, k=(1, 3))
            for _ in range(n)
        )

    def forward(self, x):
        a = self.cv1(x)
        for mm in self.m:
            a = mm(a)
        return self.cv3(torch.cat([a, self.cv2(x)], 1))


class V5Detect(nn.Module):
    """v5 anchor head, export decode (B, N, 5+nc) post-sigmoid."""

    def __init__(self, chans, nc):
        super().__init__()
        self.nc = nc
        self.m = nn.ModuleList(
            nn.Conv2d(c, 3 * (5 + nc), 1) for c in chans
        )

    def forward(self, feats):
        outs = []
        for li, f in enumerate(feats):
            p = self.m[li](f)
            b, _, h, w = p.shape
            p = (
                p.view(b, 3, 5 + self.nc, h, w)
                .permute(0, 3, 4, 1, 2)
                .sigmoid()
            )
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32),
                torch.arange(w, dtype=torch.float32),
                indexing="ij",
            )
            grid = torch.stack([xs, ys], -1)[None, :, :, None, :]
            anchors = torch.tensor(
                V5_ANCHORS[li], dtype=torch.float32
            )[None, None, None]
            stride = 2 ** (3 + li)
            xy = (p[..., :2] * 2 - 0.5 + grid) * stride
            wh = (p[..., 2:4] * 2) ** 2 * anchors
            out = torch.cat([xy, wh, p[..., 4:]], -1)
            outs.append(out.reshape(b, h * w * 3, 5 + self.nc))
        return torch.cat(outs, 1)


class TorchYOLOv5(nn.Module):
    """ultralytics yolov5 v6.x: model.{i} indices, Detect at 24."""

    def __init__(self, chans, depths, nc=80):
        super().__init__()
        ch, d = chans, depths
        m = {}
        m["0"] = V7Conv(3, ch[0], 6, 2)
        m["1"] = V7Conv(ch[0], ch[1], 3, 2)
        m["2"] = V5C3(ch[1], ch[1], d[0], True)
        m["3"] = V7Conv(ch[1], ch[2], 3, 2)
        m["4"] = V5C3(ch[2], ch[2], d[1], True)
        m["5"] = V7Conv(ch[2], ch[3], 3, 2)
        m["6"] = V5C3(ch[3], ch[3], d[2], True)
        m["7"] = V7Conv(ch[3], ch[4], 3, 2)
        m["8"] = V5C3(ch[4], ch[4], d[3], True)
        m["9"] = V8SPPF(ch[4], ch[4])
        m["10"] = V7Conv(ch[4], ch[3], 1)
        m["13"] = V5C3(2 * ch[3], ch[3], d[0], False)
        m["14"] = V7Conv(ch[3], ch[2], 1)
        m["17"] = V5C3(2 * ch[2], ch[2], d[0], False)
        m["18"] = V7Conv(ch[2], ch[2], 3, 2)
        m["20"] = V5C3(2 * ch[2], ch[3], d[0], False)
        m["21"] = V7Conv(ch[3], ch[3], 3, 2)
        m["23"] = V5C3(2 * ch[3], ch[4], d[0], False)
        m["24"] = V5Detect((ch[2], ch[3], ch[4]), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        m = self.model
        x = m["2"](m["1"](m["0"](x)))
        p3 = m["4"](m["3"](x))
        p4 = m["6"](m["5"](p3))
        p5 = m["9"](m["8"](m["7"](p4)))
        p5r = m["10"](p5)
        up = F.interpolate(p5r, scale_factor=2, mode="nearest")
        t1 = m["13"](torch.cat([up, p4], 1))
        t1r = m["14"](t1)
        up = F.interpolate(t1r, scale_factor=2, mode="nearest")
        n3 = m["17"](torch.cat([up, p3], 1))
        n4 = m["20"](torch.cat([m["18"](n3), t1r], 1))
        n5 = m["23"](torch.cat([m["21"](n4), p5r], 1))
        return m["24"]((n3, n4, n5))


# --------------------------------------------------------------------------
# YOLOv10 (THU-MIG layout: SCDown/PSA/C2fCIB, dual heads at model.23)
# --------------------------------------------------------------------------


class V10ConvNoAct(nn.Module):
    def __init__(self, cin, cout, k=1, s=1, g=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=g,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class V10SCDown(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.cv1 = V7Conv(cin, cout, 1)
        self.cv2 = V10ConvNoAct(cout, cout, 3, 2, g=cout)

    def forward(self, x):
        return self.cv2(self.cv1(x))


class V10RepVGGDW(nn.Module):
    """dw 7x7 + dw 3x3 branches (Conv act=False each), summed, SiLU."""

    def __init__(self, c):
        super().__init__()
        self.conv = V10ConvNoAct(c, c, 7, 1, g=c)
        self.conv1 = V10ConvNoAct(c, c, 3, 1, g=c)

    def forward(self, x):
        return F.silu(self.conv(x) + self.conv1(x))


class V10CIB(nn.Module):
    """5-conv inverted block nested under ``cv1`` Sequential."""

    def __init__(self, cin, cout, shortcut=True, lk=False):
        super().__init__()
        mid = V10RepVGGDW(2 * cout) if lk else _DWWrap(2 * cout)
        self.cv1 = nn.Sequential(
            _DWWrap(cin),
            V7Conv(cin, 2 * cout, 1),
            mid,
            V7Conv(2 * cout, cout, 1),
            _DWWrap(cout),
        )
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.cv1(x)
        return x + y if self.add else y


class _DWWrap(nn.Module):
    """Depthwise 3x3 Conv (silu) with conv/bn children."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1, groups=c, bias=False)
        self.bn = nn.BatchNorm2d(c)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class V10C2fCIB(nn.Module):
    def __init__(self, cin, cout, n, shortcut, lk):
        super().__init__()
        self.c = cout // 2
        self.cv1 = V7Conv(cin, 2 * self.c, 1)
        self.cv2 = V7Conv((2 + n) * self.c, cout, 1)
        self.m = nn.ModuleList(
            V10CIB(self.c, self.c, shortcut, lk) for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class V10Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = self.head_dim // 2
        nh_kd = self.key_dim * num_heads
        self.qkv = V10ConvNoAct(dim, dim + 2 * nh_kd, 1)
        self.proj = V10ConvNoAct(dim, dim, 1)
        self.pe = V10ConvNoAct(dim, dim, 3, 1, g=dim)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, 2 * self.key_dim + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) / (self.key_dim ** 0.5)
        attn = attn.softmax(dim=-1)
        out = (v @ attn.transpose(-2, -1)).view(B, C, H, W)
        out = out + self.pe(v.reshape(B, C, H, W))
        return self.proj(out)


class V10PSA(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c // 2
        self.cv1 = V7Conv(c, c, 1)
        self.cv2 = V7Conv(c, c, 1)
        self.attn = V10Attention(self.c, max(1, self.c // 64))
        self.ffn = nn.Sequential(
            V7Conv(self.c, self.c * 2, 1),
            V10ConvNoAct(self.c * 2, self.c, 1),
        )

    def forward(self, x):
        y = self.cv1(x)
        a, b = y.split([self.c, self.c], dim=1)
        b = b + self.attn(b)
        b = b + self.ffn(b)
        return self.cv2(torch.cat([a, b], 1))


class V10Detect(nn.Module):
    """Dual v10 heads (depthwise cls branches); returns the o2m export
    raw (B, 4+nc, N) and the o2o per-anchor (xywh, cls) pre-topk."""

    def __init__(self, chans, nc, reg_max=16):
        super().__init__()
        self.nc, self.reg_max = nc, reg_max
        c2 = max(16, chans[0] // 4, reg_max * 4)
        c3 = max(chans[0], min(nc, 100))

        def box_branch(c):
            return nn.Sequential(
                V7Conv(c, c2, 3), V7Conv(c2, c2, 3),
                nn.Conv2d(c2, 4 * reg_max, 1),
            )

        def cls_branch(c):
            return nn.Sequential(
                nn.Sequential(_DWWrap(c), V7Conv(c, c3, 1)),
                nn.Sequential(_DWWrap(c3), V7Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )

        self.cv2 = nn.ModuleList(box_branch(c) for c in chans)
        self.cv3 = nn.ModuleList(cls_branch(c) for c in chans)
        self.one2one_cv2 = nn.ModuleList(box_branch(c) for c in chans)
        self.one2one_cv3 = nn.ModuleList(cls_branch(c) for c in chans)

    def _decode(self, feats, cv2, cv3):
        boxes, clss, anchors, strides = [], [], [], []
        for li, f in enumerate(feats):
            box = cv2[li](f)
            cls = cv3[li](f)
            b, _, h, w = box.shape
            boxes.append(
                box.permute(0, 2, 3, 1).reshape(b, h * w, 4 * self.reg_max)
            )
            clss.append(cls.permute(0, 2, 3, 1).reshape(b, h * w, self.nc))
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32) + 0.5,
                torch.arange(w, dtype=torch.float32) + 0.5,
                indexing="ij",
            )
            anchors.append(torch.stack([xs.reshape(-1), ys.reshape(-1)], -1))
            strides.append(torch.full((h * w,), float(2 ** (3 + li))))
        box = torch.cat(boxes, 1)
        cls = torch.cat(clss, 1)
        anc = torch.cat(anchors, 0)
        strd = torch.cat(strides, 0)
        b, n, _ = box.shape
        r = box.reshape(b, n, 4, self.reg_max).softmax(-1)
        ltrb = (r * torch.arange(self.reg_max, dtype=torch.float32)).sum(-1)
        x1y1 = anc - ltrb[..., :2]
        x2y2 = anc + ltrb[..., 2:]
        xywh = torch.cat([(x1y1 + x2y2) / 2, x2y2 - x1y1], -1)
        return xywh * strd[None, :, None], cls.sigmoid()

    def forward(self, feats):
        xywh_m, cls_m = self._decode(feats, self.cv2, self.cv3)
        raw = torch.cat([xywh_m, cls_m], -1).permute(0, 2, 1)
        xywh_o, cls_o = self._decode(
            feats, self.one2one_cv2, self.one2one_cv3
        )
        return raw, (xywh_o, cls_o)


class TorchYOLOv10n(nn.Module):
    """yolov10n: C2f trunk stages, SCDown at 5/7/20, PSA at 10,
    C2fCIB(lk=True) at 22, dual-head Detect at 23."""

    def __init__(self, chans, depths, nc=80):
        super().__init__()
        ch, d = chans, depths
        m = {}
        m["0"] = V7Conv(3, ch[0], 3, 2)
        m["1"] = V7Conv(ch[0], ch[1], 3, 2)
        m["2"] = V8C2f(ch[1], ch[1], d[0], True)
        m["3"] = V7Conv(ch[1], ch[2], 3, 2)
        m["4"] = V8C2f(ch[2], ch[2], d[1], True)
        m["5"] = V10SCDown(ch[2], ch[3])
        m["6"] = V8C2f(ch[3], ch[3], d[2], True)
        m["7"] = V10SCDown(ch[3], ch[4])
        m["8"] = V8C2f(ch[4], ch[4], d[3], True)
        m["9"] = V8SPPF(ch[4], ch[4])
        m["10"] = V10PSA(ch[4])
        m["13"] = V8C2f(ch[4] + ch[3], ch[3], d[0], False)
        m["16"] = V8C2f(ch[3] + ch[2], ch[2], d[0], False)
        m["17"] = V7Conv(ch[2], ch[2], 3, 2)
        m["19"] = V8C2f(ch[2] + ch[3], ch[3], d[0], False)
        m["20"] = V10SCDown(ch[3], ch[3])
        m["22"] = V10C2fCIB(ch[3] + ch[4], ch[4], d[0], True, lk=True)
        m["23"] = V10Detect((ch[2], ch[3], ch[4]), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        m = self.model
        x = m["2"](m["1"](m["0"](x)))
        p3 = m["4"](m["3"](x))
        p4 = m["6"](m["5"](p3))
        p5 = m["10"](m["9"](m["8"](m["7"](p4))))
        up = F.interpolate(p5, scale_factor=2, mode="nearest")
        t1 = m["13"](torch.cat([up, p4], 1))
        up = F.interpolate(t1, scale_factor=2, mode="nearest")
        n3 = m["16"](torch.cat([up, p3], 1))
        n4 = m["19"](torch.cat([m["17"](n3), t1], 1))
        n5 = m["22"](torch.cat([m["20"](n4), p5], 1))
        return m["23"]((n3, n4, n5))


# --------------------------------------------------------------------------
# YOLOv9 (GELAN-C, ultralytics yolov9c layout: detect at 22)
# --------------------------------------------------------------------------


class V9RepConvN(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = V10ConvNoAct(cin, cout, 3)
        self.conv2 = V10ConvNoAct(cin, cout, 1)

    def forward(self, x):
        return F.silu(self.conv1(x) + self.conv2(x))


class V9RepNBottleneck(nn.Module):
    def __init__(self, cin, cout, shortcut, e=1.0):
        super().__init__()
        c_ = int(cout * e)
        self.cv1 = V9RepConvN(cin, c_)
        self.cv2 = V7Conv(c_, cout, 3)
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class V9RepNCSP(nn.Module):
    def __init__(self, cin, cout, n, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(cout * e)
        self.cv1 = V7Conv(cin, c_, 1)
        self.cv2 = V7Conv(cin, c_, 1)
        self.cv3 = V7Conv(2 * c_, cout, 1)
        self.m = nn.ModuleList(
            V9RepNBottleneck(c_, c_, shortcut, e=1.0) for _ in range(n)
        )

    def forward(self, x):
        a = self.cv1(x)
        for mm in self.m:
            a = mm(a)
        return self.cv3(torch.cat([a, self.cv2(x)], 1))


class V9RepNCSPELAN4(nn.Module):
    def __init__(self, cin, c2, c3, c4, n=1):
        super().__init__()
        self.half = c3 // 2
        self.cv1 = V7Conv(cin, c3, 1)
        self.cv2 = nn.Sequential(
            V9RepNCSP(self.half, c4, n), V7Conv(c4, c4, 3)
        )
        self.cv3 = nn.Sequential(
            V9RepNCSP(c4, c4, n), V7Conv(c4, c4, 3)
        )
        self.cv4 = V7Conv(c3 + 2 * c4, c2, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.append(self.cv2(y[-1]))
        y.append(self.cv3(y[-1]))
        return self.cv4(torch.cat(y, 1))


class V9ADown(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        half = cout // 2
        self.cv1 = V7Conv(cin // 2, half, 3, 2)
        self.cv2 = V7Conv(cin // 2, half, 1)

    def forward(self, x):
        x = F.avg_pool2d(x, 2, 1, 0)
        x1, x2 = x.chunk(2, 1)
        x1 = self.cv1(x1)
        x2 = F.max_pool2d(x2, 3, 2, 1)
        return torch.cat([x1, self.cv2(x2)], 1)


class V9SPPELAN(nn.Module):
    def __init__(self, cin, c2, c3):
        super().__init__()
        self.cv1 = V7Conv(cin, c3, 1)
        self.cv5 = V7Conv(4 * c3, c2, 1)

    def forward(self, x):
        y = self.cv1(x)
        p1 = F.max_pool2d(y, 5, 1, 2)
        p2 = F.max_pool2d(p1, 5, 1, 2)
        p3 = F.max_pool2d(p2, 5, 1, 2)
        return self.cv5(torch.cat([y, p1, p2, p3], 1))


class TorchYOLOv9c(nn.Module):
    """gelan-c / yolov9c: model.{i} indices, v8-contract Detect at 22."""

    def __init__(self, nc=80):
        super().__init__()
        m = {}
        m["0"] = V7Conv(3, 64, 3, 2)
        m["1"] = V7Conv(64, 128, 3, 2)
        m["2"] = V9RepNCSPELAN4(128, 256, 128, 64, 1)
        m["3"] = V9ADown(256, 256)
        m["4"] = V9RepNCSPELAN4(256, 512, 256, 128, 1)
        m["5"] = V9ADown(512, 512)
        m["6"] = V9RepNCSPELAN4(512, 512, 512, 256, 1)
        m["7"] = V9ADown(512, 512)
        m["8"] = V9RepNCSPELAN4(512, 512, 512, 256, 1)
        m["9"] = V9SPPELAN(512, 512, 256)
        m["12"] = V9RepNCSPELAN4(1024, 512, 512, 256, 1)
        m["15"] = V9RepNCSPELAN4(1024, 256, 256, 128, 1)
        m["16"] = V9ADown(256, 256)
        m["18"] = V9RepNCSPELAN4(768, 512, 512, 256, 1)
        m["19"] = V9ADown(512, 512)
        m["21"] = V9RepNCSPELAN4(1024, 512, 512, 256, 1)
        m["22"] = V8Detect((256, 512, 512), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        m = self.model
        x = m["1"](m["0"](x))
        x = m["2"](x)
        p3 = m["4"](m["3"](x))
        p4 = m["6"](m["5"](p3))
        p5 = m["9"](m["8"](m["7"](p4)))
        up = F.interpolate(p5, scale_factor=2, mode="nearest")
        t1 = m["12"](torch.cat([up, p4], 1))
        up = F.interpolate(t1, scale_factor=2, mode="nearest")
        n3 = m["15"](torch.cat([up, p3], 1))
        n4 = m["18"](torch.cat([m["16"](n3), t1], 1))
        n5 = m["21"](torch.cat([m["19"](n4), p5], 1))
        return m["22"]((n3, n4, n5))


# --------------------------------------------------------------------------
# YOLOv5-Lite (ppogg ShuffleNetV2 e/s layout: Detect at 21)
# --------------------------------------------------------------------------


def _channel_shuffle2(x):
    b, c, h, w = x.shape
    return (
        x.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
    )


class LiteStem(nn.Module):
    """ppogg StemBlock: named children stem_1/2a/2b/3."""

    def __init__(self, cout):
        super().__init__()
        self.stem_1 = V7Conv(3, cout, 3, 2)
        self.stem_2a = V7Conv(cout, cout // 2, 1)
        self.stem_2b = V7Conv(cout // 2, cout, 3, 2)
        self.stem_3 = V7Conv(2 * cout, cout, 1)

    def forward(self, x):
        s1 = self.stem_1(x)
        y = self.stem_2b(self.stem_2a(s1))
        p = F.max_pool2d(s1, 2, 2, ceil_mode=True)
        return self.stem_3(torch.cat([y, p], 1))


class LiteShuffle(nn.Module):
    """ppogg Shuffle_Block: branch Sequentials with ReLU pointwise and
    act-free depthwise convs."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        bf = cout // 2
        self.stride = stride
        if stride == 2:
            self.branch1 = nn.Sequential(
                nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False),
                nn.BatchNorm2d(cin),
                nn.Conv2d(cin, bf, 1, bias=False),
                nn.BatchNorm2d(bf),
                nn.ReLU(inplace=True),
            )
            b2_in = cin
        else:
            b2_in = cin // 2
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2_in, bf, 1, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
            nn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
            nn.BatchNorm2d(bf),
            nn.Conv2d(bf, bf, 1, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.stride == 2:
            out = torch.cat([self.branch1(x), self.branch2(x)], 1)
        else:
            x1, x2 = x.chunk(2, 1)
            out = torch.cat([x1, self.branch2(x2)], 1)
        return _channel_shuffle2(out)


class LiteDetect(nn.Module):
    """v5-Lite export contract: sigmoided PRE-grid rows, anchor-major."""

    def __init__(self, chans, nc):
        super().__init__()
        self.nc = nc
        self.m = nn.ModuleList(
            nn.Conv2d(c, 3 * (5 + nc), 1) for c in chans
        )

    def forward(self, feats):
        outs = []
        for li, f in enumerate(feats):
            p = self.m[li](f)
            b, _, h, w = p.shape
            p = p.view(b, 3, 5 + self.nc, h, w).sigmoid()
            # anchor-major: (B, na, H, W, C) -> (B, na*H*W, C)
            p = p.permute(0, 1, 3, 4, 2).reshape(
                b, 3 * h * w, 5 + self.nc
            )
            outs.append(p)
        return torch.cat(outs, 1)


class TorchYOLOv5Lite(nn.Module):
    """ppogg v5lite-{e,s}: StemBlock at 0, shuffle stages, single-width
    PAN (C3 at 10/14/17/20), Detect at 21."""

    def __init__(self, stem_ch, stages, repeats, w, nc=80):
        super().__init__()
        m = {}
        m["0"] = LiteStem(stem_ch)
        cin = stem_ch
        idx = 1
        for si, (ch, reps) in enumerate(zip(stages, repeats)):
            m[str(idx)] = LiteShuffle(cin, ch, 2)
            idx += 1
            m[str(idx)] = nn.ModuleList(
                LiteShuffle(ch, ch, 1) for _ in range(reps)
            )
            idx += 1
            cin = ch
        m["7"] = V7Conv(stages[2], w, 1)
        m["10"] = V5C3(w + stages[1], w, 1, False)
        m["11"] = V7Conv(w, w, 1)
        m["14"] = V5C3(w + stages[0], w, 1, False)
        m["15"] = V7Conv(w, w, 3, 2)
        m["17"] = V5C3(2 * w, w, 1, False)
        m["18"] = V7Conv(w, w, 3, 2)
        m["20"] = V5C3(2 * w, w, 1, False)
        m["21"] = LiteDetect((w, w, w), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        m = self.model
        x = m["0"](x)
        feats = []
        for idx in (1, 3, 5):
            x = m[str(idx)](x)
            for blk in m[str(idx + 1)]:
                x = blk(x)
            feats.append(x)
        p3, p4, p5 = feats
        l5 = m["7"](p5)
        up = F.interpolate(l5, scale_factor=2, mode="nearest")
        t4 = m["10"](torch.cat([up, p4], 1))
        l4 = m["11"](t4)
        up = F.interpolate(l4, scale_factor=2, mode="nearest")
        n3 = m["14"](torch.cat([up, p3], 1))
        n4 = m["17"](torch.cat([m["15"](n3), l4], 1))
        n5 = m["20"](torch.cat([m["18"](n4), l5], 1))
        return m["21"]((n3, n4, n5))


# --------------------------------------------------------------------------
# YOLOv5-Lite-g (ppogg RepVGG trunk, train form — Detect at 23)
# --------------------------------------------------------------------------


class TorchRepVGGBlock(nn.Module):
    """DingXiaoH RepVGG training-form block as ppogg's common.py carries
    it: rbr_dense (3x3 conv+BN), rbr_1x1 (1x1 conv+BN, pad 0),
    rbr_identity (plain BN when in==out and stride 1), summed, ReLU."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()

        def conv_bn(k, p):
            seq = nn.Sequential()
            seq.add_module(
                "conv", nn.Conv2d(cin, cout, k, stride, p, bias=False)
            )
            seq.add_module("bn", nn.BatchNorm2d(cout))
            return seq

        self.rbr_dense = conv_bn(3, 1)
        self.rbr_1x1 = conv_bn(1, 0)
        self.rbr_identity = (
            nn.BatchNorm2d(cin) if cin == cout and stride == 1 else None
        )

    def forward(self, x):
        out = self.rbr_dense(x) + self.rbr_1x1(x)
        if self.rbr_identity is not None:
            out = out + self.rbr_identity(x)
        return F.relu(out)


class TorchSPPv5(nn.Module):
    """ultralytics SPP (parallel k=5/9/13 pools of the cv1 output)."""

    def __init__(self, c, k=(5, 9, 13)):
        super().__init__()
        self.cv1 = V7Conv(c, c // 2, 1)
        self.cv2 = V7Conv(c // 2 * (len(k) + 1), c, 1)
        self.m = nn.ModuleList(
            nn.MaxPool2d(ki, 1, ki // 2) for ki in k
        )

    def forward(self, x):
        x = self.cv1(x)
        return self.cv2(torch.cat([x] + [m(x) for m in self.m], 1))


class TorchYOLOv5LiteG(nn.Module):
    """ppogg v5lite-g layout (see models/yolov5lite.V5LITE_G_PLAN):
    RepVGG down blocks at 0/1/3/5/7, repeats at 2/4/6 (bare module when
    the repeat count is 1, Sequential otherwise, matching ultralytics
    parse_model), SPP at 8, single-width PAN, Detect at 23."""

    def __init__(self, widths=(48, 48, 96, 192, 384),
                 blocks=(1, 2, 4, 14, 1), w=128, nc=80):
        super().__init__()
        m = {}
        cin = 3
        idx = 0
        for wi, n in zip(widths, blocks):
            m[str(idx)] = TorchRepVGGBlock(cin, wi, 2)
            idx += 1
            if n > 1:
                reps = [TorchRepVGGBlock(wi, wi, 1) for _ in range(n - 1)]
                m[str(idx)] = reps[0] if n == 2 else nn.Sequential(*reps)
                idx += 1
            cin = wi
        m["8"] = TorchSPPv5(widths[4])
        m["9"] = V7Conv(widths[4], w, 1)
        m["12"] = V5C3(w + widths[3], w, 1, False)
        m["13"] = V7Conv(w, w, 1)
        m["16"] = V5C3(w + widths[2], w, 1, False)
        m["17"] = V7Conv(w, w, 3, 2)
        m["19"] = V5C3(2 * w, w, 1, False)
        m["20"] = V7Conv(w, w, 3, 2)
        m["22"] = V5C3(2 * w, w, 1, False)
        m["23"] = LiteDetect((w, w, w), nc)
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        m = self.model
        x = m["1"](m["0"](x))
        x = m["3"](m["2"](x))
        p3 = m["4"](x)
        x = m["5"](p3)
        p4 = m["6"](x)
        p5 = m["8"](m["7"](p4))
        l5 = m["9"](p5)
        up = F.interpolate(l5, scale_factor=2, mode="nearest")
        t4 = m["12"](torch.cat([up, p4], 1))
        l4 = m["13"](t4)
        up = F.interpolate(l4, scale_factor=2, mode="nearest")
        n3 = m["16"](torch.cat([up, p3], 1))
        n4 = m["19"](torch.cat([m["17"](n3), l4], 1))
        n5 = m["22"](torch.cat([m["20"](n4), l5], 1))
        return m["23"]((n3, n4, n5))
