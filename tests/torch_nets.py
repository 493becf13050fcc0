"""Torch oracle networks for parity tests.

Minimal torch implementations of the torchvision-style ResNet trunk and the
UFLD heads, used only as golden references: we run them on random weights,
ingest their state dicts with adas_tpu.tools.torch_import, and assert the
JAX forward matches.  (torchvision is not installed in this image.)
"""
import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    """torchvision-compatible resnet18 trunk returning x2, x3, x4."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, s) in enumerate(cfg, start=1):
            layer = nn.Sequential(
                TorchBasicBlock(cin, cout, s), TorchBasicBlock(cout, cout, 1)
            )
            setattr(self, f"layer{i}", layer)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x2 = self.layer2(x)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        return x2, x3, x4


class TorchUFLDv2(nn.Module):
    def __init__(self, input_h, input_w, dims, fc_norm=True):
        super().__init__()
        self.model = TorchResNet18()
        self.pool = nn.Conv2d(512, 8, 1)
        input_dim = input_h // 32 * (input_w // 32) * 8
        self.total_dim = sum(dims)
        self.cls = nn.Sequential(
            nn.LayerNorm(input_dim) if fc_norm else nn.Identity(),
            nn.Linear(input_dim, 64),
            nn.ReLU(),
            nn.Linear(64, self.total_dim),
        )

    def forward(self, x):
        _, _, fea = self.model(x)
        fea = self.pool(fea).flatten(1)
        return self.cls(fea)


class TorchUFLDv1(nn.Module):
    def __init__(self, input_h, input_w, total_dim):
        super().__init__()
        self.model = TorchResNet18()
        self.pool = nn.Conv2d(512, 8, 1)
        input_dim = input_h // 32 * (input_w // 32) * 8
        self.cls = nn.Sequential(
            nn.Linear(input_dim, 64), nn.ReLU(), nn.Linear(64, total_dim)
        )

    def forward(self, x):
        _, _, fea = self.model(x)
        fea = self.pool(fea).flatten(1)
        return self.cls(fea)


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real test."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


class TorchUFLDv2CurveLanes(nn.Module):
    """CurveLanes 20-lane-token head oracle (structure of the reference's
    model_curvelanes.py, small dims for test speed)."""

    def __init__(self, input_h, input_w, grid_row, cls_row, grid_col,
                 cls_col, mid=64):
        super().__init__()
        self.model = TorchResNet18()
        self.n_row, self.n_col = cls_row, cls_col
        self.g_row, self.g_col = grid_row, grid_col
        self.dim1 = grid_row * cls_row
        self.dim3 = grid_col * cls_col
        self.mid = mid
        self.input_dim = (input_h // 32) * (input_w // 32) * 9
        self.cls_distribute = nn.Sequential(
            nn.Conv2d(512, 128, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(128, 20, 3, padding=1),
        )
        self.cls = nn.Sequential(
            nn.LayerNorm(self.input_dim),
            nn.Linear(self.input_dim, mid),
            nn.ReLU(),
        )
        self.cls_row = nn.Linear(mid, self.dim1 + 2 * cls_row)
        self.cls_col = nn.Linear(mid, self.dim3 + 2 * cls_col)
        self.pool = nn.Conv2d(512, 8, 1)

    def forward(self, x):
        _, _, fea = self.model(x)
        h, w = fea.shape[-2:]
        lane_token = self.cls_distribute(fea).reshape(-1, 20, 1, h, w)
        rep = self.pool(fea).unsqueeze(1).repeat(1, 20, 1, 1, 1)
        fea9 = torch.cat([rep, lane_token], 2)
        out = self.cls(fea9.view(-1, self.input_dim)).reshape(
            -1, 20, self.mid
        )
        out_row = self.cls_row(out[:, :10, :]).permute(0, 2, 1)
        out_col = self.cls_col(out[:, 10:, :]).permute(0, 2, 1)
        return {
            "loc_row": out_row[:, : self.dim1, :].reshape(
                -1, self.g_row, self.n_row, 10
            ),
            "loc_col": out_col[:, : self.dim3, :].reshape(
                -1, self.g_col, self.n_col, 10
            ),
            "exist_row": out_row[:, self.dim1 :, :].reshape(
                -1, 2, self.n_row, 10
            ),
            "exist_col": out_col[:, self.dim3 :, :].reshape(
                -1, 2, self.n_col, 10
            ),
            "lane_token_row": lane_token[:, :10, 0].sum(1),
            "lane_token_col": lane_token[:, 10:, 0].sum(1),
        }
