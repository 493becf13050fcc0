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
