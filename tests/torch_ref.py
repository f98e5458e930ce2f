"""Golden-reference torch fixtures for parity tests.

Hand-written from the reference's published equations (gated attention:
``softmax(w^T (tanh(V H) * sigmoid(U H)))``; BN with batch statistics;
standard ResNet architecture) using only core ``torch.nn`` — torchvision is
not available in this environment.  State-dict key names follow torchvision /
reference conventions so the same fixtures also exercise ``models/port.py``.

These are test fixtures, not part of the framework.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def batchstats_bn(c: int) -> nn.BatchNorm2d:
    """BatchNorm2d that always normalizes with current-batch statistics —
    the semantics the reference enforces via deactivate_batchnorm."""
    bn = nn.BatchNorm2d(c, track_running_stats=False)
    return bn


class TorchBasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = batchstats_bn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = batchstats_bn(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), batchstats_bn(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin: int, width: int, stride: int = 1):
        super().__init__()
        cout = width * self.expansion
        self.conv1 = nn.Conv2d(cin, width, 1, 1, bias=False)
        self.bn1 = batchstats_bn(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = batchstats_bn(width)
        self.conv3 = nn.Conv2d(width, cout, 1, 1, bias=False)
        self.bn3 = batchstats_bn(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), batchstats_bn(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


class TorchResNetFeatures(nn.Module):
    """Headless ResNet with torchvision-style attribute names."""

    def __init__(self, stage_sizes, bottleneck: bool = False):
        super().__init__()
        block = TorchBottleneck if bottleneck else TorchBasicBlock
        exp = 4 if bottleneck else 1
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = batchstats_bn(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, blocks in enumerate(stage_sizes):
            width = 64 * 2**stage
            layers = []
            for b in range(blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                layers.append(block(cin, width, stride))
                cin = width * exp
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layers))
        self.num_features = cin

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return torch.mean(x, dim=(2, 3))  # adaptive avg pool to 1x1


def torch_resnet(backbone: str) -> TorchResNetFeatures:
    cfg = {"r18": ((2, 2, 2, 2), False), "r34": ((3, 4, 6, 3), False), "r50": ((3, 4, 6, 3), True)}
    sizes, bott = cfg[backbone]
    return TorchResNetFeatures(sizes, bott)


class TorchMultiHeadGAMIL(nn.Module):
    """Reference-equation multi-head GA-MIL with reference state_dict keys."""

    def __init__(
        self,
        num_classes: int = 2,
        backbone: str = "r18",
        D: int = 128,
        feature_dropout: float = 0.1,
        attention_dropout: float = 0.1,
        shared_attention: bool = True,
    ):
        super().__init__()
        self.num_classes = num_classes
        self.shared_attention = shared_attention
        self.feature_extractor = torch_resnet(backbone)
        L = self.feature_extractor.num_features
        if shared_attention:
            self.attention_V = nn.Sequential(nn.Linear(L, D), nn.Tanh())
            self.attention_U = nn.Sequential(nn.Linear(L, D), nn.Sigmoid())
        else:
            self.attention_V = nn.ModuleList(
                [nn.Sequential(nn.Linear(L, D), nn.Tanh()) for _ in range(num_classes)]
            )
            self.attention_U = nn.ModuleList(
                [nn.Sequential(nn.Linear(L, D), nn.Sigmoid()) for _ in range(num_classes)]
            )
        self.attention_weights = nn.ModuleList(
            [nn.Linear(D, 1) for _ in range(num_classes)]
        )
        self.classifiers = nn.ModuleList(
            [nn.Linear(L, 1, bias=False) for _ in range(num_classes)]
        )
        self.feature_dropout = nn.Dropout(feature_dropout)
        self.attention_dropouts = nn.ModuleList(
            [nn.Dropout(attention_dropout) for _ in range(num_classes)]
        )

    def forward(self, bag: torch.Tensor):
        """bag: (N, 3, H, W) one bag.  Returns (Y (C,), A (C, N))."""
        H = self.feature_extractor(bag)  # (N, L)
        H = self.feature_dropout(H)
        ys, atts = [], []
        for i in range(self.num_classes):
            av = (self.attention_V if self.shared_attention else self.attention_V[i])(H)
            au = (self.attention_U if self.shared_attention else self.attention_U[i])(H)
            logits = self.attention_weights[i](av * au).squeeze(-1)  # (N,)
            logits = self.attention_dropouts[i](logits)
            a = torch.softmax(logits, dim=-1)
            m = a @ H  # (L,)
            ys.append(self.classifiers[i](m))
            atts.append(a)
        return torch.cat(ys, dim=-1), torch.stack(atts, dim=0)


def torch_pairwise_aux(pos_a, neg_a, is_positive, margin=1.0):
    """Reference auxiliary loss equations (pairwise mode)."""
    d = F.pairwise_distance(pos_a.unsqueeze(0), neg_a.unsqueeze(0), p=2)
    if is_positive:
        return torch.clamp(margin - d, min=0).mean()
    return d.mean()


class TorchSingleHeadGAMIL(nn.Module):
    """Reference-equation single-head GA-MIL with reference state_dict keys."""

    def __init__(
        self,
        num_classes: int = 1,
        backbone: str = "r18",
        D: int = 128,
        K: int = 1,
        feature_dropout: float = 0.1,
        attention_dropout: float = 0.1,
    ):
        super().__init__()
        self.K = K
        self.feature_extractor = torch_resnet(backbone)
        L = self.feature_extractor.num_features
        self.attention_V = nn.Sequential(
            nn.Linear(L, D), nn.Tanh(), nn.Dropout(attention_dropout)
        )
        self.attention_U = nn.Sequential(
            nn.Linear(L, D), nn.Sigmoid(), nn.Dropout(attention_dropout)
        )
        self.attention_weights = nn.Linear(D, K)
        self.classifier = nn.Sequential(nn.Linear(L * K, num_classes))
        self.feature_dropout = nn.Dropout(feature_dropout)

    def forward(self, bag: torch.Tensor):
        H = self.feature_extractor(bag)
        H = self.feature_dropout(H)
        logits = self.attention_weights(self.attention_V(H) * self.attention_U(H))
        a = torch.softmax(logits.T, dim=-1)  # (K, N)
        m = a @ H  # (K, L)
        y = self.classifier(m.reshape(-1))
        return y, a
