"""Torch oracle models for parity tests.

Hand-written from the architecture spec in SURVEY.md (ref file:line cited per
class) — these reproduce the *graphs* of the reference/timm models so the JAX
implementations and the weight converter can be validated numerically without
timm or the reference code. Used only by tests.
"""

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


class EDEncoderOracle(nn.Module):
    """5x [conv3x3 s1 p1 -> ReLU -> maxpool2] (ref model/genconvit_ed.py:8-36)."""

    def __init__(self):
        super().__init__()
        chans = [3, 16, 32, 64, 128, 256]
        layers = []
        for i in range(5):
            layers += [nn.Conv2d(chans[i], chans[i + 1], 3, 1, 1),
                       nn.ReLU(), nn.MaxPool2d(2, 2)]
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


class EDDecoderOracle(nn.Module):
    """5x [convT2x2 s2 -> ReLU] (ref model/genconvit_ed.py:38-61)."""

    def __init__(self):
        super().__init__()
        chans = [256, 128, 64, 32, 16, 3]
        layers = []
        for i in range(5):
            layers += [nn.ConvTranspose2d(chans[i], chans[i + 1], 2, 2), nn.ReLU()]
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


class VAEEncoderOracle(nn.Module):
    """4x [conv3x3 s2 p1 -> BN -> LeakyReLU]; mu/var heads; quirky reparam
    (ref model/genconvit_vae.py:10-60)."""

    def __init__(self, img_size=224, latent=None):
        super().__init__()
        chans = [3, 16, 32, 64, 128]
        layers = []
        for i in range(4):
            layers += [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1),
                       nn.BatchNorm2d(chans[i + 1]), nn.LeakyReLU()]
        self.features = nn.Sequential(*layers)
        flat = 128 * (img_size // 16) ** 2
        latent = latent or 256 * (img_size // 32) ** 2
        self.mu = nn.Linear(flat, latent)
        self.var = nn.Linear(flat, latent)

    def forward_mu_logvar(self, x):
        h = torch.flatten(self.features(x), start_dim=1)
        return self.mu(h), self.var(h)


class VAEDecoderOracle(nn.Module):
    """unflatten (256,s,s); 4x [convT2x2 s2 -> LeakyReLU]
    (ref model/genconvit_vae.py:62-88)."""

    def __init__(self, s=7):
        super().__init__()
        self.s = s
        chans = [256, 64, 32, 16, 3]
        layers = []
        for i in range(4):
            layers += [nn.ConvTranspose2d(chans[i], chans[i + 1], 2, 2), nn.LeakyReLU()]
        self.features = nn.Sequential(*layers)

    def forward(self, z):
        x = z.view(z.shape[0], 256, self.s, self.s)
        return self.features(x)


class ConvNeXtBlockOracle(nn.Module):
    """timm 0.6.5 ConvNeXt block: dwconv7 -> (NHWC) LN -> MLP -> gamma -> res."""

    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(OrderedDict([
            ("fc1", nn.Linear(dim, 4 * dim)),
            ("act", nn.GELU()),
            ("fc2", nn.Linear(4 * dim, dim)),
        ]))
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp(x)
        x = self.gamma * x
        return shortcut + x.permute(0, 3, 1, 2)


class ConvNeXtOracle(nn.Module):
    """Small configurable ConvNeXt with the timm 0.6.5 stage/head layout and
    timm-compatible parameter names (stem.*, stages.*, head.norm/fc)."""

    def __init__(self, depths=(1, 1), dims=(8, 16), num_classes=10):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            LayerNorm2dOracle(dims[0]),
        )
        stages = []
        in_dim = dims[0]
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if si > 0:
                stage.downsample = nn.Sequential(
                    LayerNorm2dOracle(in_dim),
                    nn.Conv2d(in_dim, dim, 2, stride=2),
                )
            stage.blocks = nn.Sequential(*[ConvNeXtBlockOracle(dim) for _ in range(depth)])
            stages.append(stage)
            in_dim = dim
        self.stages = nn.ModuleList(stages)
        self.head = nn.Module()
        self.head.norm = LayerNorm2dOracle(dims[-1])
        self.head.fc = nn.Linear(dims[-1], num_classes)

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
            x = stage.blocks(x)
        x = x.mean(dim=(2, 3), keepdim=True)
        x = self.head.norm(x).flatten(1)
        return self.head.fc(x)


class LayerNorm2dOracle(nn.LayerNorm):
    """LayerNorm over C of NCHW (timm LayerNorm2d), eps=1e-6."""

    def __init__(self, dim):
        super().__init__(dim, eps=1e-6)

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class SwinWindowAttentionOracle(nn.Module):
    """Swin W-MSA with relative position bias (timm 0.6.5 graph)."""

    def __init__(self, dim, num_heads, window):
        super().__init__()
        self.num_heads = num_heads
        self.window = window
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, num_heads) * 0.02
        )
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0) + (window - 1)
        self.register_buffer(
            "relative_position_index",
            rel[..., 0] * (2 * window - 1) + rel[..., 1], persistent=False)

    def forward(self, x, mask=None):
        b, l, c = x.shape
        qkv = self.qkv(x).reshape(b, l, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(l, l, -1)
        attn = attn + bias.permute(2, 0, 1)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, self.num_heads, l, l) + mask[:, None]
            attn = attn.view(b, self.num_heads, l, l)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, l, c)
        return self.proj(x)
