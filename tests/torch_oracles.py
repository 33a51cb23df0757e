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


class SwinBlockOracle(nn.Module):
    """Swin block: W-MSA/SW-MSA + MLP with pre-norms (timm 0.6.5 graph)."""

    def __init__(self, dim, heads, window, shift, resolution):
        super().__init__()
        self.window, self.shift, self.resolution = window, shift, resolution
        self.norm1 = nn.LayerNorm(dim)
        self.attn = SwinWindowAttentionOracle(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(OrderedDict([
            ("fc1", nn.Linear(dim, 4 * dim)), ("act", nn.GELU()),
            ("fc2", nn.Linear(4 * dim, dim))]))
        if shift > 0:
            h = w = resolution
            img = torch.zeros(h, w, dtype=torch.long)
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            win = img.view(h // window, window, w // window, window)
            win = win.permute(0, 2, 1, 3).reshape(-1, window * window)
            mask = win[:, None, :] - win[:, :, None]
            mask = torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))
            self.register_buffer("attn_mask", mask, persistent=False)
        else:
            self.attn_mask = None

    def forward(self, x):
        h = w = self.resolution
        n, l, c = x.shape
        shortcut = x
        x = self.norm1(x).view(n, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        win = x.view(n, h // self.window, self.window, w // self.window,
                     self.window, c).permute(0, 1, 3, 2, 4, 5)
        win = win.reshape(-1, self.window * self.window, c)
        win = self.attn(win, self.attn_mask)
        x = win.view(n, h // self.window, w // self.window, self.window,
                     self.window, c).permute(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(n, l, c)
        return x + self.mlp(self.norm2(x))


class SwinOracle(nn.Module):
    """Small Swin with timm-0.6.5-compatible names (patch_embed/layers/norm/head)."""

    def __init__(self, img=32, dim=16, depths=(2, 2), heads=(2, 4), window=4,
                 num_classes=10):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, 4, stride=4)
        self.patch_embed.norm = nn.LayerNorm(dim)
        res = img // 4
        layers = []
        d = dim
        for li, depth in enumerate(depths):
            layer = nn.Module()
            blocks = []
            for bi in range(depth):
                shift = 0 if (bi % 2 == 0 or res <= window) else window // 2
                blocks.append(SwinBlockOracle(d, heads[li], window, shift, res))
            layer.blocks = nn.Sequential(*blocks)
            if li < len(depths) - 1:
                layer.downsample = nn.Module()
                layer.downsample.norm = nn.LayerNorm(4 * d)
                layer.downsample.reduction = nn.Linear(4 * d, 2 * d, bias=False)
                d *= 2
                res //= 2
            layers.append(layer)
        self.layers = nn.ModuleList(layers)
        self.norm = nn.LayerNorm(d)
        self.head = nn.Linear(d, num_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        n, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for layer in self.layers:
            x = layer.blocks(x)
            if hasattr(layer, "downsample"):
                l = x.shape[1]
                hh = int(l ** 0.5)
                xi = x.view(n, hh, hh, -1)
                x = torch.cat([xi[:, 0::2, 0::2], xi[:, 1::2, 0::2],
                               xi[:, 0::2, 1::2], xi[:, 1::2, 1::2]], dim=-1)
                x = x.view(n, (hh // 2) ** 2, -1)
                x = layer.downsample.norm(x)
                x = layer.downsample.reduction(x)
        x = self.norm(x)
        return self.head(x.mean(dim=1))
