"""Swin Transformer, functional NHWC/token implementation.

Graph-equivalent to timm 0.6.5 `swin_tiny_patch4_window7_224` /
`swin_large_patch4_window7_224` as instantiated by the reference as the
"embedder" (ref: model/genconvit_ed.py:69, model/genconvit_vae.py:96). Per Q1
(SURVEY.md §8) these parameters are registered-but-unused in the reference's
effective forward graph; we implement the full model so (a) converted
checkpoints round-trip, (b) the opt-in `use_hybrid_embed` path actually runs,
and (c) the framework exposes a complete Swin family.

Windowed attention is embarrassingly parallel over (batch x windows) — ideal
MXU batching: qkv/proj are [*, C]x[C, 3C] matmuls, attention is a batched
[49x49] matmul per head. A Pallas fused-window-attention kernel can slot in at
`_window_attention` (ops/pallas) — the XLA path is already well fused.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genconvit_tpu.ops import conv2d, gelu, layer_norm, linear
from genconvit_tpu.ops.init import conv_init, layer_norm_init, linear_init, trunc_normal_init

SWIN_CFGS: Dict[str, Dict[str, Any]] = {
    "swin_tiny_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window=7
    ),
    "swin_small_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), window=7
    ),
    "swin_base_patch4_window7_224": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=7
    ),
    "swin_large_patch4_window7_224": dict(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window=7
    ),
}

_LN_EPS = 1e-5  # torch nn.LayerNorm default used by Swin


@functools.lru_cache(maxsize=32)
def relative_position_index(window: int, table_window: int | None = None) -> np.ndarray:
    """The [w*w, w*w] index buffer into the (2*tw-1)^2 bias table
    (deterministic; stored as a buffer in torch checkpoints — recomputed
    here, not converted). `table_window` covers the clamped-window case
    (window < table geometry): relative coords from `window` index the
    centered entries of the larger table."""
    tw = table_window or window
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, L, L]
    rel = rel.transpose(1, 2, 0) + (tw - 1)
    return (rel[..., 0] * (2 * tw - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Attention mask [nW, L, L] (0 or -100) for shifted windows, matching the
    original Swin construction."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _init_block(keys, dim: int, num_heads: int, window: int) -> Dict:
    k_qkv, k_proj, k_fc1, k_fc2, k_bias = keys
    return {
        "norm1": layer_norm_init(dim),
        "attn": {
            "qkv": linear_init(k_qkv, dim, 3 * dim),
            "proj": linear_init(k_proj, dim, dim),
            "relative_position_bias_table": trunc_normal_init(
                k_bias, ((2 * window - 1) ** 2, num_heads)
            ),
        },
        "norm2": layer_norm_init(dim),
        "mlp": {
            "fc1": linear_init(k_fc1, dim, 4 * dim),
            "fc2": linear_init(k_fc2, 4 * dim, dim),
        },
    }


def init_swin(key: jax.Array, name: str = "swin_tiny_patch4_window7_224",
              num_classes: int = 1000, img_size: int = 224) -> Dict:
    cfg = SWIN_CFGS[name]
    dim0, depths = cfg["embed_dim"], cfg["depths"]
    window = cfg["window"]
    n_keys = 2 + sum(depths) * 5 + len(depths) + 1
    keys = iter(jax.random.split(key, n_keys))
    params: Dict[str, Any] = {
        "patch_embed": {
            "proj": conv_init(next(keys), 4, 4, 3, dim0),
            "norm": layer_norm_init(dim0),
        },
        "layers": [],
        "norm": layer_norm_init(dim0 * 2 ** (len(depths) - 1)),
        "head": linear_init(next(keys), dim0 * 2 ** (len(depths) - 1), num_classes),
    }
    dim = dim0
    for li, depth in enumerate(depths):
        layer: Dict[str, Any] = {"blocks": []}
        for _ in range(depth):
            blk_keys = [next(keys) for _ in range(5)]
            layer["blocks"].append(_init_block(blk_keys, dim, cfg["num_heads"][li], window))
        if li < len(depths) - 1:
            layer["downsample"] = {
                "norm": layer_norm_init(4 * dim),
                "reduction": {"kernel": trunc_normal_init(next(keys), (4 * dim, 2 * dim))},
            }
            dim *= 2
        params["layers"].append(layer)
    return params


def _window_partition(x: jax.Array, window: int) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(win: jax.Array, window: int, h: int, w: int) -> jax.Array:
    n = win.shape[0] // ((h // window) * (w // window))
    x = win.reshape(n, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


def _window_attention(p: Dict, x: jax.Array, num_heads: int, window: int,
                      mask: jax.Array | None) -> jax.Array:
    """x: [B, L, C] windows; standard MSA with relative position bias."""
    b, l, c = x.shape
    head_dim = c // num_heads
    qkv = linear(x, p["qkv"]["kernel"], p["qkv"]["bias"])
    qkv = qkv.reshape(b, l, 3, num_heads, head_dim).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, nH, L, hd]
    table_rows = p["relative_position_bias_table"].shape[0]
    table_window = (int(round(table_rows ** 0.5)) + 1) // 2
    idx = jnp.asarray(relative_position_index(window, table_window).reshape(-1))
    bias = jnp.take(p["relative_position_bias_table"], idx, axis=0)
    bias = bias.reshape(l, l, num_heads).transpose(2, 0, 1)

    from genconvit_tpu.ops.pallas import pallas_enabled

    if pallas_enabled():
        from genconvit_tpu.ops.pallas.window_attn import window_attention_pallas

        g = b * num_heads  # head fastest, window next — kernel's indexing
        out = window_attention_pallas(
            q.reshape(g, l, head_dim), k.reshape(g, l, head_dim),
            v.reshape(g, l, head_dim), bias,
            mask=mask, heads=num_heads,
            windows_per_mask=(mask.shape[0] if mask is not None else 1))
        out = out.reshape(b, num_heads, l, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
        return linear(out, p["proj"]["kernel"], p["proj"]["bias"])

    q = q * (head_dim ** -0.5)
    attn = jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32)
    attn = attn + bias.astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, num_heads, l, l) + mask[:, None].astype(attn.dtype)
        attn = attn.reshape(b, num_heads, l, l)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", attn, v).transpose(0, 2, 1, 3).reshape(b, l, c)
    return linear(out, p["proj"]["kernel"], p["proj"]["bias"])


def _swin_block(p: Dict, x: jax.Array, hw: Tuple[int, int], num_heads: int,
                window: int, shift: int) -> jax.Array:
    h, w = hw
    n, l, c = x.shape
    shortcut = x
    x = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=_LN_EPS)
    x = x.reshape(n, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shifted_window_mask(h, w, window, shift))
    else:
        mask = None
    wins = _window_partition(x, window)
    wins = _window_attention(p["attn"], wins, num_heads, window, mask)
    x = _window_reverse(wins, window, h, w)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x.reshape(n, l, c)
    x = shortcut + x
    y = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps=_LN_EPS)
    y = linear(y, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"])
    y = gelu(y)
    y = linear(y, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"])
    return x + y


def _patch_merging(p: Dict, x: jax.Array, hw: Tuple[int, int]) -> Tuple[jax.Array, Tuple[int, int]]:
    h, w = hw
    if h % 2 or w % 2:
        # timm 0.6.5 PatchMerging asserts even resolutions; fail clearly.
        raise ValueError(f"swin patch merging needs an even grid, got {h}x{w}")
    n, l, c = x.shape
    x = x.reshape(n, h, w, c)
    # torch cat order: x0=[0::2,0::2], x1=[1::2,0::2], x2=[0::2,1::2], x3=[1::2,1::2]
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
    )
    x = x.reshape(n, (h // 2) * (w // 2), 4 * c)
    x = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps=_LN_EPS)
    x = linear(x, p["reduction"]["kernel"])
    return x, (h // 2, w // 2)


def swin_features(params: Dict, x: jax.Array,
                  name: str = "swin_tiny_patch4_window7_224") -> jax.Array:
    """[N,H,W,3] -> [N, L, C] final token features (post final-norm).
    `name` selects the static arch config (heads/window) — params hold only
    arrays so the tree stays jit/sharding-friendly."""
    cfg = SWIN_CFGS[name]
    window = cfg["window"]
    x = conv2d(x, params["patch_embed"]["proj"]["kernel"],
               params["patch_embed"]["proj"]["bias"], stride=4)
    n, h, w, c = x.shape
    x = x.reshape(n, h * w, c)
    x = layer_norm(x, params["patch_embed"]["norm"]["scale"],
                   params["patch_embed"]["norm"]["bias"], eps=_LN_EPS)
    hw = (h, w)
    for li, layer in enumerate(params["layers"]):
        num_heads = cfg["num_heads"][li]
        # timm clamps the block window to min(input_resolution) (and zeroes
        # the shift) when the grid is smaller than the window; grids that are
        # neither window-divisible nor <= window are unsupported in timm
        # 0.6.5 too — fail loudly instead of crashing inside a reshape.
        eff_window = min(window, min(hw))
        if hw[0] % eff_window or hw[1] % eff_window:
            raise ValueError(
                f"swin_features: stage {li} grid {hw[0]}x{hw[1]} is not "
                f"divisible by window {eff_window} (img_size must give "
                f"window-divisible or <=window grids at every stage, as in "
                f"timm 0.6.5)")
        for bi, blk in enumerate(layer["blocks"]):
            shift = 0 if (bi % 2 == 0 or min(hw) <= window) else eff_window // 2
            x = _swin_block(blk, x, hw, num_heads, eff_window, shift)
        if "downsample" in layer:
            x, hw = _patch_merging(layer["downsample"], x, hw)
    return layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], eps=_LN_EPS)


def swin_apply(params: Dict, x: jax.Array,
               name: str = "swin_tiny_patch4_window7_224") -> jax.Array:
    """Full forward: [N,H,W,3] -> [N,num_classes] (mean token pool -> fc)."""
    x = swin_features(params, x, name)
    x = jnp.mean(x, axis=1)
    return linear(x, params["head"]["kernel"], params["head"]["bias"])
