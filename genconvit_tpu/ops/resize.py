"""Resize as matmul — the TPU-native replacement for cv2.resize / torchvision
Resize in the hot path.

Both cv2 INTER_AREA (used on face crops, ref: model/pred_func.py:82-84) and
(torch)bilinear (used on the VAE reconstruction, ref: model/genconvit_vae.py:105)
are separable linear maps: out = W_h^T @ img @ W_w with tiny per-size weight
matrices. The weights are computed once on the host (numpy, cached); the
device does batched matmuls, which land on the MXU instead of a gather-heavy
image op. Batched over [N,H,W,C] with einsum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4096)
def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """Exact fractional-area-average weights, [in_size, out_size].

    Matches cv2.INTER_AREA decimation: output pixel o averages input span
    [o*s, (o+1)*s), s = in/out, with fractional end-pixel weights.
    """
    s = in_size / out_size
    w = np.zeros((in_size, out_size), dtype=np.float64)
    for o in range(out_size):
        a, b = o * s, (o + 1) * s
        i0, i1 = int(np.floor(a)), min(int(np.ceil(b)), in_size)
        for i in range(i0, i1):
            w[i, o] = max(0.0, (min(b, i + 1) - max(a, i))) / s
    return w.astype(np.float32)


@functools.lru_cache(maxsize=4096)
def _bilinear_torch_weights(in_size: int, out_size: int, antialias: bool = True) -> np.ndarray:
    """torchvision Resize(antialias=True) bilinear weights, [in_size, out_size].

    PIL-style triangle filter: support scales with the downscale factor when
    antialias=True; plain 2-tap lerp otherwise (align_corners=False mapping).
    """
    scale = in_size / out_size
    w = np.zeros((in_size, out_size), dtype=np.float64)
    if antialias and scale > 1.0:
        support = scale  # triangle radius 1.0, scaled
        inv = 1.0 / scale
        for o in range(out_size):
            center = (o + 0.5) * scale
            i0 = max(int(np.floor(center - support + 0.5)), 0)
            i1 = min(int(np.floor(center + support + 0.5)), in_size)
            t = 1.0 - np.abs((np.arange(i0, i1) + 0.5 - center) * inv)
            t = np.clip(t, 0.0, None)
            tot = t.sum()
            if tot > 0:
                w[i0:i1, o] = t / tot
    else:
        for o in range(out_size):
            c = (o + 0.5) * scale - 0.5
            i = int(np.floor(c))
            f = c - i
            lo, hi = np.clip(i, 0, in_size - 1), np.clip(i + 1, 0, in_size - 1)
            w[lo, o] += 1.0 - f
            w[hi, o] += f
    return w.astype(np.float32)


def resize_weight_matrix(in_size: int, out_size: int, method: str = "area") -> np.ndarray:
    if method == "area":
        return _area_weights(in_size, out_size)
    if method == "bilinear_torch":
        return _bilinear_torch_weights(in_size, out_size, antialias=True)
    if method == "bilinear":
        return _bilinear_torch_weights(in_size, out_size, antialias=False)
    raise ValueError(f"unknown resize method: {method}")


def _apply_separable(x: jax.Array, wh: jax.Array, ww: jax.Array) -> jax.Array:
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)
    # [N,h,w,C] x [h,H] -> [N,H,w,C]; then x [w,W] -> [N,H,W,C]
    y = jnp.einsum("nhwc,hH->nHwc", x, wh.astype(dtype))
    return jnp.einsum("nHwc,wW->nHWc", y, ww.astype(dtype))


def resize_area(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Batched cv2.resize(..., INTER_AREA)-equivalent resize. x: [N,H,W,C]
    (float or uint8), returns float. Static shapes — one compile per
    (in, out) size pair. Mirrors cv2's silent fallback: the true area path
    runs only when BOTH axes downscale; otherwise cv2 uses its 2-tap
    area_mode coefficients on both axes."""
    upscale = x.shape[1] < out_hw[0] or x.shape[2] < out_hw[1]
    mk = (lambda i, o: _crop_area_fallback_weights(i, 0.0, float(i), o)) \
        if upscale else _area_weights
    wh = jnp.asarray(mk(x.shape[1], out_hw[0]))
    ww = jnp.asarray(mk(x.shape[2], out_hw[1]))
    return _apply_separable(x, wh, ww)


def _crop_area_fallback_weights(in_size: int, lo: float, hi: float,
                                out_size: int) -> np.ndarray:
    """cv2's INTER_AREA generic-path coefficients (resize.cpp `area_mode`):
    the 2-tap scheme cv2 uses for BOTH axes whenever either axis upscales —
    sx = floor(dx*scale), fx = (dx+1) - (sx+1)/scale, taps (1-fx, fx) at
    (sx, sx+1), clamped at the crop edges. NOT the (dx+0.5)*scale-0.5
    bilinear mapping."""
    span = hi - lo
    w = np.zeros((in_size, out_size), dtype=np.float32)
    if span <= 0:
        return w
    scale = span / out_size
    inv_scale = out_size / span
    crop_last = max(int(np.ceil(span)) - 1, 0)  # last index within the crop
    base = max(int(np.floor(lo)), 0)
    for o in range(out_size):
        sx = int(np.floor(o * scale))
        fx = (o + 1) - (sx + 1) * inv_scale
        fx = 0.0 if fx <= 0 else fx - np.floor(fx)
        if sx < 0:
            sx, fx = 0, 0.0
        if sx >= crop_last:
            sx, fx = crop_last, 0.0
        a = min(base + sx, in_size - 1)
        b = min(base + sx + 1, in_size - 1)
        w[a, o] += 1.0 - fx
        w[b, o] += fx
    return w


def crop_resize_weights(in_size: int, lo: float, hi: float, out_size: int,
                        force_bilinear: bool = False) -> np.ndarray:
    """Weights [in_size, out_size] resampling the span [lo, hi) of an axis to
    out_size — crop+cv2.resize(INTER_AREA) as ONE matmul. With per-face
    (lo, hi) computed on the host, a batch of crops becomes two batched
    matmuls on the device (the §2.3 on-device crop+resize stage).

    cv2's INTER_AREA silently falls back to a 2-tap scheme when upscaling —
    the common case of a detected face smaller than the model size — so
    spans shorter than out_size get cv2's area_mode fallback weights. cv2
    applies the fallback to BOTH axes when either upscales; pass
    force_bilinear=True for the other axis of such a crop (or use
    crop_resize_weights_pair which handles the coupling)."""
    if force_bilinear or (hi - lo) < out_size:
        return _crop_area_fallback_weights(in_size, lo, hi, out_size)
    s = (hi - lo) / out_size
    w = np.zeros((in_size, out_size), dtype=np.float32)
    if s <= 0:
        return w
    for o in range(out_size):
        a, b = lo + o * s, lo + (o + 1) * s
        i0 = max(int(np.floor(a)), 0)
        i1 = min(int(np.ceil(b)), in_size)
        for i in range(i0, i1):
            w[i, o] = max(0.0, (min(b, i + 1) - max(a, i))) / s
    return w


def crop_resize_weights_pair(
        h: int, w: int, box: Tuple[float, float, float, float],
        out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(wh [h, out], ww [w, out]) for one (top, right, bottom, left) box,
    with cv2's coupled-axis INTER_AREA->bilinear fallback handled."""
    top, right, bottom, left = box
    bilinear = (bottom - top) < out_size or (right - left) < out_size
    return (crop_resize_weights(h, top, bottom, out_size, bilinear),
            crop_resize_weights(w, left, right, out_size, bilinear))


def crop_resize_batch(frames: jax.Array, wh: jax.Array, ww: jax.Array) -> jax.Array:
    """Device-side batched crop+resize: frames [F,H,W,C] (uint8/float),
    wh [F,H,OH], ww [F,W,OW] (per-frame crop_resize_weights). Returns float
    [F,OH,OW,C] — two batched matmuls, MXU-friendly."""
    dtype = frames.dtype if jnp.issubdtype(frames.dtype, jnp.floating) else jnp.float32
    x = frames.astype(dtype)
    y = jnp.einsum("fhwc,fhH->fHwc", x, wh.astype(dtype))
    return jnp.einsum("fHwc,fwW->fHWc", y, ww.astype(dtype))


def resize_bilinear_torch(x: jax.Array, out_hw: Tuple[int, int], antialias: bool = True) -> jax.Array:
    """torchvision transforms.Resize((H,W), antialias=True) equivalent
    (used on the VAE reconstruction, ref: model/genconvit_vae.py:105,115)."""
    wh = jnp.asarray(_bilinear_torch_weights(x.shape[1], out_hw[0], antialias))
    ww = jnp.asarray(_bilinear_torch_weights(x.shape[2], out_hw[1], antialias))
    return _apply_separable(x, wh, ww)
