"""Host/device preprocessing.

The reference normalizes each face with /255 then ImageNet mean/std
(ref: model/pred_func.py:95-108 via dataset/loader.py:63-78). Here the uint8
face batch ships to the device once and normalization runs inside the jitted
forward (XLA fuses it into the first conv), with fixed shapes + validity mask
so frame-count variation never recompiles.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_batch(frames_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [N,H,W,3] -> normalized [N,H,W,3] in `dtype` (device-side)."""
    x = frames_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x.astype(dtype)


def denormalize(x: jax.Array) -> jax.Array:
    return x * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)


# YUV -> RGB coefficient rows (R,G,B) x (Y,U,V) for limited/full range.
# Limited: c = 1.164(Y-16) + k(U-128, V-128); full: Y unscaled.
_YUV_COEFFS = {
    # (space, full_range): 3x3 matrix, offsets handled separately
    ("bt601", False): np.array([[1.164, 0.0, 1.596],
                                [1.164, -0.392, -0.813],
                                [1.164, 2.017, 0.0]], np.float32),
    ("bt709", False): np.array([[1.164, 0.0, 1.793],
                                [1.164, -0.213, -0.533],
                                [1.164, 2.112, 0.0]], np.float32),
    ("bt601", True): np.array([[1.0, 0.0, 1.402],
                               [1.0, -0.344, -0.714],
                               [1.0, 1.772, 0.0]], np.float32),
    ("bt709", True): np.array([[1.0, 0.0, 1.5748],
                               [1.0, -0.1873, -0.4681],
                               [1.0, 1.8556, 0.0]], np.float32),
}


def yuv_matrix(space: str = "bt601", full_range: bool = False) -> np.ndarray:
    return _YUV_COEFFS[(space, full_range)]


def yuv_affine(space: str = "bt601", full_range: bool = False) -> np.ndarray:
    """[3,4] affine YUV->RGB transform: rgb = A[:, :3] @ [Y,U,V] + A[:, 3].

    Folds the range offsets (Y-16 for limited range, U/V-128) into the
    offset column so per-video transforms can encode *both* the colorspace
    coefficients and the range — mixed full/limited-range video batches stay
    exact through one batched [V,3,4] tensor."""
    m = _YUV_COEFFS[(space, full_range)]
    off = -m @ np.array([0.0 if full_range else 16.0, 128.0, 128.0], np.float32)
    return np.concatenate([m, off[:, None]], axis=1)


def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array,
                  matrix: jax.Array, full_range: bool = False) -> jax.Array:
    """Device-side planar YUV420 -> RGB float (0..255 scale).

    y: [N,H,W] uint8; u, v: [N,H/2,W/2] uint8; matrix: [3,3] / [N,3,3]
    coefficient matrices (offsets from `full_range`), or [3,4] / [N,3,4]
    affine transforms from `yuv_affine` (offsets folded in, per-video range
    exact). Chroma upsampled by nearest (2x2 repeat). Shipping YUV420 halves
    the host->HBM payload vs RGB24 and moves the colorspace math onto the
    VPU where it fuses into normalization.
    """
    n, h, w = y.shape
    affine = matrix.shape[-1] == 4
    yf = y.astype(jnp.float32) - (0.0 if (affine or full_range) else 16.0)
    uf = u.astype(jnp.float32) - (0.0 if affine else 128.0)
    vf = v.astype(jnp.float32) - (0.0 if affine else 128.0)
    uf = jnp.repeat(jnp.repeat(uf, 2, axis=1), 2, axis=2)[:, :h, :w]
    vf = jnp.repeat(jnp.repeat(vf, 2, axis=1), 2, axis=2)[:, :h, :w]
    yuv = jnp.stack([yf, uf, vf], axis=-1)  # [N,H,W,3]
    matrix = matrix.astype(jnp.float32)
    coeffs = matrix[..., :3]
    if matrix.ndim == 2:
        rgb = jnp.einsum("nhwc,rc->nhwr", yuv, coeffs)
        if affine:
            rgb = rgb + matrix[:, 3]
    else:
        rgb = jnp.einsum("nhwc,nrc->nhwr", yuv, coeffs)
        if affine:
            rgb = rgb + matrix[:, :, 3][:, None, None, :]
    return jnp.clip(rgb, 0.0, 255.0)


def normalize_yuv420(y: jax.Array, u: jax.Array, v: jax.Array,
                     matrix: jax.Array, dtype=jnp.float32,
                     full_range: bool = False) -> jax.Array:
    """Fused YUV420 -> RGB -> ImageNet-normalized [N,H,W,3] in `dtype`."""
    rgb = yuv420_to_rgb(y, u, v, matrix, full_range) / 255.0
    rgb = (rgb - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return rgb.astype(dtype)


def pad_faces(faces_u8: np.ndarray, num_frames: int,
              img_size: int = 224) -> Tuple[np.ndarray, np.ndarray]:
    """[k,S,S,3] uint8 (k may be 0..num_frames) -> fixed ([F,S,S,3], mask [F])."""
    k = len(faces_u8)
    batch = np.zeros((num_frames, img_size, img_size, 3), dtype=np.uint8)
    if k:
        batch[:k] = faces_u8[:num_frames]
    mask = np.zeros((num_frames,), dtype=np.float32)
    mask[: min(k, num_frames)] = 1.0
    return batch, mask
