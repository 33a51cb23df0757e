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
