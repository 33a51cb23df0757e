"""On-device face detector — a compact anchor-based CNN (BlazeFace-style)
so detection can run *batched on the TPU* instead of serial dlib-HOG on the
host (the reference's CPU bottleneck, SURVEY.md §3.1 hot loop 2 / §2.3).

Design: 128x128 input, depthwise-separable conv backbone to 16x16 and 8x8
feature maps, 2 + 6 anchors per cell (896 total), per-anchor score + center
offset + size. Decode and fixed-iteration NMS are jit-friendly (static
shapes, top-k + IoU suppression loop). Weights load from a normal framework
checkpoint; a training recipe over face-box data uses the standard train
stack. No pretrained weights ship with this repo (nothing redistributable
offline) — the `jax` face backend (data/faces.py) requires a trained
checkpoint and is exercised structurally in tests.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genconvit_tpu.ops import conv2d, relu
from genconvit_tpu.ops.init import conv_init

INPUT_SIZE = 128
_ANCHORS_16 = 2
_ANCHORS_8 = 6


# static stride plans (strides can't live in the param pytree under jit)
_STRIDES_16 = (1, 2, 1, 2, 1)
_STRIDES_8 = (2, 1)


def _sep_block_init(key, cin, cout, stride=1):
    del stride  # structure is static; see _STRIDES_*
    k1, k2 = jax.random.split(key)
    return {
        "dw": conv_init(k1, 3, 3, cin, cin, groups=cin),
        "pw": conv_init(k2, 1, 1, cin, cout),
    }


def _sep_block(p, x, s: int = 1):
    h = conv2d(x, p["dw"]["kernel"], p["dw"]["bias"], stride=s, padding=1,
               groups=x.shape[-1])
    h = relu(h)
    h = conv2d(h, p["pw"]["kernel"], p["pw"]["bias"])
    if s == 1 and h.shape[-1] == x.shape[-1]:
        h = h + x
    return relu(h)


def init_facedet(key: jax.Array) -> Dict:
    keys = iter(jax.random.split(key, 16))
    return {
        "stem": conv_init(next(keys), 5, 5, 3, 24),
        "blocks16": [  # 64 -> 32 -> 16
            _sep_block_init(next(keys), 24, 24),
            _sep_block_init(next(keys), 24, 48, stride=2),
            _sep_block_init(next(keys), 48, 48),
            _sep_block_init(next(keys), 48, 96, stride=2),
            _sep_block_init(next(keys), 96, 96),
        ],
        "blocks8": [  # 16 -> 8
            _sep_block_init(next(keys), 96, 96, stride=2),
            _sep_block_init(next(keys), 96, 96),
        ],
        "head16": conv_init(next(keys), 1, 1, 96, _ANCHORS_16 * 5),
        "head8": conv_init(next(keys), 1, 1, 96, _ANCHORS_8 * 5),
    }


@functools.lru_cache(maxsize=4)
def anchor_centers() -> np.ndarray:
    """[896, 2] (cy, cx) in [0,1]."""
    out = []
    for grid, n in ((16, _ANCHORS_16), (8, _ANCHORS_8)):
        ys, xs = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
        c = np.stack([(ys + 0.5) / grid, (xs + 0.5) / grid], -1)
        out.append(np.repeat(c.reshape(-1, 2), n, axis=0))
    return np.concatenate(out).astype(np.float32)


def facedet_apply(params: Dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: [N,128,128,3] in [-1,1]. Returns (scores [N,896], boxes [N,896,4])
    with boxes as (cy, cx, h, w) in [0,1] image coords."""
    h = conv2d(x, params["stem"]["kernel"], params["stem"]["bias"],
               stride=2, padding=2)
    h = relu(h)
    for blk, s in zip(params["blocks16"], _STRIDES_16):
        h = _sep_block(blk, h, s)
    f16 = h
    for blk, s in zip(params["blocks8"], _STRIDES_8):
        h = _sep_block(blk, h, s)
    f8 = h
    o16 = conv2d(f16, params["head16"]["kernel"], params["head16"]["bias"])
    o8 = conv2d(f8, params["head8"]["kernel"], params["head8"]["bias"])
    n = x.shape[0]
    raw = jnp.concatenate([o16.reshape(n, -1, 5), o8.reshape(n, -1, 5)], axis=1)
    scores = raw[..., 0]
    centers = jnp.asarray(anchor_centers())
    cy = centers[:, 0] + raw[..., 1] * 0.1
    cx = centers[:, 1] + raw[..., 2] * 0.1
    bh = jnp.exp(jnp.clip(raw[..., 3], -4, 2)) * 0.2
    bw = jnp.exp(jnp.clip(raw[..., 4], -4, 2)) * 0.2
    return scores, jnp.stack([cy, cx, bh, bw], axis=-1)


def _iou(box: jax.Array, boxes: jax.Array) -> jax.Array:
    """box (cy,cx,h,w) vs boxes [K,4] -> IoU [K]."""
    def corners(b):
        return (b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2,
                b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2)

    t1, l1, b1, r1 = corners(box)
    t2, l2, b2, r2 = corners(boxes)
    ih = jnp.clip(jnp.minimum(b1, b2) - jnp.maximum(t1, t2), 0)
    iw = jnp.clip(jnp.minimum(r1, r2) - jnp.maximum(l1, l2), 0)
    inter = ih * iw
    union = box[..., 2] * box[..., 3] + boxes[..., 2] * boxes[..., 3] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(scores: jax.Array, boxes: jax.Array, *, max_out: int = 4,
        score_thresh: float = 0.0, iou_thresh: float = 0.3
        ) -> Tuple[jax.Array, jax.Array]:
    """Single image: scores [A], boxes [A,4] -> (kept scores [max_out],
    kept boxes [max_out,4]); suppressed slots carry score -inf. Static-shape,
    jit/vmap-friendly greedy NMS."""
    top_s, top_i = jax.lax.top_k(scores, 32)
    top_b = boxes[top_i]

    def body(i, state):
        out_s, out_b, alive = state
        # pick the best alive candidate
        masked = jnp.where(alive, top_s, -jnp.inf)
        j = jnp.argmax(masked)
        best_s, best_b = masked[j], top_b[j]
        valid = best_s > score_thresh
        out_s = out_s.at[i].set(jnp.where(valid, best_s, -jnp.inf))
        out_b = out_b.at[i].set(jnp.where(valid, best_b, 0.0))
        ious = _iou(best_b, top_b)
        alive = alive & (ious < iou_thresh) & valid
        return out_s, out_b, alive

    init = (jnp.full((max_out,), -jnp.inf), jnp.zeros((max_out, 4)),
            jnp.ones((32,), bool))
    out_s, out_b, _ = jax.lax.fori_loop(0, max_out, body, init)
    return out_s, out_b


def detect_batch(params: Dict, frames_u8: jax.Array, *, max_faces: int = 4,
                 score_thresh: float = 0.5, iou_thresh: float = 0.3
                 ) -> Tuple[jax.Array, jax.Array]:
    """frames_u8 [N,128,128,3] uint8 -> (scores [N,max], boxes [N,max,4])."""
    x = frames_u8.astype(jnp.float32) / 127.5 - 1.0
    scores, boxes = facedet_apply(params, x)
    probs = jax.nn.sigmoid(scores)
    return jax.vmap(functools.partial(nms, max_out=max_faces,
                                      score_thresh=score_thresh,
                                      iou_thresh=iou_thresh))(probs, boxes)
