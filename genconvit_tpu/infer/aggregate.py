"""Per-video aggregation with exact reference semantics.

ref model/pred_func.py:111-135 — sigmoid (NOT softmax) of the per-frame
2-class logits, mean over the frame axis, argmax; the stored `pred` is a
*pseudo*-P(fake): mean[0] if class 0 wins else |1 - mean[1]| (quirk B3).
Class 0 = FAKE at the model output; the label string maps through
`{0:'REAL',1:'FAKE'}[y ^ 1]` (quirk B2).

Deviation (documented bug-fix): the reference's `.squeeze()` breaks on
single-face videos (quirk B10); the masked mean here handles any count >= 1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_prob_sums(logits: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Distributable half of the aggregation: (sum of masked sigmoid probs
    [2], mask count). Because the reference's frame mean (ref
    model/pred_func.py:123-131) is a plain masked mean, these partial sums
    psum cleanly over a frame-sharded mesh axis — `lax.psum` both, then
    `finish_aggregate` — which is exactly how the long-video sequence-axis
    path distributes one video's frames across chips
    (parallel/eval_shard.py predict_long_video)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return jnp.sum(probs * mask[:, None], axis=0), jnp.sum(mask)


def finish_aggregate(sum_probs: jax.Array, count: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(global prob sums [2], global mask count) -> (y, y_val)."""
    mean_val = sum_probs / jnp.maximum(count, 1.0)
    y = jnp.argmax(mean_val).astype(jnp.int32)
    y_val = jnp.where(mean_val[0] > mean_val[1], mean_val[0],
                      jnp.abs(1.0 - mean_val[1]))
    return y, y_val


def aggregate_logits(logits: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """logits: [K,2]; mask: [K] validity (1.0 = real face row).

    Returns (y int32, y_val float32) — the (argmax, pseudo-P(fake)) pair.
    For the ensemble net, K = 2F and mask is the frame mask tiled twice
    (ED rows then VAE rows — batch-axis concat semantics).
    """
    return finish_aggregate(*masked_prob_sums(logits, mask))


def real_or_fake(prediction: int) -> str:
    """ref: model/pred_func.py:134-135."""
    return {0: "REAL", 1: "FAKE"}[int(prediction) ^ 1]


DEFAULT_VERDICT = (0, 0.5)  # zero-face fallback (ref prediction.py:250-253)
