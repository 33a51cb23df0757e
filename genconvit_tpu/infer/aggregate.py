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


def aggregate_logits(logits: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """logits: [K,2]; mask: [K] validity (1.0 = real face row).

    Returns (y int32, y_val float32) — the (argmax, pseudo-P(fake)) pair.
    For the ensemble net, K = 2F and mask is the frame mask tiled twice
    (ED rows then VAE rows — batch-axis concat semantics).
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    mean_val = jnp.sum(probs * mask[:, None], axis=0) / denom
    y = jnp.argmax(mean_val).astype(jnp.int32)
    y_val = jnp.where(mean_val[0] > mean_val[1], mean_val[0],
                      jnp.abs(1.0 - mean_val[1]))
    return y, y_val


def real_or_fake(prediction: int) -> str:
    """ref: model/pred_func.py:134-135."""
    return {0: "REAL", 1: "FAKE"}[int(prediction) ^ 1]


DEFAULT_VERDICT = (0, 0.5)  # zero-face fallback (ref prediction.py:250-253)
