"""Pooling ops (NHWC)."""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore[return-value]


def max_pool2d(x: jax.Array, kernel: IntOr2 = 2, stride: IntOr2 = 2) -> jax.Array:
    """MaxPool2d(k, s), VALID padding — matches the ED encoder's
    MaxPool2d(2,2) halvings 224->7 (ref: model/genconvit_ed.py:8-36)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N,C] mean pool (timm head global_pool equivalent)."""
    return jnp.mean(x, axis=(1, 2))
