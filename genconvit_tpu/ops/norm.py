"""Normalization ops.

LayerNorm over the trailing (channel) axis — used by ConvNeXt/Swin (NHWC makes
the reference's per-block NCHW<->NHWC permutes free) — and BatchNorm with the
torch semantics used by the VAE encoder (ref: model/genconvit_vae.py:16-31).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm over the last axis (timm ConvNeXt/Swin use eps=1e-6/1e-5;
    callers pass the right eps). Statistics in fp32 for bf16 stability."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def batch_norm(
    x: jax.Array,
    params: Dict[str, jax.Array],
    *,
    train: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """BatchNorm2d over NHWC with torch semantics.

    params: {'scale','bias','mean','var'} (mean/var are running stats).
    Eval: normalize with running stats; returns (y, None).
    Train: normalize with batch stats; returns (y, updated running stats)
    using torch's running update (unbiased var, momentum=0.1).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if train:
        axes = (0, 1, 2)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.mean(jnp.square(x32 - mean), axis=axes)  # biased, for normalization
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * params["mean"] + momentum * mean,
            "var": (1 - momentum) * params["var"] + momentum * unbiased,
        }
    else:
        mean = params["mean"].astype(jnp.float32)
        var = params["var"].astype(jnp.float32)
        new_stats = None
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype), new_stats
