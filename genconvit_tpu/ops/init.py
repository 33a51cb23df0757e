"""Parameter initializers reproducing torch layer defaults, so from-scratch
training matches the reference's initial conditions statistically.

torch Conv2d/ConvTranspose2d/Linear default: kaiming_uniform(a=sqrt(5)) on the
weight == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bound * sqrt(3)*gain... concretely
bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1/fan_in); bias U(-1/sqrt(fan_in), +).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _fast_init() -> bool:
    """GENCONVIT_FAST_INIT=1 draws from numpy's Philox instead of jax's
    threefry — same distributions, different (still deterministic-per-key)
    values. Threefry on a single CPU core needs ~90s for this model's 2.5GB
    of params; numpy does it in seconds. Used by bench.py, where random
    weights only exist to exercise the compute path."""
    return os.environ.get("GENCONVIT_FAST_INIT") == "1"


def _np_rng(key):
    return np.random.default_rng([int(w) for w in np.asarray(key).ravel()])


def _uniform(key, shape, bound):
    if _fast_init():
        # f32 bit-stream + in-place affine: avoids rng.uniform's f64 path
        # (~12x) AND extra GB-scale temporaries (first-touch page faults
        # dominate fresh multi-GB allocations on some hosts)
        u = _np_rng(key).random(shape, dtype=np.float32)
        u *= np.float32(2 * bound)
        u -= np.float32(bound)
        return u
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def conv_init(key, kh: int, kw: int, cin: int, cout: int, groups: int = 1) -> Dict[str, jax.Array]:
    """HWIO conv kernel + bias, torch Conv2d default init.
    fan_in = (cin/groups) * kh * kw."""
    kw_, kb = jax.random.split(key)
    fan_in = (cin // groups) * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": _uniform(kw_, (kh, kw, cin // groups, cout), bound),
        "bias": _uniform(kb, (cout,), bound),
    }


def conv_transpose_init(key, kh: int, kw: int, cin: int, cout: int) -> Dict[str, jax.Array]:
    """HWIO (forward-conv view) kernel + bias, torch ConvTranspose2d default.
    torch fan_in for ConvTranspose2d is cout * kh * kw (weight shape (Cin,Cout,kh,kw),
    fan_in computed on dim-1)."""
    kw_, kb = jax.random.split(key)
    fan_in = cout * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": _uniform(kw_, (kh, kw, cin, cout), bound),
        "bias": _uniform(kb, (cout,), bound),
    }


def linear_init(key, cin: int, cout: int) -> Dict[str, jax.Array]:
    kw_, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    return {
        "kernel": _uniform(kw_, (cin, cout), bound),
        "bias": _uniform(kb, (cout,), bound),
    }


def layer_norm_init(dim: int) -> Dict[str, jax.Array]:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def batch_norm_init(dim: int) -> Dict[str, jax.Array]:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def trunc_normal_init(key, shape: Tuple[int, ...], std: float = 0.02) -> jax.Array:
    """timm trunc_normal_(std=.02) equivalent (truncation at ±2σ)."""
    if _fast_init():
        # inverse-CDF truncated normal, identical distribution to jax's
        rng = _np_rng(key)
        from scipy.special import ndtr, ndtri  # baked in via jax deps

        lo, hi = ndtr(-2.0), ndtr(2.0)
        u = lo + (hi - lo) * rng.random(shape, dtype=np.float32)
        return (std * ndtri(u)).astype(np.float32)
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
