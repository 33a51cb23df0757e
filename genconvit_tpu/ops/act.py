"""Activations with exact torch-default semantics.

torch nn.GELU default is the *erf* form (not tanh approx); jax.nn.gelu defaults
to the approximation — we pin approximate=False for parity.
torch nn.LeakyReLU default negative_slope=0.01 (ref VAE uses the default,
model/genconvit_vae.py:18-31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def swiglu(x: jax.Array) -> jax.Array:
    """SwiGLU gate: split the last axis in half, silu(a) * b.

    The reference *documents* a SwiGLU v2 head but never wires it
    (SURVEY.md §8 B12); this implements the documented intent for the
    opt-in research head (docs/genconvit_v2.md)."""
    a, b = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(a) * b
