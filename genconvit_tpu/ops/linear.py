"""Dense layer. Kernel layout (in, out): y = x @ w + b.

Matmuls are emitted with fp32 accumulation (preferred_element_type) so bf16
inference keeps fp32 reductions on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)
