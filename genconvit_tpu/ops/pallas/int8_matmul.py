"""Pallas TPU kernel: weight-only int8 matmul for the giant VAE latent head.

The mu head is [25088, 12544] — 630MB as bf16 — consumed by a 120-row
activation matrix per ensemble launch, so the matmul is pure weight-read
bandwidth (~0.84ms at bf16, tools/profile_forward.py). Storing the weight
int8 with per-output-column scales halves the read to ~0.42ms; the
activations stay VMEM-resident across the whole grid while weight column
tiles stream through double-buffered blocks and dequantize on the VPU.

Quantization: per-column absmax/127 symmetric (core/quant-free: computed at
engine load, models/vae.py quantize_latent_heads_int8). Column-scale
symmetric int8 keeps the matmul exact in the scale factor:
(x @ Wq) * s == x @ (Wq * s). Opt-in via GENCONVIT_INT8_HEADS=1 — the
weight rounding is ~0.4% relative per column max, the same order as the
bf16 cast the default path already applies, but a documented deviation.

Ref being replaced: the fp16/fp32 `mu` Linear at model/genconvit_vae.py:37.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, s_ref, b_ref, out_ref):
    w = wq_ref[...].astype(jnp.bfloat16)
    z = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    out_ref[...] = (z * s_ref[0, :] + b_ref[0, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_wint8(x: jax.Array, wq: jax.Array, scale: jax.Array,
                 bias: jax.Array, interpret: bool = False) -> jax.Array:
    """x: [M, K] (bf16/f32); wq: [K, N] int8; scale, bias: [N] f32.
    Returns x @ (wq * scale) + bias in x.dtype. M must be small enough for
    the activations to sit whole in VMEM (M*K*2 bytes; the engine's use is
    M = V*F = 120-240)."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (k, k2)
    # largest multiple-of-128 divisor of n whose int8 weight tile stays
    # ~<=24MB (two live buffers under the raised VMEM cap); n=12544 -> 896
    budget = 24 * 2 ** 20
    n_tile = next((d for d in range(min(n, budget // k) // 128 * 128, 0, -128)
                   if n % d == 0), 0)
    if n_tile == 0:
        n_tile = n  # tiny heads (tests): single step
    assert n % n_tile == 0, (n, n_tile)
    xb = x.astype(jnp.bfloat16) if x.dtype != jnp.bfloat16 else x
    out = pl.pallas_call(
        _kernel,
        grid=(n // n_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # x whole
            pl.BlockSpec((k, n_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # scale/bias as [1, N]: 1-D operands tile at 1024 elements on
            # TPU, which 128-lane column tiles can't divide
            pl.BlockSpec((1, n_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
    )(xb, wq, scale.astype(jnp.float32).reshape(1, n),
      bias.astype(jnp.float32).reshape(1, n))
    return out


def quantize_wint8(w, axis: int = 0):
    """Symmetric per-column (axis=0 reduces rows) int8 quantization.
    Returns (wq int8, scale f32) with w ~= wq * scale."""
    import numpy as np

    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=axis, keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale.reshape(-1)
