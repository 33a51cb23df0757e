"""Pallas TPU kernel: fully fused ConvNeXt block.

One kernel = depthwise 7x7 conv + bias -> LayerNorm(C) -> MLP (fc1, exact
GELU, fc2) -> layer-scale gamma -> residual add. The XLA path materializes
the stage tensor in HBM between each of those ops; fusing keeps an
image-sized slab resident in VMEM so the stage tensor is read once and
written once per block, and the MLP matmuls see [H*W, C] panels on the MXU.

Grid: one step per batch image, with the next image's slab DMA double-
buffered behind the current step's compute. The input is pre-padded by 3 on
H, W (W rounded so the slab's sublane dim is 8-aligned) and C zero-padded to
a lane multiple of 128 — Mosaic requires aligned HBM slice DMAs. Zero channel
padding stays exact end-to-end: padded lanes carry zeros through the conv
(zero taps), the LN (moments divide by the real C), the MLP (zero rows/cols),
gamma and the residual. The 49 depthwise taps unroll into VPU FMAs with fp32
accumulation.

Numerics match models/convnext._block (parity-tested in tests/test_pallas.py
in interpret mode and on-chip).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _erf(x):
    """Rational erf z*P(z^2)/Q(z^2) (ops/act._erf_rational_f32; |err|<=8.7e-7,
    far below bf16 resolution): Mosaic has no erf lowering, and the previous
    Abramowitz-Stegun form burned an exp per element on the VPU."""
    from genconvit_tpu.ops.act import _erf_rational_f32

    return _erf_rational_f32(x)


def _block_kernel(x_pad_hbm, w_dw, b_dw, ln_scale, ln_bias,
                  w1, b1, w2, b2, gamma, out_ref, slab, sem,
                  *, h_out: int, w_out: int, c_real: int, ipt: int):
    """ipt = images per grid step: 1 for large feature maps (the slab is an
    image), >1 for small ones (amortizes per-step overhead and feeds the MXU
    [ipt*H*W, C] panels)."""
    n_steps = pl.num_programs(0)
    i = pl.program_id(0)
    _, _, _, _, c_pad = slab.shape

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_pad_hbm.at[pl.ds(step * ipt, ipt)], slab.at[slot], sem.at[slot])

    # double buffering: step i computes slot i%2 while i+1 streams into the
    # other slot (warm-up starts slot 0 at step 0)
    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    cur = slab[i % 2]  # [ipt, h+6, w_pad, c_pad]

    # depthwise 7x7, fp32 accumulation on the VPU (49 unrolled FMAs)
    acc = jnp.broadcast_to(b_dw[:].astype(jnp.float32),
                           (ipt, h_out, w_out, c_pad))
    for dy in range(7):
        for dx in range(7):
            tap = cur[:, dy:dy + h_out, dx:dx + w_out, :].astype(jnp.float32)
            acc = acc + tap * w_dw[dy, dx, :].astype(jnp.float32)

    # LayerNorm over the real C via moments: padded lanes hold exact zeros,
    # so plain lane-sums divided by c_real give the true mean/variance.
    inv_c = 1.0 / c_real
    mean = jnp.sum(acc, axis=-1, keepdims=True) * inv_c
    var = jnp.sum(jnp.square(acc), axis=-1, keepdims=True) * inv_c - jnp.square(mean)
    y = (acc - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * ln_scale[:].astype(jnp.float32) + ln_bias[:].astype(jnp.float32)

    # MLP on the MXU: [ipt*H*W, C] @ [C, 4C] -> GELU -> @ [4C, C]
    dtype = out_ref.dtype
    y2 = y.reshape(ipt * h_out * w_out, c_pad).astype(dtype)
    h = jnp.dot(y2, w1[:], preferred_element_type=jnp.float32)
    h = h + b1[:].astype(jnp.float32)
    h = (0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))).astype(dtype)
    o = jnp.dot(h, w2[:], preferred_element_type=jnp.float32)
    o = o + b2[:].astype(jnp.float32)
    o = o.reshape(ipt, h_out, w_out, c_pad) * gamma[:].astype(jnp.float32)

    residual = cur[:, 3:3 + h_out, 3:3 + w_out, :].astype(jnp.float32)
    out_ref[...] = (residual + o).astype(dtype)


def _pad_last(arr: jax.Array, target: int, axis: int = -1) -> jax.Array:
    pad = target - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis % arr.ndim] = (0, pad)
    return jnp.pad(arr, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convnext_block(x: jax.Array, p: Dict, interpret: bool = False) -> jax.Array:
    """x: [N,H,W,C]; p: ConvNeXt block param dict (models/convnext.py layout).
    Drop-in replacement for models.convnext._block."""
    n, h, w, c = x.shape
    c_pad = -(-c // 128) * 128               # lane alignment for the slab DMA
    w_pad_total = (-(w + 6) % 8) + 6         # sublane alignment (left pad 3)
    # small feature maps batch several images per grid step
    ipt = 1 if h >= 28 else (4 if h == 14 else 8)
    while n % ipt:
        ipt //= 2
    x_pad = jnp.pad(x, ((0, 0), (3, 3), (3, w_pad_total - 3), (0, c_pad - c)))
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]

    w_dw = _pad_last(p["conv_dw"]["kernel"][:, :, 0, :], c_pad).astype(x.dtype)
    args = (
        x_pad,
        w_dw,
        _pad_last(p["conv_dw"]["bias"], c_pad),
        _pad_last(p["norm"]["scale"], c_pad),
        _pad_last(p["norm"]["bias"], c_pad),
        _pad_last(p["mlp"]["fc1"]["kernel"], c_pad, axis=0).astype(x.dtype),
        p["mlp"]["fc1"]["bias"],
        _pad_last(p["mlp"]["fc2"]["kernel"], c_pad, axis=1).astype(x.dtype),
        _pad_last(p["mlp"]["fc2"]["bias"], c_pad),
        _pad_last(p["gamma"], c_pad),
    )

    kernel = functools.partial(_block_kernel, h_out=h, w_out=w, c_real=c,
                               ipt=ipt)
    out = pl.pallas_call(
        kernel,
        grid=(n // ipt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec((ipt, h, w, c_pad), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ipt, h + 6, w + w_pad_total, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * c_pad * (49 + 2 * hidden),
            bytes_accessed=2 * n * h * w * c_pad * x.dtype.itemsize
            + 2 * c_pad * hidden * x.dtype.itemsize,
            transcendentals=n * h * w * hidden,
        ),
    )(*args)
    return out[..., :c]
