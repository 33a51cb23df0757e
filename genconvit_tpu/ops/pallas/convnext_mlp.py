"""Pallas TPU kernel: fused LayerNorm + MLP + layer-scale + residual.

The ConvNeXt block splits naturally by hardware affinity:
  * depthwise 7x7 — XLA's native conv emitter (VPU, register-tiled) beats a
    naive in-kernel tap loop by ~3x (tools/microbench_kernel_parts.py: the
    49-tap fp32 accumulator is VMEM-traffic bound at ~8.6ms standalone);
  * LN + fc1 + GELU + fc2 + gamma + residual — XLA materializes the 4C
    hidden tensor in HBM twice (578MB per stage-1 ensemble block) plus
    layout copies; here the hidden lives only in VMEM panels.

This kernel takes the dwconv output and the block input (residual), both
flattened to [R, C] rows, and processes row panels: per grid step —
    LN stats over the C lanes (fp32) -> affine -> fc1 (MXU) -> rational-erf
    GELU (approx reciprocal; error far below bf16 resolution) -> fc2 (MXU)
    -> layer-scale -> + residual.
HBM traffic per block = read dwout + read x + write out (3 tensors instead
of XLA's ~7 passes). Weights stay VMEM-resident across the grid.

Numerics match models/convnext._block's post-conv tail at bf16 resolution
(tests/test_pallas.py interpret-mode; tools/onchip_parity.py on-chip).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genconvit_tpu.ops.pallas.convnext_stage import _gelu_f32

_LN_EPS = 1e-6


def _mlp_kernel(dw_ref, x_ref, lns, lnb, w1, b1, w2, b2, gam, out_ref,
                *, c: int, interpret: bool):
    acc = dw_ref[...].astype(jnp.float32)  # [P, C]
    inv_c = jnp.float32(1.0 / c)
    mean = jnp.sum(acc, axis=-1, keepdims=True) * inv_c
    var = jnp.sum(jnp.square(acc), axis=-1, keepdims=True) * inv_c \
        - jnp.square(mean)
    y = (acc - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * lns[:].astype(jnp.float32) + lnb[:].astype(jnp.float32)
    dtype = out_ref.dtype
    hid = jnp.dot(y.astype(dtype), w1[:], preferred_element_type=jnp.float32)
    hid = _gelu_f32(hid + b1[:].astype(jnp.float32),
                    exact_div=interpret).astype(dtype)
    o = jnp.dot(hid, w2[:], preferred_element_type=jnp.float32)
    o = (o + b2[:].astype(jnp.float32)) * gam[:].astype(jnp.float32)
    out_ref[...] = (x_ref[...].astype(jnp.float32) + o).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ln_mlp_residual(dw: jax.Array, x: jax.Array, p: Dict,
                          interpret: bool = False) -> jax.Array:
    """dw = depthwise-conv output, x = block input (residual), both
    [N,H,W,C]; p = ConvNeXt block params (models/convnext.py layout).
    Returns the block output. Rows must tile into panels — N*H*W is a
    multiple of 8 for every ConvNeXt stage shape we run."""
    n, h, w, c = x.shape
    rows = n * h * w
    dw2 = dw.reshape(rows, c)
    x2 = x.reshape(rows, c)
    # panel rows: as large as the f32 hidden buffer allows (~6MB), to
    # amortize per-grid-step overhead; rows are padded up to a panel multiple
    # (Mosaic needs sublane-divisible blocks; pad rows are sliced off after
    # and their LN-of-zeros output is never read)
    hidden_dim = p["mlp"]["fc1"]["kernel"].shape[1]
    panel = max(512, min(8192, (6 * 2 ** 20) // (4 * hidden_dim) // 512 * 512))
    panel = min(panel, -(-rows // 8) * 8)
    pad_rows = -rows % panel
    if pad_rows:
        dw2 = jnp.pad(dw2, ((0, pad_rows), (0, 0)))
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
    rows_p = rows + pad_rows
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]
    dt = x.dtype
    kernel = functools.partial(_mlp_kernel, c=c, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(rows_p // panel,),
        in_specs=[
            pl.BlockSpec((panel, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((panel, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((panel, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * c * 2 * hidden,
            bytes_accessed=3 * rows * c * dt.itemsize
            + 2 * c * hidden * dt.itemsize,
            transcendentals=0,
        ),
    )(dw2, x2,
      p["norm"]["scale"], p["norm"]["bias"],
      p["mlp"]["fc1"]["kernel"].astype(dt), p["mlp"]["fc1"]["bias"],
      p["mlp"]["fc2"]["kernel"].astype(dt), p["mlp"]["fc2"]["bias"],
      p["gamma"])
    if pad_rows:
        out = out[:rows]
    return out.reshape(n, h, w, c)
