"""Pallas TPU kernel v2: fused ConvNeXt *stage* (a chain of blocks).

v1 (convnext_block.py) fuses one block; the stage tensor still makes an HBM
round trip per block and the channel axis is zero-padded to 128 lanes. This
kernel keeps an image slab resident in VMEM across ALL blocks of a stage:

    HBM traffic per stage = read x once + write y once
    (vs v1: 2 round trips per block, 3x padded, + per-block dispatch)

Per grid step (ipt images): for each block b —
    depthwise 7x7 (49 unrolled VPU FMAs, fp32 acc, halo from the padded slab)
    -> LayerNorm over the real C (lane sums / C)
    -> fc1 on the MXU -> rational-erf GELU (pl.reciprocal approx — error
       ~1e-5 relative, far below bf16 resolution)
    -> fc2 on the MXU -> layer-scale -> residual
    then the block output becomes the slab center for block b+1 (the halo
    ring stays zero, which IS the conv's zero padding — whole image in VMEM,
    so no inter-block halo exchange exists).

All block weights of the stage live in VMEM for the whole call (fits for
C in {96,192,384}; stage-4 at C=768 uses per-block calls from the caller if
VMEM pressure demands). No channel padding anywhere: C=96/192 tiles as a
masked 128-lane tile — same VPU cost, 25% less DMA and no trailing-lane
slice copy on the output.

Numerics match models/convnext._block chains at bf16 resolution
(tests/test_pallas.py interpret-mode; tools/onchip_parity.py on-chip).
Reference being replaced: timm ConvNeXt stages as consumed by ref
model/genconvit_ed.py:68 / model/genconvit_vae.py:97.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _gelu_f32(h, *, exact_div: bool = False):
    """hp-tier rational GELU (kept hp here: this kernel's parity tests pin
    the 8.7e-7 fit); shared implementation in ops/pallas/common.py."""
    from genconvit_tpu.ops.pallas.common import gelu_f32

    return gelu_f32(h, exact_div=exact_div, hp=True)


def _stage_kernel(x_hbm, dwk, dwb, lns, lnb, w1, b1, w2, b2, gam,
                  out_ref, slab, sem, *, n_blocks: int, h: int, w: int,
                  c: int, wp: int, ipt: int, interpret: bool):
    """slab: [2, ipt, h+6, wp, c] double-buffered input staging; the current
    slot doubles as the running padded activation across blocks."""
    n_steps = pl.num_programs(0)
    i = pl.program_id(0)

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * ipt, ipt)], slab.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2

    for b in range(n_blocks):
        cur = slab[slot]  # [ipt, h+6, wp, c]; halo ring is exact zeros
        # depthwise 7x7, fp32 accumulation (49 unrolled VPU FMAs)
        acc = jnp.broadcast_to(dwb[b].astype(jnp.float32), (ipt, h, w, c))
        for dy in range(7):
            for dx in range(7):
                tap = cur[:, dy:dy + h, dx:dx + w, :].astype(jnp.float32)
                acc = acc + tap * dwk[b, dy, dx].astype(jnp.float32)
        # LayerNorm over C (fp32)
        inv_c = jnp.float32(1.0 / c)
        mean = jnp.sum(acc, axis=-1, keepdims=True) * inv_c
        var = jnp.sum(jnp.square(acc), axis=-1, keepdims=True) * inv_c \
            - jnp.square(mean)
        y = (acc - mean) * jax.lax.rsqrt(var + _LN_EPS)
        y = y * lns[b].astype(jnp.float32) + lnb[b].astype(jnp.float32)
        # MLP on the MXU, GELU between
        dtype = out_ref.dtype
        y2 = y.reshape(ipt * h * w, c).astype(dtype)
        hid = jnp.dot(y2, w1[b], preferred_element_type=jnp.float32)
        hid = _gelu_f32(hid + b1[b].astype(jnp.float32),
                        exact_div=interpret).astype(dtype)
        o = jnp.dot(hid, w2[b], preferred_element_type=jnp.float32)
        o = (o + b2[b].astype(jnp.float32)).reshape(ipt, h, w, c)
        o = o * gam[b].astype(jnp.float32)
        res = cur[:, 3:3 + h, 3:3 + w, :].astype(jnp.float32)
        new = (res + o).astype(dtype)
        if b + 1 < n_blocks:
            slab[slot, :, 3:3 + h, 3:3 + w, :] = new  # feed the next block
        else:
            out_ref[...] = new


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convnext_stage(x: jax.Array, blocks: List[Dict],
                         interpret: bool = False) -> jax.Array:
    """x: [N,H,W,C] bf16; blocks: list of ConvNeXt block param dicts
    (models/convnext.py layout). Applies every block in sequence with the
    stage tensor resident in VMEM. Drop-in for a chain of _block calls."""
    n, h, w, c = x.shape
    nb = len(blocks)
    wp = w + 6 + (-(w + 6) % 8)          # sublane-aligned padded width
    # images per step: keep the MXU panel >= ~1.5k rows for small maps while
    # bounding slab VMEM (double-buffered)
    ipt = 1 if h >= 56 else (2 if h == 28 else (4 if h == 14 else 16))
    while n % ipt:
        ipt //= 2
    x_pad = jnp.pad(x, ((0, 0), (3, 3), (3, wp - w - 3), (0, 0)))

    def stack(fn):
        return jnp.stack([fn(p) for p in blocks])

    dt = x.dtype
    args = (
        x_pad,
        stack(lambda p: p["conv_dw"]["kernel"][:, :, 0, :].astype(dt)),
        stack(lambda p: p["conv_dw"]["bias"]),
        stack(lambda p: p["norm"]["scale"]),
        stack(lambda p: p["norm"]["bias"]),
        stack(lambda p: p["mlp"]["fc1"]["kernel"].astype(dt)),
        stack(lambda p: p["mlp"]["fc1"]["bias"]),
        stack(lambda p: p["mlp"]["fc2"]["kernel"].astype(dt)),
        stack(lambda p: p["mlp"]["fc2"]["bias"]),
        stack(lambda p: p["gamma"]),
    )
    hidden = blocks[0]["mlp"]["fc1"]["kernel"].shape[1]
    kernel = functools.partial(_stage_kernel, n_blocks=nb, h=h, w=w, c=c,
                               wp=wp, ipt=ipt, interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid=(n // ipt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec((ipt, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ipt, h + 6, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n * h * w * c * (49 + 2 * hidden),
            bytes_accessed=2 * n * h * w * c * x.dtype.itemsize
            + 2 * nb * c * hidden * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)
