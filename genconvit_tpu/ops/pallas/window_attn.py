"""Pallas TPU kernel: Swin windowed attention.

Windows are independent (SURVEY.md §5: "windows are independent ->
embarrassingly parallel on the MXU"), so the grid tiles the flattened
(batch x windows x heads) axis and each step runs the full 49-token
attention for a tile of window-heads: scores = qk^T * scale + relative bias
(+ shift mask), softmax, @v — all in one VMEM residency instead of four
HBM-materialized tensors on the XLA path.

L=49 and head_dim=32 are tiny against the (8,128) tile, so the kernel's win
is fusion/bandwidth, not MXU occupancy; qkv/proj projections stay outside as
plain matmuls (already optimal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                 *, scale: float, heads: int, windows_per_mask: int):
    # blocks: q/k/v [T, L, hd]; bias [heads, L, L]; mask [nW, L, L]
    t, l, hd = q_ref.shape
    g0 = pl.program_id(0) * t  # global window-head offset of this tile
    for i in range(t):  # unrolled: tiny L makes batched dots unavailable
        q = q_ref[i].astype(jnp.float32) * scale
        k = k_ref[i].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [L, L]
        head = (g0 + i) % heads
        s = s + bias_ref[head].astype(jnp.float32)
        if mask_ref is not None:
            win = ((g0 + i) // heads) % windows_per_mask
            s = s + mask_ref[win].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[i] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "windows_per_mask", "interpret"))
def window_attention_pallas(q, k, v, bias, mask=None, *, heads: int,
                            windows_per_mask: int = 1,
                            interpret: bool = False):
    """q/k/v: [G, L, hd] where G = batch*windows*heads, ordered so that the
    head index is the fastest axis and the window index next (matching
    models/swin layout after reshape). bias: [heads, L, L]. mask: [nW, L, L]
    or None. Returns [G, L, hd]."""
    g, l, hd = q.shape
    tile = 8
    while g % tile:
        tile //= 2
    kernel = functools.partial(_attn_kernel, scale=hd ** -0.5, heads=heads,
                               windows_per_mask=windows_per_mask)
    qkv_spec = pl.BlockSpec((tile, l, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(mask)
    else:
        kernel = functools.partial(_attn_kernel_nomask, scale=hd ** -0.5,
                                   heads=heads)
    return pl.pallas_call(
        kernel,
        grid=(g // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, l, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, l, hd), q.dtype),
        interpret=interpret,
    )(*args)


def _attn_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, out_ref,
                        *, scale: float, heads: int):
    _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref, scale=scale,
                 heads=heads, windows_per_mask=1)
