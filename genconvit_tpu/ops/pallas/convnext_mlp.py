"""Pallas TPU kernel: fused LayerNorm + MLP + layer-scale + residual.

The ConvNeXt block splits naturally by hardware affinity:
  * depthwise 7x7 — XLA's native conv emitter (VPU, register-tiled) beats a
    naive in-kernel tap loop by ~3x (tools/microbench_kernel_parts.py: the
    49-tap fp32 accumulator is VMEM-traffic bound at ~8.6ms standalone);
  * LN + fc1 + GELU + fc2 + gamma + residual — XLA materializes the 4C
    hidden tensor in HBM twice (578MB per stage-1 ensemble block) plus
    layout copies; here the hidden lives only in VMEM panels.

This kernel takes the dwconv output and the block input (residual), both
flattened to [R, C] rows, and processes row panels. v2 design notes
(tools/microbench_mlp_tail.py drove each choice):
  * LN statistics via VPU lane reductions (skinny MXU `acc @ ones[C,1]`
    dots were tried and measured slower — N=1 runs the MXU at 1/128
    utilization);
  * the LN affine folds into fc1 on the host (wg = gamma_ln * W1 rows,
    bw = beta @ W1 + b1) and layer-scale into fc2 (w2g = W2 * gamma_ls,
    b2g = b2 * gamma_ls) — zero in-kernel cost for either;
  * default-tier rational GELU (ops/pallas/common.py) — the GELU pass over
    the 4C-wide hidden is the kernel's largest VPU phase;
  * panels sized so the fp32 hidden stays ~16MB (large panels amortize
    per-step overhead; Mosaic double-buffers the dw/x/out streams).
HBM traffic per block = read dwout + read x + write out (3 tensors instead
of XLA's ~7 passes). Weights stay VMEM-resident across the grid. Lane-
aligned C (multiples of 128) DMAs densely; C=96/192 works but pays strided
DMA — the model-side integration pads those stages (models/convnext.py).

W8A8 variant (KernelPlan.int8_mlp / GENCONVIT_INT8_MLP=1): both MLP matmuls
run int8xint8->int32 on the MXU (2x its bf16 rate on v5e). Weights quantize
per output column in the traced fold (_quant_cols_np); the normalized
activations and the GELU'd hidden quantize per ROW in-kernel (_quant_rows) —
LN makes the rows well-conditioned, so symmetric absmax/127 keeps the error
at int8 resolution (~0.4% of each row/column max, measured ~0.3% of the
block-output scale end-to-end; tests/test_kernel_plan.py, on-chip
tools/onchip_parity.py). Documented numerics deviation, opt-in.

Numerics match models/convnext._block's post-conv tail at bf16 resolution
(tests/test_pallas.py interpret-mode; tools/onchip_parity.py on-chip).
Reference being replaced: timm ConvNeXt block MLPs as consumed by ref
model/genconvit_ed.py:68 / model/genconvit_vae.py:97.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genconvit_tpu.ops.pallas.common import gelu_f32

_LN_EPS = 1e-6


def _row_moments(v32, c: int):
    """(mean, rsqrt(var+eps)) over the lane axis with a real-C divisor.
    VPU lane reductions. (MXU `v @ ones[C,1]` dots were tried and measured
    SLOWER — N=1 runs the MXU at 1/128 utilization, ~4.4us per dot per
    panel vs ~3us for both log-shuffle reduces.) When the caller channel-
    pads, pad lanes are exactly zero, so plain lane sums with the real-C
    divisor stay exact — no mask needed."""
    s1 = jnp.sum(v32, axis=-1, keepdims=True)
    s2 = jnp.sum(v32 * v32, axis=-1, keepdims=True)
    inv_c = jnp.float32(1.0 / c)
    mean = s1 * inv_c                       # [P, 1]
    var = s2 * inv_c - mean * mean
    return mean, jax.lax.rsqrt(var + _LN_EPS)


def _mlp_kernel(dw_ref, x_ref, wg_ref, bw_ref, w2g_ref, b2g_ref,
                out_ref, *, c: int, interpret: bool, hp: bool = False,
                split: int = 1):
    """split>1 processes the panel as `split` independent row slices — their
    DAGs share no data, giving Mosaic's scheduler the freedom to overlap one
    slice's MXU matmuls with another's VPU phases (stats/GELU)."""
    dtype = out_ref.dtype
    rows = dw_ref.shape[0] // split
    for s in range(split):
        sl = pl.ds(s * rows, rows)
        acc = dw_ref[sl, :].astype(jnp.float32)  # [P/split, C]
        mean, inv = _row_moments(acc, c)
        y = ((acc - mean) * inv).astype(dtype)  # LN affine folded into wg/bw
        z = jnp.dot(y, wg_ref[:], preferred_element_type=jnp.float32) \
            + bw_ref[:]
        h = gelu_f32(z, exact_div=interpret, newton=hp,
                     hp=hp).astype(dtype)
        o = jnp.dot(h, w2g_ref[:], preferred_element_type=jnp.float32) \
            + b2g_ref[:]
        out_ref[sl, :] = x_ref[sl, :] + o.astype(dtype)


def _quant_rows(v32):
    """Symmetric per-row int8 quantization of an f32 panel: returns
    (q int8, scale [P,1] f32) with v32 ~= q * scale. Exact divides (the
    approx reciprocal's ~6e-5 relative error could push a row max past
    127.5 and wrap the int8 cast); the clip is wrap-proofing."""
    amax = jnp.maximum(jnp.max(jnp.abs(v32), axis=-1, keepdims=True),
                       jnp.float32(1e-30))
    scale = amax * jnp.float32(1.0 / 127.0)
    q = jnp.clip(jnp.round(v32 * (jnp.float32(127.0) / amax)),
                 -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _mlp_int8_core(y, wq1_ref, s1_ref, bw_ref, wq2_ref, s2_ref, b2g_ref,
                   *, c: int, interpret: bool, hp: bool):
    """W8A8 MLP on a normalized f32 panel y [P, C]: per-row activation
    scales x per-column weight scales keep both matmuls exact in the scale
    factors; the int8 dots run the MXU at 2x its bf16 rate. Returns the f32
    block update (pre-residual). Pad lanes of y must already be zero."""
    yq, sa = _quant_rows(y)
    z = jnp.dot(yq, wq1_ref[:], preferred_element_type=jnp.int32)
    zf = z.astype(jnp.float32) * sa * s1_ref[:] + bw_ref[:]
    h = gelu_f32(zf, exact_div=interpret, newton=hp, hp=hp)
    hq, sb = _quant_rows(h)
    o = jnp.dot(hq, wq2_ref[:], preferred_element_type=jnp.int32)
    return o.astype(jnp.float32) * sb * s2_ref[:] + b2g_ref[:]


def _ln_masked(dw_ref, *, c: int, lanes: int):
    """LayerNorm a panel over its real-C lanes; pad lanes are returned as
    exact zeros (the bf16 kernels rely on zero weight rows to annihilate
    pad-lane garbage, but the int8 path's per-row absmax would read it)."""
    acc = dw_ref[...].astype(jnp.float32)
    mean, inv = _row_moments(acc, c)
    y = (acc - mean) * inv
    if c != lanes:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
        y = jnp.where(lane < c, y, 0.0)
    return y


def _mlp_kernel_int8(dw_ref, x_ref, wq1_ref, s1_ref, bw_ref, wq2_ref,
                     s2_ref, b2g_ref, out_ref, *, c: int, interpret: bool,
                     hp: bool = False):
    y = _ln_masked(dw_ref, c=c, lanes=dw_ref.shape[-1])
    o = _mlp_int8_core(y, wq1_ref, s1_ref, bw_ref, wq2_ref, s2_ref, b2g_ref,
                       c=c, interpret=interpret, hp=hp)
    out_ref[...] = x_ref[...] + o.astype(out_ref.dtype)


def _mlp_kernel_post_ln_int8(dw_ref, x_ref, wq1_ref, s1_ref, bw_ref,
                             wq2_ref, s2_ref, b2g_ref, lns2_ref, lnb2_ref,
                             out_ref, *, c: int, interpret: bool,
                             hp: bool = False):
    y = _ln_masked(dw_ref, c=c, lanes=dw_ref.shape[-1])
    o = _mlp_int8_core(y, wq1_ref, s1_ref, bw_ref, wq2_ref, s2_ref, b2g_ref,
                       c=c, interpret=interpret, hp=hp)
    out = x_ref[...].astype(jnp.float32) + o
    m2, inv2 = _row_moments(out, c)
    ln = (out - m2) * inv2 * lns2_ref[:] + lnb2_ref[:]
    out_ref[...] = ln.astype(out_ref.dtype)


_FIXED_ACT_CLIP = 8.0  # int8 clip point in LN-sigmas for the 'fc1' mode


def _mlp_int8_fc1_core(y, wq1_ref, s1_ref, bw_ref, w2g_ref, b2g_ref,
                       *, c: int, interpret: bool, hp: bool):
    """fc1-only int8 with a FIXED activation scale: LayerNorm makes every
    row of y exactly unit-variance, so clipping at _FIXED_ACT_CLIP sigmas
    gives a compile-time quant scale — quantization is round+clip+cast
    (no absmax reduce) and the dequant constant is pre-folded into the
    weight scales (s1 = colmax/127 * clip/127 at the call site). fc2 stays
    bf16 (its GELU-output operand has no free distribution bound — see
    KernelPlan.int8_mlp)."""
    k = jnp.float32(127.0 / _FIXED_ACT_CLIP)
    yq = jnp.clip(jnp.round(y * k), -127.0, 127.0).astype(jnp.int8)
    z = jnp.dot(yq, wq1_ref[:], preferred_element_type=jnp.int32)
    zf = z.astype(jnp.float32) * s1_ref[:] + bw_ref[:]
    h = gelu_f32(zf, exact_div=interpret, newton=hp, hp=hp)
    o = jnp.dot(h.astype(w2g_ref.dtype), w2g_ref[:],
                preferred_element_type=jnp.float32)
    return o + b2g_ref[:]


def _ln_plain(dw_ref, c: int):
    # no pad-lane masking: unlike 'full' int8 there is no absmax to poison —
    # pad-lane garbage times the zero wq1 rows contributes exactly 0
    acc = dw_ref[...].astype(jnp.float32)
    mean, inv = _row_moments(acc, c)
    return (acc - mean) * inv


def _mlp_kernel_int8_fc1(dw_ref, x_ref, wq1_ref, s1_ref, bw_ref, w2g_ref,
                         b2g_ref, out_ref, *, c: int, interpret: bool,
                         hp: bool = False):
    y = _ln_plain(dw_ref, c)
    o = _mlp_int8_fc1_core(y, wq1_ref, s1_ref, bw_ref, w2g_ref, b2g_ref,
                           c=c, interpret=interpret, hp=hp)
    out_ref[...] = x_ref[...] + o.astype(out_ref.dtype)


def _mlp_kernel_post_ln_int8_fc1(dw_ref, x_ref, wq1_ref, s1_ref, bw_ref,
                                 w2g_ref, b2g_ref, lns2_ref, lnb2_ref,
                                 out_ref, *, c: int, interpret: bool,
                                 hp: bool = False):
    y = _ln_plain(dw_ref, c)
    o = _mlp_int8_fc1_core(y, wq1_ref, s1_ref, bw_ref, w2g_ref, b2g_ref,
                           c=c, interpret=interpret, hp=hp)
    out = x_ref[...].astype(jnp.float32) + o
    m2, inv2 = _row_moments(out, c)
    ln = (out - m2) * inv2 * lns2_ref[:] + lnb2_ref[:]
    out_ref[...] = ln.astype(out_ref.dtype)


def _quant_cols_np(w32):
    """Traced symmetric per-output-column int8 quantization of a folded
    weight (f32 [K, N] -> wq int8, scale [N]); zero columns (channel pads)
    get scale 1 so their quantized weights are exact zeros."""
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _mlp_kernel_post_ln(dw_ref, x_ref, wg_ref, bw_ref, w2g_ref, b2g_ref,
                        lns2_ref, lnb2_ref, out_ref, *, c: int,
                        interpret: bool, hp: bool = False):
    """_mlp_kernel + a fused LayerNorm on the block OUTPUT (the next
    stage's downsample norm): lets the padded/transposed backbone feed the
    downsample conv directly, with no standalone masked-LN op for XLA to
    mis-fuse (ops cost ~2 extra reduces per panel vs the ~1ms/stage
    convert+relayout chain it replaces)."""
    acc = dw_ref[...].astype(jnp.float32)
    mean, inv = _row_moments(acc, c)
    dtype = out_ref.dtype
    y = ((acc - mean) * inv).astype(dtype)
    z = jnp.dot(y, wg_ref[:], preferred_element_type=jnp.float32) \
        + bw_ref[:]
    h = gelu_f32(z, exact_div=interpret, newton=hp, hp=hp).astype(dtype)
    o = jnp.dot(h, w2g_ref[:], preferred_element_type=jnp.float32) \
        + b2g_ref[:]
    out = x_ref[...].astype(jnp.float32) + o
    m2, inv2 = _row_moments(out, c)
    ln = (out - m2) * inv2 * lns2_ref[:] + lnb2_ref[:]
    out_ref[...] = ln.astype(dtype)


def _ln_rows_kernel(x_ref, s_ref, b_ref, out_ref, *, c: int):
    v = x_ref[...].astype(jnp.float32)
    mean, inv = _row_moments(v, c)
    out_ref[...] = ((v - mean) * inv * s_ref[:] + b_ref[:]).astype(out_ref.dtype)


def _pick_panel(rows: int, hidden_f32_cols: int, budget_mb: int = 8,
                mult: int = 8):
    """Largest multiple-of-`mult` divisor of rows under the VMEM budget;
    falls back to (cap, pad_rows) when no divisor exists (see
    fused_ln_mlp_residual docstring — non-divisor panels cost pad+slice
    copies). mult=32 for the int8 path (int8 sublane tile is 32)."""
    cap = max(512, min(8192,
                       (budget_mb * 2 ** 20) // (4 * hidden_f32_cols) // 512 * 512))
    cap = min(cap, -(-rows // mult) * mult)
    panel = next((d for d in range(cap, 511, -mult) if rows % d == 0), 0)
    if panel:
        return panel, 0
    return cap, -rows % cap


@functools.partial(jax.jit, static_argnames=("interpret", "real_c"))
def layer_norm_rows(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    real_c: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """Row-wise LayerNorm over the last axis as a Pallas kernel: [..., C]
    with moments over real_c (pad lanes exactly zero, zero-padded affine
    pins them back to zero — same contract as fused_ln_mlp_residual).
    Used for the stem LN of the kernel backbone (models/convnext.py); the
    XLA masked-LN emission costs ~0.9ms/launch in f32 reduce fusions."""
    shape = x.shape
    c = shape[-1]
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    rows = 1
    for d in shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)
    panel, pad_rows = _pick_panel(rows, c)
    if pad_rows:
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
    rc = real_c if real_c is not None else c
    out = pl.pallas_call(
        functools.partial(_ln_rows_kernel, c=rc),
        grid=((rows + pad_rows) // panel,),
        in_specs=[
            pl.BlockSpec((panel, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((panel, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad_rows, c), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * c, bytes_accessed=2 * rows * c * x.dtype.itemsize,
            transcendentals=0),
    )(x2, scale.astype(jnp.float32), bias.astype(jnp.float32))
    if pad_rows:
        out = out[:rows]
    return out.reshape(shape)


def fused_ln_mlp_residual(dw: jax.Array, x: jax.Array, p: Dict,
                          interpret: bool = False,
                          real_c: int | None = None,
                          post_ln: tuple | None = None,
                          panel_mb: int | None = None,
                          split: int | None = None,
                          hp: bool | None = None,
                          int8: str | bool | None = None) -> jax.Array:
    """Plan-resolving wrapper around the jitted kernel: the panel budget,
    split factor, GELU tier, and W8A8 mode default to the active KernelPlan
    (ops/kernel_plan.py) and are passed to the inner jit as STATIC args, so
    they participate in its cache key — flipping a knob between traces can
    no longer silently serve the first-traced variant."""
    from genconvit_tpu.ops.kernel_plan import current_plan

    plan = current_plan()
    if panel_mb is None:
        panel_mb = plan.mlp_panel_mb
    if split is None:
        split = plan.mlp_split
    if hp is None:
        hp = plan.gelu == "hp"
    if int8 is None:
        int8 = plan.int8_mlp
    return _fused_ln_mlp_residual(dw, x, p, interpret=interpret,
                                  real_c=real_c, post_ln=post_ln,
                                  panel_mb=panel_mb, split=split, hp=hp,
                                  int8=int8)


@functools.partial(jax.jit, static_argnames=("interpret", "real_c",
                                             "panel_mb", "split", "hp",
                                             "int8"))
def _fused_ln_mlp_residual(dw: jax.Array, x: jax.Array, p: Dict,
                           interpret: bool = False,
                           real_c: int | None = None,
                           post_ln: tuple | None = None,
                           panel_mb: int = 8,
                           split: int = 1,
                           hp: bool = False,
                           int8: str | bool = "") -> jax.Array:
    """dw = depthwise-conv output, x = block input (residual), both
    [N,H,W,C]; p = ConvNeXt block params (models/convnext.py layout).
    Returns the block output. Rows must tile into panels — N*H*W is a
    multiple of 8 for every ConvNeXt stage shape we run.

    real_c: when the caller zero-pads the channel axis to a lane multiple
    (models/convnext.py pads stage 1/2 to 128/256 for dense DMAs), pass the
    true channel count. Pad lanes of dw are exactly zero (zero dw kernel +
    bias), so plain lane sums with the real-C divisor keep the moments
    exact; pad lanes of the normalized panel hold garbage ((0-mean)*inv)
    but are annihilated by the zero rows/cols the caller's padded fc1/fc2
    weights carry, and the padded residual keeps the output's pad lanes at
    exactly zero."""
    n, h, w, c = x.shape
    if not interpret and jax.default_backend() != "tpu":
        # CPU (tests of the integration wrappers): Mosaic can't lower —
        # fall back to interpret mode transparently
        interpret = True
    rows = n * h * w
    dw2 = dw.reshape(rows, c)
    x2 = x.reshape(rows, c)
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]
    # panel rows: keep the f32 hidden panel ~8MB (scoped-VMEM headroom for
    # the bf16 copy + in/out streams under the raised 64MB cap), and prefer
    # an EXACT divisor of rows — a non-divisor panel forces pad+slice copies
    # around the custom call (~0.6ms each at stage-1 ensemble size when XLA
    # can't fuse them away). panel_mb (KernelPlan.mlp_panel_mb /
    # GENCONVIT_MLP_PANEL) overrides the budget for tuning
    # (tools/microbench_mlp_tail.py; sweep showed a flat optimum 4-16MB,
    # so divisibility dominates).
    panel, pad_rows = _pick_panel(rows, hidden, panel_mb,
                                  mult=32 if int8 else 8)
    if pad_rows:
        dw2 = jnp.pad(dw2, ((0, pad_rows), (0, 0)))
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
    rows_p = rows + pad_rows
    dt = x.dtype

    # host-side folds (jit-cached alongside the kernel)
    lns = p["norm"]["scale"].astype(jnp.float32)
    lnb = p["norm"]["bias"].astype(jnp.float32)
    w1 = p["mlp"]["fc1"]["kernel"].astype(jnp.float32)
    gam = p["gamma"].astype(jnp.float32)
    wg32 = lns[:, None] * w1                              # [C, 4C]
    bw = lnb @ w1 + p["mlp"]["fc1"]["bias"].astype(jnp.float32)  # [4C]
    w2g32 = (p["mlp"]["fc2"]["kernel"].astype(jnp.float32)
             * gam[None, :])                               # [4C, C]
    b2g = p["mlp"]["fc2"]["bias"].astype(jnp.float32) * gam      # [C]
    rc = real_c if real_c is not None else c

    if int8 == "fc1":
        # int8 fc1 with fixed activation scale: the act dequant constant
        # (clip/127) folds into the per-column weight scales — zero
        # in-kernel dequant cost (see _mlp_int8_fc1_core)
        wq1, s1 = _quant_cols_np(wg32)
        s1 = s1 * (_FIXED_ACT_CLIP / 127.0)
        operands = (wq1, s1, bw, w2g32.astype(dt), b2g)
        extra = ()
        if post_ln is not None:
            kernel = functools.partial(_mlp_kernel_post_ln_int8_fc1, c=rc,
                                       interpret=interpret, hp=hp)
            lns2, lnb2 = post_ln
            extra = (lns2.astype(jnp.float32), lnb2.astype(jnp.float32))
        else:
            kernel = functools.partial(_mlp_kernel_int8_fc1, c=rc,
                                       interpret=interpret, hp=hp)
    elif int8:
        # 'full' W8A8: per-output-column weight scales computed here
        # (O(C^2) fold, constant-folded next to the activations); per-row
        # activation scales in-kernel (_quant_rows)
        wq1, s1 = _quant_cols_np(wg32)
        wq2, s2 = _quant_cols_np(w2g32)
        operands = (wq1, s1, bw, wq2, s2, b2g)
        extra = ()
        if post_ln is not None:
            kernel = functools.partial(_mlp_kernel_post_ln_int8, c=rc,
                                       interpret=interpret, hp=hp)
            lns2, lnb2 = post_ln
            extra = (lns2.astype(jnp.float32), lnb2.astype(jnp.float32))
        else:
            kernel = functools.partial(_mlp_kernel_int8, c=rc,
                                       interpret=interpret, hp=hp)
    else:
        operands = (wg32.astype(dt), bw, w2g32.astype(dt), b2g)
        extra = ()
        if post_ln is not None:
            kernel = functools.partial(_mlp_kernel_post_ln, c=rc,
                                       interpret=interpret, hp=hp)
            lns2, lnb2 = post_ln
            extra = (lns2.astype(jnp.float32), lnb2.astype(jnp.float32))
        else:
            if panel % max(split, 1):
                split = 1
            kernel = functools.partial(_mlp_kernel, c=rc, interpret=interpret,
                                       hp=hp, split=max(split, 1))
    out = pl.pallas_call(
        kernel,
        grid=(rows_p // panel,),
        in_specs=[
            pl.BlockSpec((panel, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((panel, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(operands) + len(extra)),
        out_specs=pl.BlockSpec((panel, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), dt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * c * 2 * hidden,
            bytes_accessed=3 * rows * c * dt.itemsize
            + 2 * c * hidden * (1 if int8 else dt.itemsize),
            transcendentals=0,
        ),
    )(dw2, x2, *operands, *extra)
    if pad_rows:
        out = out[:rows]
    return out.reshape(n, h, w, c)
