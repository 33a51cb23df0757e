#!/usr/bin/env python
"""Depthwise-7x7 strategy experiment at ensemble stage-1 shape, C lane-padded.

The 49-tap depthwise is the launch's biggest cost class (~31ms across the
ensemble) and XLA runs it at ~2 VPU-ops/tap (shift + FMA per vreg). Pallas
attempt v1 was 3x WORSE: sublane-shifted reads are non-elementwise, so Mosaic
materializes each shifted operand in VMEM and the fp32 accumulator round-trips
per tap. Hypothesis tested here: pre-shift the slab 7 times (one in-VMEM copy
per dx, ~1 op/vreg each), after which every tap is a vreg-ALIGNED read and the
49-term FMA chain can fuse per-vreg -> ~1.15 ops/tap.

Variants:
  xla      — lax dw conv + f32 moments (the model's fused dw+stats shape)
  shift7   — Pallas: 7 pre-shifted slab copies + aligned 49-FMA sum + moments

Device-side xplane timing; distinct inputs per launch.
"""

import argparse
import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--h", type=int, default=56)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--ipt", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from tools.profile_forward import parse_xplane

    N, H, C, ipt = args.n, args.h, args.c, args.ipt
    W = H
    WP = W + 6 + (-(W + 6) % 8)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    k = jnp.asarray(rng.standard_normal((7, 7, C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

    def xla_fn(x):
        from genconvit_tpu.ops import conv2d

        dw = conv2d(x, k[:, :, None, :].transpose(0, 1, 2, 3).reshape(7, 7, 1, C)
                    .astype(dt), b, padding=3, groups=C)
        x32 = dw.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
        return dw, mu[..., 0], var[..., 0]

    def kernel(x_hbm, kw, kb, dw_ref, mu_ref, var_ref, slab, shifted, sem,
               *, interpret):
        n_steps = pl.num_programs(0)
        i = pl.program_id(0)

        def dma(slot, step):
            return pltpu.make_async_copy(x_hbm.at[pl.ds(step * ipt, ipt)],
                                         slab.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n_steps)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        cur = slab[i % 2]                    # [ipt, H+6, WP, C]
        # 7 pre-shifted copies: shifted[dx] = cur rolled by dx along W.
        # After this, every tap read below is vreg-aligned.
        for dx in range(7):
            shifted[dx] = pltpu.roll(cur, -dx, 2)
        acc = jnp.broadcast_to(kb[:].astype(jnp.float32), (ipt, H, W, C))
        for dy in range(7):
            for dx in range(7):
                tap = shifted[dx, :, dy:dy + H, 0:W, :]
                acc = acc + tap.astype(jnp.float32) * kw[dy, dx, :]
        dw_ref[...] = acc.astype(dw_ref.dtype)
        inv_c = jnp.float32(1.0 / C)
        mu = jnp.sum(acc, axis=-1) * inv_c
        var = jnp.sum(jnp.square(acc), axis=-1) * inv_c - jnp.square(mu)
        mu_ref[...] = mu
        var_ref[...] = var

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def shift7_fn(x, interpret=False):
        x_pad = jnp.pad(x, ((0, 0), (3, 3), (3, WP - W - 3), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel, interpret=interpret),
            grid=(N // ipt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[
                pl.BlockSpec((ipt, H, W, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ipt, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ipt, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H, W, C), dt),
                jax.ShapeDtypeStruct((N, H, W), jnp.float32),
                jax.ShapeDtypeStruct((N, H, W), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, ipt, H + 6, WP, C), dt),
                pltpu.VMEM((7, ipt, H + 6, WP, C), dt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * H * W * C * 49,
                bytes_accessed=2 * N * H * W * C * 2,
                transcendentals=0,
            ),
        )(x_pad, k, b)
        return out

    xs = [jnp.asarray(rng.standard_normal((N, H, W, C)), dt) for _ in range(2)]

    # correctness first (small, interpret on CPU is too slow at this size —
    # compare on device against the XLA reference)
    xf = jax.jit(xla_fn)
    ref = xf(xs[0])
    got = shift7_fn(xs[0])
    for name, r, g in (("dw", ref[0], got[0]), ("mu", ref[1], got[1]),
                       ("var", ref[2], got[2])):
        r = np.asarray(r, np.float32); g = np.asarray(g, np.float32)
        rel = np.abs(r - g).max() / max(np.abs(r).max(), 1e-6)
        print(f"parity {name}: rel {rel:.2e}", flush=True)

    for name, fn in (("xla", xf), ("shift7", shift7_fn)):
        np.asarray(fn(xs[0])[0][:1, :1, :1, :4])
        logdir = f"/tmp/gcv_dws/{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        os.makedirs(logdir, exist_ok=True)
        with jax.profiler.trace(logdir):
            outs = [fn(xs[i % 2]) for i in range(args.iters)]
            np.asarray(jnp.stack([o[0][0, 0, 0, 0] for o in outs]))
        rows, _ = parse_xplane(logdir)
        dev = sum(t for t, _ in rows.values()) / 1000 / args.iters
        print(f"{name}: {dev:.3f} ms/launch (device)", flush=True)


if __name__ == "__main__":
    main()
