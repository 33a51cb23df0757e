#!/usr/bin/env python
"""In-kernel cost breakdown of the fused ConvNeXt block at the stage-1 shape.

Compiles progressively larger kernel bodies (dw -> +LN -> +fc1 -> +gelu ->
full) on the v1 kernel structure (c padded to 128, slab DMA) and reports
device ms per variant — the deltas attribute time to each phase. Also times
tap-read alternatives for the depthwise conv.
"""

import functools
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.ops.pallas.convnext_stage import _gelu_f32
    from tools.profile_forward import parse_xplane

    N, H, W, C = 240, 56, 56, 96
    CP = 128
    WP = W + 6 + (-(W + 6) % 8)  # 64
    E = 4 * C  # 384
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    EPS = 1e-6

    def kern(x_hbm, dwk, dwb, lns, lnb, w1, b1, w2, b2, gam, out_ref,
             slab, sem, *, phase: str, fp32dw: bool):
        n_steps = pl.num_programs(0)
        i = pl.program_id(0)

        def dma(slot, step):
            return pltpu.make_async_copy(x_hbm.at[pl.ds(step, 1)],
                                         slab.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n_steps)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        cur = slab[i % 2]
        if phase == "dma":
            out_ref[...] = cur[:, 3:3 + H, 3:3 + W, :]
            return
        accdt = jnp.float32 if fp32dw else dt
        acc = jnp.broadcast_to(dwb[:].astype(accdt), (1, H, W, CP))
        for dy in range(7):
            for dx in range(7):
                acc = acc + cur[:, dy:dy + H, dx:dx + W, :].astype(accdt) \
                    * dwk[dy, dx].astype(accdt)
        if phase == "dw":
            out_ref[...] = acc.astype(dt)
            return
        acc = acc.astype(jnp.float32)
        inv_c = jnp.float32(1.0 / C)
        mean = jnp.sum(acc, axis=-1, keepdims=True) * inv_c
        var = jnp.sum(jnp.square(acc), axis=-1, keepdims=True) * inv_c \
            - jnp.square(mean)
        y = (acc - mean) * jax.lax.rsqrt(var + EPS)
        y = y * lns[:].astype(jnp.float32) + lnb[:].astype(jnp.float32)
        if phase == "ln":
            out_ref[...] = y.astype(dt)
            return
        y2 = y.reshape(H * W, CP).astype(dt)
        hid = jnp.dot(y2, w1[:], preferred_element_type=jnp.float32)
        hid = hid + b1[:].astype(jnp.float32)
        if phase == "fc1":
            out_ref[...] = hid[:, :CP].reshape(1, H, W, CP).astype(dt)
            return
        hid = _gelu_f32(hid).astype(dt)
        if phase == "gelu":
            out_ref[...] = hid[:, :CP].reshape(1, H, W, CP).astype(dt)
            return
        o = jnp.dot(hid, w2[:], preferred_element_type=jnp.float32)
        o = (o + b2[:].astype(jnp.float32)).reshape(1, H, W, CP)
        o = o * gam[:].astype(jnp.float32)
        res = cur[:, 3:3 + H, 3:3 + W, :].astype(jnp.float32)
        out_ref[...] = (res + o).astype(dt)

    def build(phase, fp32dw=True):
        kernel = functools.partial(kern, phase=phase, fp32dw=fp32dw)
        def run(xp, *args):
            return pl.pallas_call(
                kernel,
                grid=(N,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
                out_specs=pl.BlockSpec((1, H, W, CP), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, H, W, CP), dt),
                scratch_shapes=[
                    pltpu.VMEM((2, 1, H + 6, WP, CP), dt),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )(xp, *args)
        return jax.jit(run)

    def mk(shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    xs = [jnp.pad(jnp.asarray(rng.standard_normal((N, H, W, C)), dt),
                  ((0, 0), (3, 3), (3, WP - W - 3), (0, CP - C)))
          for _ in range(2)]
    args = (mk((7, 7, CP)), mk((CP,)), mk((CP,), 1.0), mk((CP,)),
            jnp.asarray(rng.standard_normal((CP, E)) * .05, dt), mk((E,)),
            jnp.asarray(rng.standard_normal((E, CP)) * .05, dt), mk((CP,)),
            mk((CP,), 0.5))

    iters = 6
    prev = 0.0
    for phase in ["dma", "dw", "ln", "fc1", "gelu", "full"]:
        for fp32dw in ([True] if phase != "dw" else [True, False]):
            tag = phase + ("" if fp32dw else "_bf16acc")
            try:
                f = build(phase, fp32dw)
                np.asarray(f(xs[0], *args)[0, 0, 0])
                logdir = f"/tmp/gcv_parts/{tag}"
                shutil.rmtree(logdir, ignore_errors=True)
                with jax.profiler.trace(logdir):
                    outs = [f(xs[i % 2], *args) for i in range(iters)]
                    np.asarray(jnp.stack([o[0, 0, 0] for o in outs]))
                rows, _ = parse_xplane(logdir)
                ms = sum(t for t, _ in rows.values()) / 1000 / iters
                d = ms - prev if fp32dw else float("nan")
                print(f"{tag:12s} {ms:7.2f} ms  (+{d:5.2f})", flush=True)
                if fp32dw:
                    prev = ms
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
