#!/usr/bin/env python
"""Is an int8xint8->int32 Pallas dot actually ~2x the bf16 rate on this
chip? Isolates the question from the W8A8 MLP-tail kernel's quantize
overhead (which measured as a net regression, bench 57.7 -> 65.2 ms/launch):

  dots_bf16  grid kernel: z = y@w1; o = h@w2 (bf16 in, f32 accum)
  dots_int8  same dots with pre-quantized int8 operands + scale epilogue

plus the full tails for context (pallas bf16 vs W8A8 int8). Device-side
xplane times (wall clocks are dispatch-contaminated through the relay).
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
    ap.add_argument("--shape", default="240,56,128")  # padded s1 ensemble
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--panel", type=int, default=4480)
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

    n, h, c = (int(v) for v in args.shape.split(","))
    rows = n * h * h
    hid = 3 * c  # convnext 4x of the REAL c (c here is the padded lane count)
    panel = args.panel
    while rows % panel:
        panel -= 8
    rng = np.random.default_rng(0)

    def dots_bf16_kernel(y_ref, hh_ref, w1_ref, w2_ref, out_ref):
        z = jnp.dot(y_ref[...], w1_ref[...],
                    preferred_element_type=jnp.float32)
        o = jnp.dot(hh_ref[...], w2_ref[...],
                    preferred_element_type=jnp.float32)
        out_ref[...] = (o + z[:, :c]).astype(out_ref.dtype)

    def dots_int8_kernel(yq_ref, hq_ref, wq1_ref, s1_ref, wq2_ref, s2_ref,
                         out_ref):
        z = jnp.dot(yq_ref[...], wq1_ref[...],
                    preferred_element_type=jnp.int32)
        zf = z.astype(jnp.float32) * s1_ref[:]
        o = jnp.dot(hq_ref[...], wq2_ref[...],
                    preferred_element_type=jnp.int32)
        of = o.astype(jnp.float32) * s2_ref[:]
        out_ref[...] = (of + zf[:, :c]).astype(out_ref.dtype)

    def build(kind):
        if kind == "bf16":
            ops = [
                jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16),
                jnp.asarray(rng.standard_normal((rows, hid)), jnp.bfloat16),
                jnp.asarray(rng.standard_normal((c, hid)) * .05, jnp.bfloat16),
                jnp.asarray(rng.standard_normal((hid, c)) * .05, jnp.bfloat16),
            ]
            kern, nin = dots_bf16_kernel, 4
            blocked = {0: (panel, c), 1: (panel, hid)}
        else:
            ops = [
                jnp.asarray(rng.integers(-127, 127, (rows, c)), jnp.int8),
                jnp.asarray(rng.integers(-127, 127, (rows, hid)), jnp.int8),
                jnp.asarray(rng.integers(-127, 127, (c, hid)), jnp.int8),
                jnp.ones((hid,), jnp.float32),
                jnp.asarray(rng.integers(-127, 127, (hid, c)), jnp.int8),
                jnp.ones((c,), jnp.float32),
            ]
            kern, nin = dots_int8_kernel, 6
            blocked = {0: (panel, c), 1: (panel, hid)}
        specs = []
        for i in range(nin):
            if i in blocked:
                specs.append(pl.BlockSpec(blocked[i], lambda g: (g, 0),
                                          memory_space=pltpu.VMEM))
            else:
                specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        fn = pl.pallas_call(
            kern, grid=(rows // panel,), in_specs=specs,
            out_specs=pl.BlockSpec((panel, c), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, c), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * c * 2 * hid, bytes_accessed=4 * rows * c,
                transcendentals=0))
        return jax.jit(fn), ops

    gflop = 2 * 2 * rows * c * hid / 1e9
    print(f"rows={rows} c={c} hid={hid} panel={panel}: {gflop:.0f} GFLOP "
          f"-> bf16 floor {gflop/197:.2f}ms, int8 floor {gflop/394:.2f}ms")
    for kind in ("bf16", "int8"):
        fn, ops = build(kind)
        np.asarray(fn(*ops)[:1, :4])  # compile+sync
        logdir = f"/tmp/gcv_i8/{kind}"
        shutil.rmtree(logdir, ignore_errors=True)
        os.makedirs(logdir, exist_ok=True)
        with jax.profiler.trace(logdir):
            outs = [fn(*ops) for _ in range(args.trials)]
            np.asarray(jnp.stack([o[0, 0] for o in outs]))
        rows_t, _ = parse_xplane(logdir)
        dev_ms = sum(t for t, _ in rows_t.values()) / 1000 / args.trials
        print(f"  dots_{kind}: {dev_ms:.3f} ms/launch (device)", flush=True)


if __name__ == "__main__":
    main()
