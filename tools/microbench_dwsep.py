#!/usr/bin/env python
"""Separable (rank-R) depthwise microbench: is 7x1+1x7 faster than 7x7?

The launch is VPU-bound and the depthwise-7x7 convs sit at XLA's ~1.2
VPU-ops/tap floor (docs/performance.md) — the only way to go below the
floor is to do FEWER taps. A rank-R SVD factorization of each channel's
7x7 filter costs 14R taps (R row+col 1-D passes) vs 49: rank-1 = 0.29x,
rank-2 = 0.57x the taps. This measures whether XLA's 1-D depthwise path
actually delivers the per-tap rate (its register tiling could be worse for
skinny kernels), at the real ensemble stage shapes, before any model
integration. Approximation error is a separate (accuracy) question — this
tool answers only the speed side.

Usage: python tools/microbench_dwsep.py [--n 240] [--iters 100] [--trials 3]

Measured (v5e, N=240 bf16, --iters 100 --ranks 1; iters>=100 is REQUIRED —
at iters=10 the ~20-50ms relay RPC floor swamps the per-apply signal and
all variants measure equal):

    stage        dw77 ms   rank1 ms   speedup
    56x56x128     2.547     1.536      1.66x
    28x28x256     1.675     0.588      2.85x
    14x14x384     0.762     0.356      2.14x
    7x7x768       0.468     0.337      1.39x
    launch-equiv  41.9      21.2       1.98x

So XLA's 1-D depthwise path DOES deliver (14 taps vs 49 -> ~2x net, the
gap to 3.5x being per-pass fixed overhead), and rank-2 (28 taps, 4 passes)
would land ~neutral. Basis for the opt-in `KernelPlan.dw_rank` approximate
mode (ops/kernel_plan.py); accuracy is checkpoint-dependent (SVD residual
of the trained 7x7 filters) and is reported at engine prep time.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (H, W, C_padded, blocks) of the convnext-tiny stages as run by the
# kernel backbone (models/convnext.py pads C to 128-lane multiples)
STAGES = [(56, 56, 128, 3), (28, 28, 256, 3), (14, 14, 384, 9), (7, 7, 768, 3)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=240, help="batch (V=8 ensemble "
                    "runs 2 convs of N=240 per stage-block)")
    ap.add_argument("--iters", type=int, default=10, help="chained dw "
                    "applications inside the jitted body")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--ranks", default="1,2,3", help="comma list of ranks "
                    "to measure (fewer = fewer compiles through the relay)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def dw(x, k, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad_h, pad_h), (pad_w, pad_w)],
            dimension_numbers=dn, feature_group_count=x.shape[-1])

    # NOTE: reduce to a scalar ON DEVICE — fetching the [N,H,W,C] output
    # (~190 MB at stage 1) through the 20-100 MB/s relay link would swamp
    # the conv time by 100x (measured: 638 "ms/apply" that was pure D2H).
    @partial(jax.jit, static_argnames=("iters",))
    def full77(x, k, iters):
        def body(v, _):
            return dw(v, k, 3, 3), None
        return jnp.sum(jax.lax.scan(body, x, None, length=iters)[0],
                       dtype=jnp.float32)

    @partial(jax.jit, static_argnames=("iters", "rank"))
    def sep(x, kc, kr, iters, rank):
        # rank-R: sum_r colconv(rowconv(x, kr_r), kc_r); kr [1,7,1,C], kc [7,1,1,C]
        def body(v, _):
            acc = None
            for r in range(rank):
                t = dw(v, kr[r], 0, 3)
                t = dw(t, kc[r], 3, 0)
                acc = t if acc is None else acc + t
            return acc, None
        return jnp.sum(jax.lax.scan(body, x, None, length=iters)[0],
                       dtype=jnp.float32)

    rng = np.random.default_rng(0)
    results = {}
    for (h, w, c, nblocks) in STAGES:
        xs = [jnp.asarray(rng.standard_normal((args.n, h, w, c)) * 0.1, dt)
              for _ in range(args.trials + 1)]
        k77 = jnp.asarray(rng.standard_normal((7, 7, 1, c)) * 0.1, dt)
        kcs = jnp.asarray(rng.standard_normal((3, 7, 1, 1, c)) * 0.1, dt)
        krs = jnp.asarray(rng.standard_normal((3, 1, 7, 1, c)) * 0.1, dt)

        def run(fn, label):
            np.asarray(fn(xs[-1]))  # compile+warm
            dts = []
            for t in range(args.trials):
                t0 = time.perf_counter()
                np.asarray(fn(xs[t]))
                dts.append(time.perf_counter() - t0)
            ms = float(np.median(dts)) / args.iters * 1e3
            per_block = ms  # one dw per block per conv; caller scales
            print(f"  {label:12s}: {ms:7.3f} ms/apply "
                  f"(x{nblocks} blocks x2 convs = "
                  f"{ms * nblocks * 2:6.2f} ms/launch-equiv)", file=sys.stderr)
            return per_block

        print(f"stage {h}x{w}x{c} (N={args.n}):", file=sys.stderr)
        entry = {"blocks": nblocks,
                 "dw77_ms": round(run(lambda v: full77(v, k77, args.iters),
                                      "dw 7x7"), 3)}
        for r in (int(s) for s in args.ranks.split(",") if s):
            entry[f"rank{r}_ms"] = round(
                run(lambda v, r=r: sep(v, kcs[:r], krs[:r], args.iters, r),
                    f"sep rank-{r}"), 3)
        results[f"{h}x{w}x{c}"] = entry

    import json
    totals = {}
    for key in ("dw77_ms",) + tuple(f"rank{r}_ms" for r in
                                    (int(s) for s in args.ranks.split(",") if s)):
        totals[key.replace("_ms", "")] = round(
            sum(v[key] * v["blocks"] * 2 for v in results.values()), 2)
    print(json.dumps({"iters": args.iters, "stages": results,
                      "launch_equiv_ms": totals}))


if __name__ == "__main__":
    main()
