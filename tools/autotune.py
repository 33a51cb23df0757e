#!/usr/bin/env python
"""Per-chip kernel autotuner: measure KernelPlan candidates, ship the winner.

The kernel backbone keeps its measured dead ends as selectable A/B variants
precisely because their ranking is chip-generation-specific (the v5e winner
was picked by measurement on v5e; docs/performance.md names "per-chip
re-ranking of the kept variants" as the standing lever for newer TPUs).
This tool closes that loop: it times the real engine launch under each
candidate plan on the CURRENT backend and writes the best plan to a JSON
file that `GENCONVIT_KERNEL_PLAN=<file>` (ops/kernel_plan.py) feeds into
every CLI/Predictor as the new default — env knobs still override field-
by-field.

One resident Predictor is reused across candidates (its jit cache is keyed
on the plan, so swapping `predictor.kernel_plan` re-traces without
re-uploading params); each candidate pays one compile + warmups, then
median-of-trials wall clock with a distinct pre-uploaded rng key per launch
(measurement hygiene per docs/performance.md: the sandbox relay caches
bitwise-identical executions, and sync is by fetching a value).

Usage:
  python tools/autotune.py                      # quick grid, V=8
  python tools/autotune.py --grid full --v 16   # every kept variant
  python tools/autotune.py --out tuned_v6e.json --deadline 900

Replaces: nothing in the reference (it has no kernel variants to tune);
the analogous surface is timm's implicit cudnn-benchmark autotuning that
the reference inherits from torch (ref model/genconvit_ed.py:68).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = 15
IMG = 224


def candidates(grid: str):
    """Candidate plans, most-likely-winner first (an early deadline still
    leaves a sane result). Fields not swept default to the shipped plan."""
    from genconvit_tpu.ops.kernel_plan import KernelPlan

    quick = [
        KernelPlan(),                      # shipped default (v5e winner)
        KernelPlan(int8_mlp="fc1"),        # measured neutral on v5e
        KernelPlan(mlp_split=2),           # Mosaic MXU/VPU overlap experiment
        KernelPlan(pallas="0"),            # plain XLA folded graph
    ]
    if grid == "quick":
        return quick
    full = quick + [
        KernelPlan(gelu="hp"),
        KernelPlan(int8_mlp="full"),       # W8A8 (net slower on v5e)
        KernelPlan(mlp_panel_mb=4),
        KernelPlan(mlp_panel_mb=16),
        KernelPlan(mlp_split=4),
        KernelPlan(pallas="mlp"),          # hybrid per-stage tail path
        KernelPlan(pallas="stage"),        # whole-stage VMEM chain
        KernelPlan(pallas="1"),            # v1 fused block kernel
        KernelPlan(int8_mlp="fc1", mlp_split=2),
    ]
    return full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=8, help="videos per launch")
    ap.add_argument("--frames", type=int, default=FRAMES)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--iters", type=int, default=6, help="launches per trial")
    ap.add_argument("--grid", choices=("quick", "full"), default="quick")
    ap.add_argument("--out", default="", help="tuned plan JSON path "
                    "(default kernel_plan.<device_kind>.json)")
    ap.add_argument("--deadline", type=float, default=1800.0,
                    help="wall-clock budget (s); stops between candidates")
    args = ap.parse_args()
    t_start = time.perf_counter()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor, _host_staging_context
    from genconvit_tpu.ops.kernel_plan import save_plan

    backend = jax.default_backend()
    device = jax.devices()[0]
    kind = device.device_kind.replace(" ", "_")
    out_path = args.out or f"kernel_plan.{kind}.json"
    print(f"backend={backend} device={device.device_kind} -> {out_path}",
          file=sys.stderr)

    config = Config()
    config.weight_dir = os.environ.get("GENCONVIT_WEIGHT_DIR", "weight")
    os.environ.setdefault("GENCONVIT_FAST_INIT", "1")
    predictor = Predictor(config, net="genconvit", face_backend="fullframe",
                          dtype=jnp.bfloat16 if backend == "tpu"
                          else jnp.float32)

    rng = np.random.default_rng(0)
    bufs = [jax.device_put(rng.integers(
        0, 255, (args.v, args.frames, IMG, IMG, 3), np.uint8), device)
        for _ in range(4)]
    mask = jax.device_put(np.ones((args.v, args.frames), np.float32), device)

    def make_keys(n, salt):
        with _host_staging_context():
            ks = [jax.random.fold_in(jax.random.PRNGKey(salt), i)
                  for i in range(n)]
        return jax.device_put(ks, device)

    results = []
    for ci, plan in enumerate(candidates(args.grid)):
        left = args.deadline - (time.perf_counter() - t_start)
        if results and left < 180:
            print(f"deadline: stopping after {ci} candidates "
                  f"({left:.0f}s left)", file=sys.stderr)
            break
        predictor.kernel_plan = plan
        keys = make_keys(args.trials * args.iters + 2, salt=1000 + ci)
        label = (f"pallas={plan.pallas or 'auto'} gelu={plan.gelu} "
                 f"int8={plan.int8_mlp or 'off'} panel={plan.mlp_panel_mb} "
                 f"split={plan.mlp_split}")
        try:
            fn = predictor._forward_fn(args.frames, batched=True, stacked=True)
            t0 = time.perf_counter()
            np.asarray(fn(predictor.params, bufs[0], mask, keys[-1]))
            compile_s = time.perf_counter() - t0
            np.asarray(fn(predictor.params, bufs[1], mask, keys[-2]))
            dts = []
            for trial in range(args.trials):
                t0 = time.perf_counter()
                outs = [fn(predictor.params, bufs[i % len(bufs)], mask,
                           keys[trial * args.iters + i])
                        for i in range(args.iters)]
                np.asarray(jnp.stack(outs))
                dts.append(time.perf_counter() - t0)
            ms = float(np.median(dts)) / args.iters * 1e3
            results.append({"plan": label, "ms_per_launch": round(ms, 2),
                            "videos_per_sec": round(args.v / ms * 1e3, 1),
                            "compile_s": round(compile_s, 1),
                            "fields": {k: getattr(plan, k) for k in
                                       ("pallas", "gelu", "mlp_panel_mb",
                                        "mlp_split", "int8_mlp")},
                            "_plan_obj": plan})
            print(f"[{ci}] {label}: {ms:.2f} ms/launch "
                  f"({args.v / ms * 1e3:.1f} v/s, compile {compile_s:.0f}s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"[{ci}] {label}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            results.append({"plan": label, "error": f"{type(e).__name__}: {e}",
                            "_plan_obj": None})

    timed = [r for r in results if "ms_per_launch" in r]
    if not timed:
        print(json.dumps({"error": "no candidate completed"}))
        return 1
    best = min(timed, key=lambda r: r["ms_per_launch"])
    meta = {
        "name": f"tuned-{kind}",
        "device_kind": device.device_kind,
        "backend": backend,
        "v_batch": args.v,
        "frames": args.frames,
        "trials": args.trials,
        "iters": args.iters,
        "candidates": [{k: v for k, v in r.items() if k != "_plan_obj"}
                       for r in results],
        "tool": "tools/autotune.py",
    }
    save_plan(best["_plan_obj"], out_path, meta=meta)
    print(json.dumps({"best": best["plan"],
                      "ms_per_launch": best["ms_per_launch"],
                      "videos_per_sec": best["videos_per_sec"],
                      "plan_file": out_path,
                      "use": f"GENCONVIT_KERNEL_PLAN={out_path}"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
