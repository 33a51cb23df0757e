#!/usr/bin/env python
"""V=1/V=2 launch-latency levers (VERDICT r4 #6).

11.5 ms at V=1 is the serving latency floor; at V=1 the VAE's 25088x12544
latent heads (ref model/genconvit_vae.py:36-37) are pure weight-read — only
15 activation rows flow through 630M weights — so weight-compression levers
are the candidates that could move the floor:

  base        exact semantics, tuned plan (the shipped default)
  int8_heads  GENCONVIT_INT8_HEADS=1 — weight-only int8 mu/var heads
              (halves the head bytes read per launch vs bf16)
  int8_mlp    GENCONVIT_INT8_MLP=1 — W8A8 ConvNeXt MLP tails (measured net
              slower at V=16 on v5e; V=1 may differ — smaller activation
              panels shift the absmax/dequant-vs-MXU balance)
  dw_rank1    GENCONVIT_DW_RANK=1 — rank-1 separable depthwise
              (APPROXIMATE; ~2x launch-equivalent at V=16)

Each lever constructs its own Predictor (kernel knobs resolve ONCE at
construction — ops/kernel_plan.py), measures per-launch latency at V=1 and
V=2 with the async-dispatch/single-fetch loop bench.py uses (distinct rng
keys per launch so the relay's execution cache can't serve repeats), and
prints one compact JSON line per config; the table lands in
docs/performance.md ("V=1 latency levers").

Usage:  python tools/latency_levers.py [--iters 24] [--trials 3]
        [--configs base,int8_heads,int8_mlp,dw_rank1] [--v-list 1,2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FRAMES = 15

CONFIGS = {
    "base": {},
    "int8_heads": {"GENCONVIT_INT8_HEADS": "1"},
    "int8_mlp": {"GENCONVIT_INT8_MLP": "1"},
    "dw_rank1": {"GENCONVIT_DW_RANK": "1"},
}


def measure(predictor, v: int, iters: int, trials: int, img: int):
    """Median per-launch ms at video-batch v (async dispatch, one fetch)."""
    import jax
    import jax.numpy as jnp

    device = jax.devices()[0]
    rng = np.random.default_rng(17 + v)
    devs = [jax.device_put(rng.integers(
        0, 255, (v, FRAMES, img, img, 3), np.uint8), device) for _ in range(4)]
    mask = jax.device_put(np.ones((v, FRAMES), np.float32), device)
    keys = jax.device_put(
        jax.vmap(jax.random.PRNGKey)(np.arange(trials * iters + 3) * 7919 + v),
        device)
    fn = predictor._forward_fn(FRAMES, batched=True, stacked=True)
    t0 = time.perf_counter()
    np.asarray(fn(predictor.params, devs[0], mask, keys[-1]))
    compile_s = time.perf_counter() - t0
    np.asarray(fn(predictor.params, devs[1], mask, keys[-2]))
    np.asarray(fn(predictor.params, devs[2], mask, keys[-3]))
    lat = []
    for trial in range(trials):
        t0 = time.perf_counter()
        outs = [fn(predictor.params, devs[i % 4], mask,
                   keys[trial * iters + i]) for i in range(iters)]
        np.asarray(jnp.stack(outs))
        lat.append((time.perf_counter() - t0) / iters * 1e3)
    return round(float(np.median(lat)), 2), [round(x, 2) for x in lat], \
        round(compile_s, 1)


def main():
    ap = argparse.ArgumentParser("latency_levers")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--configs", default="base,int8_heads,int8_mlp,dw_rank1")
    ap.add_argument("--v-list", default="1,2")
    ap.add_argument("--net", default="genconvit")
    args = ap.parse_args()

    os.environ.setdefault("GENCONVIT_FAST_INIT", "1")
    vs = [int(x) for x in args.v_list.split(",")]
    results = {}
    for name in args.configs.split(","):
        env = CONFIGS[name]
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            from genconvit_tpu.config import load_config
            from genconvit_tpu.infer.engine import Predictor

            config = load_config()
            config.weight_dir = os.environ.get("GENCONVIT_WEIGHT_DIR",
                                               "weight")
            t0 = time.perf_counter()
            pred = Predictor(config, net=args.net, fp16=True,
                             face_backend="fullframe", seed=0)
            print(f"[{name}] predictor up in {time.perf_counter() - t0:.1f}s "
                  f"(plan {pred.kernel_plan})", file=sys.stderr, flush=True)
            row = {}
            for v in vs:
                med, lats, comp = measure(pred, v, args.iters, args.trials,
                                          config.img_size)
                row[f"v{v}_ms"] = med
                row[f"v{v}_trials"] = lats
                print(f"[{name}] V={v}: {med} ms/launch (trials {lats}, "
                      f"compile {comp}s)", file=sys.stderr, flush=True)
            results[name] = row
            print(json.dumps({"config": name, **row}), flush=True)
            del pred
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
    base = results.get("base", {})
    summary = {"metric": "latency_levers", "net": args.net,
               "frames": FRAMES, **{
                   f"{n}_{k}": v for n, row in results.items()
                   for k, v in row.items() if not k.endswith("_trials")}}
    for n, row in results.items():
        if n != "base" and base.get("v1_ms"):
            summary[f"{n}_v1_speedup"] = round(
                base["v1_ms"] / max(row.get("v1_ms", 1e9), 1e-9), 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
