#!/usr/bin/env python
"""Training-step throughput on the chip.

Measures images/sec of the jitted train step (fwd + bwd + Adam + BN
write-back, remat on — the exact step train/loop.py runs) for each net at
224px. Reference counterpart: the torch epoch loops in ref train.py /
model/*_train (per-batch optimizer steps on A100).

Wall clocks around a fetch per N steps (distinct inputs per step; the relay
caches identical executions). Single TPU process.

Usage: python tools/bench_train.py [--net genconvit] [--batch 16] [--steps 8]
       [--dtype bf16|f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="genconvit")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--img", type=int, default=224)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.config import Config
    from genconvit_tpu.models.genconvit import init_genconvit
    from genconvit_tpu.train.loop import make_train_step

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    cfg = Config()
    cfg.img_size = args.img
    if args.img != 224:
        cfg.model.latent_dims = cfg.derived_latent_dims()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = init_genconvit(jax.random.PRNGKey(0), cfg, args.net)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    step = make_train_step(args.net, tx, dtype=dtype)

    rng = np.random.default_rng(0)
    # device-resident batches: the sandbox relay link is ~1000x slower than
    # a production host's PCIe, so H2D stays out of the measured loop (same
    # methodology as bench.py's device-resident number)
    batches = [
        (jax.device_put(rng.integers(0, 255, (args.batch, args.img, args.img, 3), np.uint8)),
         jax.device_put(rng.integers(0, 2, (args.batch,), np.int32)))
        for _ in range(args.steps)
    ]
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    params, opt_state, loss, acc = step(params, opt_state,
                                        batches[0][0], batches[0][1], key)
    float(loss)
    print(f"first step (compile) {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = 0.0
    for trial in range(args.trials):
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            params, opt_state, loss, acc = step(
                params, opt_state, batches[i][0], batches[i][1], k)
        float(loss)  # sync fetch
        dt = time.perf_counter() - t0
        ips = args.batch * args.steps / dt
        print(f"trial {trial}: {ips:.1f} images/s "
              f"({dt / args.steps * 1e3:.0f} ms/step) loss={float(loss):.3f}",
              file=sys.stderr)
        best = max(best, ips)
    print(f'{{"net": "{args.net}", "batch": {args.batch}, '
          f'"dtype": "{args.dtype}", "train_images_per_sec": {best:.1f}}}')


if __name__ == "__main__":
    main()
