#!/usr/bin/env python
"""Per-op TPU profile of the batched ensemble forward.

Runs Predictor.predict_videos_batched under jax.profiler, parses the
xplane.pb, and ranks ops on the device "XLA Ops" line by total self time.
This is the round-2 throughput tool: it tells us where the ~100ms/launch
actually goes (Pallas blocks vs XLA fusions vs the VAE latent matmuls vs
copies), replacing guesswork.

Usage:  python tools/profile_forward.py [--v 8] [--frames 15] [--net genconvit]
        (single real TPU process; ~1-2min including compile)
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_xplane(logdir):
    """-> list of (op_name, total_self_us, occurrences) from the TPU planes."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    spaces = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        spaces.ParseFromString(f.read())
    rows = {}
    total_line_us = {}
    for plane in spaces.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e6  # ps -> us
                t, c = rows.get(name, (0.0, 0))
                rows[name] = (t + dur, c + 1)
                total_line_us[line.name] = total_line_us.get(line.name, 0.0) + dur
    return rows, total_line_us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=8, help="videos per launch")
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--net", default="genconvit")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--logdir", default="/tmp/gcv_profile")
    args = ap.parse_args()

    if args.no_pallas:
        os.environ["GENCONVIT_PALLAS"] = "0"

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor

    config = Config()
    config.weight_dir = os.environ.get("GENCONVIT_WEIGHT_DIR", "weight")
    backend = jax.default_backend()
    predictor = Predictor(config, net=args.net, face_backend="fullframe",
                          dtype=jnp.bfloat16 if backend == "tpu" else jnp.float32)

    rng = np.random.default_rng(0)
    faces = [rng.integers(0, 255, (args.v, args.frames, 224, 224, 3), np.uint8)
             for _ in range(4)]
    masks = np.ones((args.v, args.frames), np.float32)

    import time
    t0 = time.perf_counter()
    predictor.predict_videos_batched(faces[0], masks)  # compile
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for i in range(1, 4):
            predictor.predict_videos_batched(faces[i], masks)

    rows, totals = parse_xplane(args.logdir)
    ranked = sorted(rows.items(), key=lambda kv: -kv[1][0])
    grand = sum(t for t, _ in rows.values())
    print(f"\n== XLA Ops self time (3 launches, V={args.v}, F={args.frames}, "
          f"net={args.net}, pallas={'off' if args.no_pallas else 'on'}) ==")
    print(f"total device op time: {grand/1000:.2f} ms "
          f"({grand/3000:.2f} ms/launch)")
    print(f"{'us_total':>10} {'us/launch':>10} {'n':>5}  op")
    for name, (t, c) in ranked[: args.top]:
        print(f"{t:10.0f} {t/3:10.0f} {c:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
