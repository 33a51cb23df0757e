#!/usr/bin/env python
"""Probe the host->device transfer path: bandwidth vs content and shape.

Questions this answers (tunnel relay characteristics, see memory notes):
  * does the link compress (zeros / real-video-like content vs random)?
  * does array shape (trailing dim 3 vs flat) change effective bandwidth?
  * what does a device-resident launch of the ensemble cost (chip capability
    independent of the tunnel)?
"""
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bw(x, n=3):
    import jax

    # distinct buffers each round: the relay caches identical executions
    xs = [x.copy() for _ in range(n)]
    for i in range(n):
        xs[i].flat[0] = i  # make each unique
    d = jax.device_put(xs[0])
    d.block_until_ready()  # warm
    t0 = time.perf_counter()
    for i in range(1, n):
        d = jax.device_put(xs[i])
        d.block_until_ready()
    dt = time.perf_counter() - t0
    mb = x.nbytes / 1e6
    return mb * (n - 1) / dt, mb


def main():
    import jax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    mb = 16
    n = mb * 1024 * 1024

    rand_flat = rng.integers(0, 255, n, np.uint8)
    zeros_flat = np.zeros(n, np.uint8)
    # "video-like": smooth gradient + small noise (compressible but not zeros)
    vid = (np.tile(np.linspace(0, 255, 224 * 224).reshape(224, 224), (n // (224 * 224), 1, 1))
           .astype(np.uint8))
    vid += rng.integers(0, 8, vid.shape, np.uint8)

    for name, arr in [("random flat", rand_flat), ("zeros flat", zeros_flat),
                      ("video-like [F,224,224]", vid)]:
        r, m = bw(arr)
        log(f"{name:28s} {m:7.1f}MB  {r:8.1f} MB/s")

    shaped3 = rng.integers(0, 255, (n // (224 * 224 * 3), 224, 224, 3), np.uint8)
    r, m = bw(shaped3)
    log(f"{'random [F,224,224,3]':28s} {m:7.1f}MB  {r:8.1f} MB/s")

    shaped224 = rng.integers(0, 255, (n // (224 * 224), 224, 224), np.uint8)
    r, m = bw(shaped224)
    log(f"{'random [F,224,224]':28s} {m:7.1f}MB  {r:8.1f} MB/s")


if __name__ == "__main__":
    main()
