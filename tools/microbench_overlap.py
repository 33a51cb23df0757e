#!/usr/bin/env python
"""Does host->device transfer overlap with device compute through the relay?

Measures (a) device-resident ensemble launch time (chip capability, no
transfer), (b) transfer-only time, (c) interleaved transfer+launch (the
stream pattern), and (d) threaded transfer concurrent with launches.
If (c) ~= (a)+(b) the relay serializes; if (c) ~= max(a,b) it overlaps.
"""
import concurrent.futures as cf
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor

    V, F, S = int(sys.argv[1]) if len(sys.argv) > 1 else 8, 15, 224
    predictor = Predictor(Config(), net="genconvit", face_backend="fullframe",
                          dtype=jnp.bfloat16)
    fn = predictor._forward_fn(F, batched=True, stacked=True)
    rng = np.random.default_rng(0)
    n_bufs = 8
    host = [rng.integers(0, 255, (V, F, S, S, 3), np.uint8) for _ in range(n_bufs)]
    masks = np.ones((V, F), np.float32)
    dev = [jax.device_put(h) for h in host]
    dmask = jax.device_put(masks)
    k = jax.random.PRNGKey(0)

    out = fn(predictor.params, dev[0], dmask, k)  # compile
    jax.block_until_ready(out)

    # (a) device-resident launches
    iters = 12
    t0 = time.perf_counter()
    outs = [fn(predictor.params, dev[i % n_bufs], dmask, k) for i in range(iters)]
    jax.block_until_ready(outs)
    a = (time.perf_counter() - t0) / iters
    log(f"(a) device-resident launch: {a*1e3:.1f} ms/launch "
        f"-> {V/a:.1f} videos/s compute ceiling")

    # (b) transfer-only
    t0 = time.perf_counter()
    for i in range(n_bufs):
        jax.device_put(host[i]).block_until_ready()
    b = (time.perf_counter() - t0) / n_bufs
    log(f"(b) transfer-only: {b*1e3:.1f} ms/batch "
        f"({host[0].nbytes/1e6:.1f}MB, {host[0].nbytes/1e6/b:.1f} MB/s)")

    # (c) interleaved async (the current stream pattern)
    t0 = time.perf_counter()
    outs = []
    for i in range(n_bufs):
        d = jax.device_put(host[i])
        outs.append(fn(predictor.params, d, dmask, k))
    jax.block_until_ready(outs)
    c = (time.perf_counter() - t0) / n_bufs
    log(f"(c) interleaved stream: {c*1e3:.1f} ms/batch -> {V/c:.1f} videos/s "
        f"(serialized would be {(a+b)*1e3:.1f} ms, overlapped {max(a,b)*1e3:.1f})")

    # (d) transfers on a worker thread, launches on main
    def put(i):
        return jax.device_put(host[i])

    t0 = time.perf_counter()
    outs = []
    with cf.ThreadPoolExecutor(max_workers=2) as ex:
        futs = [ex.submit(put, i) for i in range(n_bufs)]
        for f in futs:
            outs.append(fn(predictor.params, f.result(), dmask, k))
    jax.block_until_ready(outs)
    d = (time.perf_counter() - t0) / n_bufs
    log(f"(d) threaded transfer + launch: {d*1e3:.1f} ms/batch -> {V/d:.1f} videos/s")


if __name__ == "__main__":
    main()
