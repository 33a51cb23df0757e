#!/usr/bin/env python
"""Standalone A/B of the ConvNeXt block *tail* (LN + MLP + layer-scale +
residual, i.e. everything after the depthwise conv) at ensemble stage shapes:

  xla     — the folded-LN XLA formulation (current default path's tail)
  pallas  — ops/pallas/convnext_mlp.fused_ln_mlp_residual

The tail's speed-of-light is ~max(HBM 3 tensors, MXU 2 matmuls); this tool
tells us how far each implementation is from it, per shape. Device-side
xplane op times (wall clocks through the relay are dispatch-contaminated
for ms-scale kernels — see CLAUDE.md/memory notes).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="240,56,96;240,28,192;240,14,384;240,7,768")
    ap.add_argument("--trials", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.ops import gelu
    from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

    EPS = 1e-6
    rng = np.random.default_rng(0)

    def xla_tail(p, dw, x):
        x32 = dw.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
        inv = jax.lax.rsqrt(var + EPS)
        gamma = p["norm"]["scale"].astype(jnp.float32)
        beta = p["norm"]["bias"].astype(jnp.float32)
        w1 = p["mlp"]["fc1"]["kernel"].astype(jnp.float32)
        b1 = p["mlp"]["fc1"]["bias"].astype(jnp.float32)
        wg = (gamma[:, None] * w1).astype(dw.dtype)
        gw = gamma @ w1
        bw = beta @ w1 + b1
        z = jnp.dot(dw, wg, preferred_element_type=jnp.float32)
        y = ((z - mu * gw) * inv + bw).astype(dw.dtype)
        y = gelu(y)
        y = jnp.dot(y, p["mlp"]["fc2"]["kernel"].astype(dw.dtype),
                    preferred_element_type=jnp.float32)
        y = (y + p["mlp"]["fc2"]["bias"].astype(jnp.float32)) \
            * p["gamma"].astype(jnp.float32)
        return x + y.astype(x.dtype)

    for spec in args.shapes.split(";"):
        n, h, c = (int(v) for v in spec.split(","))
        p = {
            "norm": {"scale": jnp.ones((c,), jnp.float32),
                     "bias": jnp.zeros((c,), jnp.float32)},
            "mlp": {"fc1": {"kernel": jnp.asarray(
                        rng.standard_normal((c, 4 * c)) * 0.02, jnp.float32),
                    "bias": jnp.zeros((4 * c,), jnp.float32)},
                    "fc2": {"kernel": jnp.asarray(
                        rng.standard_normal((4 * c, c)) * 0.02, jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32)}},
            "gamma": jnp.full((c,), 0.3, jnp.float32),
        }
        variants = [
            ("xla", jax.jit(xla_tail)),
            ("pallas", jax.jit(lambda p_, dw_, x_: fused_ln_mlp_residual(dw_, x_, p_))),
        ]
        rows = n * h * h
        gb = 3 * rows * c * 2 / 1e9
        gflop = 2 * 2 * rows * c * 4 * c / 1e9
        print(f"[{n},{h},{h},{c}] tail: {gb*1000:.0f}MB traffic floor "
              f"{gb/0.8:.2f}ms, {gflop:.0f}GFLOP mxu floor {gflop/197:.2f}ms")
        xs = [(jnp.asarray(rng.standard_normal((n, h, h, c)), jnp.bfloat16),
               jnp.asarray(rng.standard_normal((n, h, h, c)), jnp.bfloat16))
              for _ in range(2)]
        for name, fn in variants:
            import shutil

            from tools.profile_forward import parse_xplane

            np.asarray(fn(p, *xs[0])[:1, :1, :1, :4])  # compile+sync
            logdir = f"/tmp/gcv_mbt/{c}_{name}"
            shutil.rmtree(logdir, ignore_errors=True)
            os.makedirs(logdir, exist_ok=True)
            with jax.profiler.trace(logdir):
                outs = [fn(p, *xs[i % 2]) for i in range(args.trials)]
                np.asarray(jnp.stack([o[0, 0, 0, 0] for o in outs]))
            rows_t, _ = parse_xplane(logdir)
            dev_ms = sum(t for t, _ in rows_t.values()) / 1000 / args.trials
            print(f"  {name:8s} {dev_ms:8.2f} ms/launch (device)", flush=True)


if __name__ == "__main__":
    main()
