#!/usr/bin/env python
"""Microbenchmark the ConvNeXt block primitives at the hot stage-1 shape.

Per-launch RPC overhead on the tunneled chip (~30-150ms) swamps ms-level
ops, so everything runs inside ONE traced launch and per-op times come from
the profiler (tools/profile_forward.parse_xplane). Each variant is tagged
with jax.named_scope so it is identifiable in the xplane dump.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    N, H, W, C = 240, 56, 56, 96
    E = 4 * C
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x = jnp.asarray(rng.standard_normal((N, H, W, C)), dt)
    w1 = jnp.asarray(rng.standard_normal((C, E)) * 0.05, dt)
    b1 = jnp.asarray(rng.standard_normal((E,)) * 0.05, dt)
    w2 = jnp.asarray(rng.standard_normal((E, C)) * 0.05, dt)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.05, dt)
    dwk = jnp.asarray(rng.standard_normal((7, 7, 1, C)) * 0.05, dt)
    scale = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    from genconvit_tpu.ops import conv2d, gelu, layer_norm, linear

    def ln_only(x):
        with jax.named_scope("LN_ONLY"):
            return layer_norm(x, scale, bias, eps=1e-6)

    def mm_only(x):
        with jax.named_scope("MM_ONLY"):
            return x @ w1 + b1

    def mm_gelu(x):
        with jax.named_scope("MM_GELU"):
            return gelu(x @ w1 + b1)

    def mm_gelu_tanh(x):
        with jax.named_scope("MM_GELU_TANH"):
            return jax.nn.gelu(x @ w1 + b1, approximate=True)

    def gelu_only(y):
        with jax.named_scope("GELU_ONLY"):
            return gelu(y)

    def dw_only(x):
        with jax.named_scope("DW_ONLY"):
            return conv2d(x, dwk, None, padding=3, groups=C)

    def mm2_only(y):
        with jax.named_scope("MM2_ONLY"):
            return y @ w2 + b2

    def ln_folded_mm(x):
        # LN folded into the fc1 matmul: z = x @ (gamma*W); out = (z - mu*(g@W))/sigma + beta@W
        with jax.named_scope("LN_FOLDED_MM"):
            xf = x
            mu = jnp.mean(xf.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf.astype(jnp.float32)), axis=-1,
                           keepdims=True) - jnp.square(mu)
            inv = jax.lax.rsqrt(var + 1e-6)
            wg = (scale[:, None] * w1.astype(jnp.float32)).astype(dt)
            gw = (scale @ w1.astype(jnp.float32))
            bw = (bias @ w1.astype(jnp.float32)) + b1.astype(jnp.float32)
            z = xf @ wg
            out = (z.astype(jnp.float32) - mu * gw) * inv + bw
            return out.astype(dt)

    y = jnp.asarray(rng.standard_normal((N, H, W, E)), dt)

    fns = [("ln", ln_only, x), ("mm", mm_only, x), ("mm_gelu", mm_gelu, x),
           ("mm_gelu_tanh", mm_gelu_tanh, x), ("gelu", gelu_only, y),
           ("dw", dw_only, x), ("mm2", mm2_only, y),
           ("ln_folded", ln_folded_mm, x)]

    jitted = [(name, jax.jit(fn), arg) for name, fn, arg in fns]
    for name, fn, arg in jitted:  # compile
        fn(arg).block_until_ready()
    print("compiled", file=sys.stderr)

    logdir = "/tmp/gcv_micro"
    os.makedirs(logdir, exist_ok=True)
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        outs = []
        for name, fn, arg in jitted:
            for _ in range(3):
                outs.append(fn(arg))
        for o in outs:
            np.asarray(o[0, 0] if o.ndim > 2 else o[0])

    from tools.profile_forward import parse_xplane

    rows, _ = parse_xplane(logdir)
    ranked = sorted(rows.items(), key=lambda kv: -kv[1][0])
    print(f"{'us_total':>10} {'us/call':>9} {'n':>4}  op")
    for name, (t, c) in ranked[:40]:
        print(f"{t:10.0f} {t/max(c,1):9.0f} {c:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
