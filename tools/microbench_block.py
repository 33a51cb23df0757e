#!/usr/bin/env python
"""Microbenchmark full ConvNeXt-block variants at the hot stage-1 shape.

Variants (all bf16, [240,56,56,96] unless noted):
  base     : current _block_xla_folded (reduce-based LN stats)
  mmstats  : LN stats via MXU matmuls (x @ ones/C, x^2 @ ones/C) instead of
             cross-lane VPU reductions
  shiftdw  : depthwise 7x7 as 49 shifted FMAs (no conv op, no relayout)
  pad128   : whole block at C padded 96->128 (zero-padded params)
  combo    : mmstats + pad128
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

    from genconvit_tpu.ops import conv2d
    from genconvit_tpu.ops.act import gelu_fast

    N, H, W, C = 240, 56, 56, 96
    E = 4 * C
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, dt)

    x = mk((N, H, W, C), 1.0)
    dwk = mk((7, 7, 1, C))
    dwb = mk((C,))
    gamma = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    w1 = mk((C, E))
    b1 = mk((E,))
    w2 = mk((E, C))
    b2 = mk((C,))
    ls = jnp.asarray(np.full((C,), 0.5), jnp.float32)
    EPS = 1e-6

    def epilogue_and_mlp(x0, y, mu, inv):
        wg = (gamma[:, None] * w1.astype(jnp.float32)).astype(dt)
        gw = gamma @ w1.astype(jnp.float32)
        bw = beta @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
        z = jnp.dot(y, wg, preferred_element_type=jnp.float32)
        h = ((z - mu * gw) * inv + bw).astype(dt)
        h = gelu_fast(h)
        h = (jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
             + b2.astype(jnp.float32)).astype(dt)
        return x0 + h * ls.astype(dt)

    def stats_reduce(y):
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y32), axis=-1, keepdims=True) - jnp.square(mu)
        return mu, jax.lax.rsqrt(var + EPS)

    ones_c = jnp.zeros((C, 128), jnp.bfloat16).at[:, 0].set(1.0 / C)

    def stats_matmul(y):
        mu = jnp.dot(y, ones_c, preferred_element_type=jnp.float32)[..., :1]
        sq = jnp.dot(y * y, ones_c, preferred_element_type=jnp.float32)[..., :1]
        var = sq - jnp.square(mu)
        return mu, jax.lax.rsqrt(var + EPS)

    def dw_conv(y):
        return conv2d(y, dwk, dwb, padding=3, groups=C)

    def dw_shift(y):
        yp = jnp.pad(y, ((0, 0), (3, 3), (3, 3), (0, 0)))
        acc = jnp.zeros(y.shape, jnp.float32)
        for i in range(7):
            for j in range(7):
                acc = acc + yp[:, i:i + H, j:j + W, :].astype(jnp.float32) * \
                    dwk[i, j, 0].astype(jnp.float32)
        return (acc + dwb.astype(jnp.float32)).astype(dt)

    with jax.named_scope("BASE"):
        pass

    def blk_base(x):
        with jax.named_scope("BASE"):
            y = dw_conv(x)
            mu, inv = stats_reduce(y)
            return epilogue_and_mlp(x, y, mu, inv)

    def blk_mmstats(x):
        with jax.named_scope("MMSTATS"):
            y = dw_conv(x)
            mu, inv = stats_matmul(y)
            return epilogue_and_mlp(x, y, mu, inv)

    def blk_shiftdw(x):
        with jax.named_scope("SHIFTDW"):
            y = dw_shift(x)
            mu, inv = stats_matmul(y)
            return epilogue_and_mlp(x, y, mu, inv)

    # padded-C variants
    CP = 128
    xP = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, CP - C)))
    dwkP = jnp.pad(dwk, ((0, 0), (0, 0), (0, 0), (0, CP - C)))
    dwbP = jnp.pad(dwb, (0, CP - C))
    gammaP = jnp.pad(gamma, (0, CP - C))
    betaP = jnp.pad(beta, (0, CP - C))
    w1P = jnp.pad(w1, ((0, CP - C), (0, 0)))
    w2P = jnp.pad(w2, ((0, 0), (0, CP - C)))
    b2P = jnp.pad(b2, (0, CP - C))
    lsP = jnp.pad(ls, (0, CP - C))
    ones_cP = jnp.zeros((CP, 128), jnp.bfloat16).at[:C, 0].set(1.0 / C)

    def blk_pad128(xp):
        with jax.named_scope("PAD128"):
            y = conv2d(xp, dwkP, dwbP, padding=3, groups=CP)
            mu = jnp.dot(y, ones_cP, preferred_element_type=jnp.float32)[..., :1]
            sq = jnp.dot(y * y, ones_cP, preferred_element_type=jnp.float32)[..., :1]
            inv = jax.lax.rsqrt(sq - jnp.square(mu) + EPS)
            wg = (gammaP[:, None] * w1P.astype(jnp.float32)).astype(dt)
            gw = gammaP @ w1P.astype(jnp.float32)
            bw = betaP @ w1P.astype(jnp.float32) + b1.astype(jnp.float32)
            z = jnp.dot(y, wg, preferred_element_type=jnp.float32)
            h = ((z - mu * gw) * inv + bw).astype(dt)
            h = gelu_fast(h)
            h = (jnp.dot(h, w2P.astype(dt), preferred_element_type=jnp.float32)
                 + b2P.astype(jnp.float32)).astype(dt)
            return xp + h * lsP.astype(dt)

    fns = [("base", blk_base, x), ("mmstats", blk_mmstats, x),
           ("shiftdw", blk_shiftdw, x), ("pad128", blk_pad128, xP)]
    jitted = [(n, jax.jit(f), a) for n, f, a in fns]
    for n, f, a in jitted:
        f(a).block_until_ready()
    print("compiled", file=sys.stderr)

    import shutil
    logdir = "/tmp/gcv_micro2"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        outs = []
        for n, f, a in jitted:
            for _ in range(3):
                outs.append(f(a))
        for o in outs:
            np.asarray(o[0, 0, 0])

    from tools.profile_forward import parse_xplane

    rows, _ = parse_xplane(logdir)
    ranked = sorted(rows.items(), key=lambda kv: -kv[1][0])
    print(f"{'us_total':>10} {'us/call':>9} {'n':>4}  op")
    for name, (t, c) in ranked[:36]:
        print(f"{t:10.0f} {t/max(c,1):9.0f} {c:4d}  {name[:118]}")


if __name__ == "__main__":
    main()
