#!/usr/bin/env python
"""Per-stage ConvNeXt block A/B: XLA-folded vs shift-dwconv vs Pallas fused.

Times one block at each stage shape (both ensemble batch sizes) with wall
clocks around fetches — through-the-relay timing is noisy, so each variant
runs `iters` launches between two fetch syncs and we report ms/launch.

Usage: python tools/microbench_stages.py [--iters 8] [--stages 1,2,3,4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = {  # stage -> (H, C) at 224 input; batch = V*F*2 branches
    1: (56, 96),
    2: (28, 192),
    3: (14, 384),
    4: (7, 768),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--stages", default="1,2,3,4")
    ap.add_argument("--variants", default="xla,shift,pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.models.convnext import _block_xla_folded
    from genconvit_tpu.ops.act import gelu_fast
    from genconvit_tpu.ops.pallas.convnext_block import fused_convnext_block

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    EPS = 1e-6

    def make_params(c):
        def mk(shape, s=0.05):
            return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)
        return {
            "conv_dw": {"kernel": mk((7, 7, 1, c)), "bias": mk((c,))},
            "norm": {"scale": mk((c,), 1.0), "bias": mk((c,))},
            "mlp": {"fc1": {"kernel": mk((c, 4 * c)), "bias": mk((4 * c,))},
                    "fc2": {"kernel": mk((4 * c, c)), "bias": mk((c,))}},
            "gamma": mk((c,), 0.5),
        }

    def block_shift(p, x):
        """dwconv as 49 pad+slice FMAs (no conv op -> no conv layout
        preferences), then the same folded-LN MLP as _block_xla_folded."""
        n, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        k = p["conv_dw"]["kernel"][:, :, 0, :].astype(jnp.float32)
        acc = jnp.broadcast_to(
            p["conv_dw"]["bias"].astype(jnp.float32), x.shape)
        for dy in range(7):
            for dx in range(7):
                acc = acc + xp[:, dy:dy + h, dx:dx + w, :].astype(jnp.float32) * k[dy, dx]
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc), axis=-1, keepdims=True) - jnp.square(mu)
        inv = jax.lax.rsqrt(var + EPS)
        gamma = p["norm"]["scale"].astype(jnp.float32)
        beta = p["norm"]["bias"].astype(jnp.float32)
        w1 = p["mlp"]["fc1"]["kernel"].astype(jnp.float32)
        b1 = p["mlp"]["fc1"]["bias"].astype(jnp.float32)
        wg = (gamma[:, None] * w1).astype(dt)
        gw = gamma @ w1
        bw = beta @ w1 + b1
        z = jnp.dot(acc.astype(dt), wg, preferred_element_type=jnp.float32)
        y = ((z - mu * gw) * inv + bw).astype(dt)
        y = gelu_fast(y)
        y = jnp.dot(y, p["mlp"]["fc2"]["kernel"].astype(dt),
                    preferred_element_type=jnp.float32)
        y = (y + p["mlp"]["fc2"]["bias"]).astype(dt)
        return x + y * p["gamma"].astype(dt)

    results = {}
    for s in [int(v) for v in args.stages.split(",")]:
        h, c = SHAPES[s]
        n = args.n
        p = make_params(c)
        xs = [jnp.asarray(rng.standard_normal((n, h, h, c)), dt)
              for _ in range(2)]
        variants = []
        if "xla" in args.variants:
            variants.append(("xla", jax.jit(_block_xla_folded)))
        if "shift" in args.variants:
            variants.append(("shift", jax.jit(block_shift)))
        if "pallas" in args.variants:
            variants.append(("pallas", jax.jit(
                lambda p_, x_: fused_convnext_block(x_, p_))))
        if "xla3" in args.variants:  # 3-block chain, per-block XLA
            def chain_xla(p_, x_):
                for _ in range(3):
                    x_ = _block_xla_folded(p_, x_)
                return x_
            variants.append(("xla3", jax.jit(chain_xla)))
        if "hybrid" in args.variants:  # XLA dwconv + Pallas LN/MLP/residual
            from genconvit_tpu.ops import conv2d
            from genconvit_tpu.ops.pallas.convnext_mlp import \
                fused_ln_mlp_residual

            def hybrid(p_, x_):
                dw = conv2d(x_, p_["conv_dw"]["kernel"], p_["conv_dw"]["bias"],
                            padding=3, groups=x_.shape[-1])
                return fused_ln_mlp_residual(dw, x_, p_)
            variants.append(("hybrid", jax.jit(hybrid)))
        if "hybrid3" in args.variants:  # 3-block hybrid chain
            from genconvit_tpu.ops import conv2d
            from genconvit_tpu.ops.pallas.convnext_mlp import \
                fused_ln_mlp_residual

            def hybrid3(p_, x_):
                for _ in range(3):
                    dw = conv2d(x_, p_["conv_dw"]["kernel"],
                                p_["conv_dw"]["bias"], padding=3,
                                groups=x_.shape[-1])
                    x_ = fused_ln_mlp_residual(dw, x_, p_)
                return x_
            variants.append(("hybrid3", jax.jit(hybrid3)))
        if "stage3b" in args.variants:  # 3-block chain, fused stage kernel
            from genconvit_tpu.ops.pallas.convnext_stage import \
                fused_convnext_stage

            variants.append(("stage3b", jax.jit(
                lambda p_, x_: fused_convnext_stage(x_, [p_, p_, p_]))))
        for name, fn in variants:
            try:
                np.asarray(fn(p, xs[0])[0, 0, 0])  # compile+sync
                # wall clocks through the relay are dispatch-contaminated for
                # sub-10ms kernels; use the device-side op times instead
                import shutil

                from tools.profile_forward import parse_xplane

                logdir = f"/tmp/gcv_mbs/{s}_{name}"
                shutil.rmtree(logdir, ignore_errors=True)
                os.makedirs(logdir, exist_ok=True)
                with jax.profiler.trace(logdir):
                    outs = [fn(p, xs[i % 2]) for i in range(args.iters)]
                    np.asarray(jnp.stack([o[0, 0, 0] for o in outs]))
                rows, _ = parse_xplane(logdir)
                dev_ms = sum(t for t, _ in rows.values()) / 1000 / args.iters
                results[(s, name)] = dev_ms
                print(f"stage{s} [{n},{h},{h},{c}] {name:7s} "
                      f"{dev_ms:7.2f} ms/launch (device)", file=sys.stderr,
                      flush=True)
            except Exception as e:
                print(f"stage{s} {name}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)

    print(results)


if __name__ == "__main__":
    main()
