#!/usr/bin/env python
"""On-chip numerical parity of the custom compute paths vs the reference XLA
graph at bf16 — catches Mosaic-lowering / fast-path regressions that
interpret-mode CPU tests (tests/test_pallas.py) cannot see.

Covers:
  1. Pallas fused ConvNeXt block  vs  _block_xla          (stage-1/2 shapes)
  2. Pallas fused window attention vs XLA attention       (shifted + plain)
  3. LN-folded inference block    vs  _block_xla          (all stage shapes)
  4. Rational bf16 GELU           vs  exact erf GELU

Run on the TPU:  python tools/onchip_parity.py
Exit code 0 = all within tolerance; prints one PASS/FAIL line per check.
Tolerances are bf16-scale (the compared graphs differ only in fp ordering).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILURES = []


def check(name, a, b, rel_tol):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(np.abs(a).max(), 1e-6)
    rel = np.abs(a - b).max() / scale
    ok = rel <= rel_tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel diff {rel:.2e} "
          f"(tol {rel_tol:.0e})")
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)

    from genconvit_tpu.models.convnext import (_block_xla, _block_xla_folded,
                                               init_convnext)
    from genconvit_tpu.ops.pallas.convnext_block import fused_convnext_block

    full = init_convnext(jax.random.PRNGKey(0))
    for (si, h, c) in ((0, 56, 96), (1, 28, 192), (2, 14, 384), (3, 7, 768)):
        p = dict(full["stages"][si]["blocks"][0])
        p["gamma"] = jnp.full((c,), 0.3, jnp.float32)  # realistic magnitude
        pc = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, p)
        x = jnp.asarray(rng.standard_normal((4, h, h, c)), jnp.bfloat16)
        ref = jax.jit(_block_xla)(pc, x)
        check(f"folded_block s{si} [{h}x{h}x{c}]",
              ref, jax.jit(_block_xla_folded)(pc, x), 3e-2)
        if h >= 28:  # Pallas kernel covers the big stages
            out = fused_convnext_block(x, pc)
            check(f"pallas_block s{si} [{h}x{h}x{c}]", ref, out, 3e-2)
        # hybrid LN+MLP+residual kernel (all stages)
        from genconvit_tpu.ops import conv2d
        from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

        dw = conv2d(x, pc["conv_dw"]["kernel"], pc["conv_dw"]["bias"],
                    padding=3, groups=c)
        check(f"pallas_mlp s{si} [{h}x{h}x{c}]",
              ref, fused_ln_mlp_residual(dw, x, pc), 3e-2)
        # int8 tails (KernelPlan.int8_mlp): int8 rounding ~0.4% of column
        # max stacks on the bf16 reference's own rounding; 'fc1' adds the
        # fixed 8-sigma activation-scale coarsening
        check(f"pallas_mlp_int8full s{si} [{h}x{h}x{c}]",
              ref, fused_ln_mlp_residual(dw, x, pc, int8="full"), 4e-2)
        check(f"pallas_mlp_int8fc1 s{si} [{h}x{h}x{c}]",
              ref, fused_ln_mlp_residual(dw, x, pc, int8="fc1"), 4e-2)
        # padded-channel stage path (the GENCONVIT_PALLAS=mlp integration)
        from genconvit_tpu.models.convnext import _apply_stage_mlp_kernel

        check(f"pallas_mlp_padded_stage s{si} [{h}x{h}x{c}]",
              ref, _apply_stage_mlp_kernel([pc], x), 3e-2)
        if c % 128 == 0:  # stage kernel: Mosaic-compilable for C%128==0
            from genconvit_tpu.ops.pallas.convnext_stage import \
                fused_convnext_stage

            check(f"pallas_stage s{si} [{h}x{h}x{c}]",
                  ref, fused_convnext_stage(x, [pc]), 3e-2)

    # --- window attention (plain + shifted mask) -------------------------
    from genconvit_tpu.models.swin import (_window_attention, init_swin,
                                           shifted_window_mask)

    sp = init_swin(jax.random.PRNGKey(1))
    blk = sp["layers"][0]["blocks"][0]["attn"]
    blk = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, blk)
    wins = jnp.asarray(rng.standard_normal((64, 49, 96)), jnp.bfloat16)

    def attn(x, mask, use_pallas):
        if not use_pallas:
            os.environ["GENCONVIT_PALLAS"] = "0"
        else:
            os.environ["GENCONVIT_PALLAS"] = "1"
        try:
            return _window_attention(blk, x, 3, 7, mask)
        finally:
            os.environ.pop("GENCONVIT_PALLAS", None)

    check("window_attention plain",
          attn(wins, None, False), attn(wins, None, True), 3e-2)
    mask = jnp.asarray(shifted_window_mask(56, 56, 7, 3))
    check("window_attention shifted",
          attn(wins, mask, False), attn(wins, mask, True), 3e-2)

    # --- rational GELU ---------------------------------------------------
    from genconvit_tpu.ops.act import gelu_fast

    x = jnp.asarray(rng.standard_normal(100000) * 3, jnp.bfloat16)
    exact = jax.jit(lambda v: jax.nn.gelu(
        v.astype(jnp.float32), approximate=False).astype(jnp.bfloat16))(x)
    check("rational_gelu bf16", exact, jax.jit(gelu_fast)(x), 1e-2)

    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall on-chip parity checks passed")


if __name__ == "__main__":
    main()
