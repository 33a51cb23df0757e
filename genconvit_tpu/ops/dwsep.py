"""Rank-R separable depthwise factorization (opt-in approximate inference).

The ensemble launch is VPU-bound and the depthwise-7x7 convs sit at XLA's
~1.2 VPU-ops/tap floor (docs/performance.md) — the only lever below that
floor is FEWER TAPS. SVD-factorizing each channel's 7x7 filter into R
separable rank-1 terms (a 1x7 row pass + a 7x1 column pass each) costs 14R
taps vs 49: rank-1 measured 1.4-2.9x faster per stage, 1.98x
launch-equivalent on v5e (tools/microbench_dwsep.py).

This is an APPROXIMATION: a trained 7x7 depthwise filter is generally not
rank-1, and the residual (1 - retained SVD energy) is checkpoint-dependent.
It is therefore strictly opt-in — `KernelPlan.dw_rank` / `GENCONVIT_DW_RANK`,
default 0 = exact — applied by the inference engine at host-staging time
(never by training), and the engine logs the retained-energy statistics of
the actual weights so the approximation quality is visible per checkpoint.
Rank >= 7 reconstructs the 7x7 exactly (parity-tested in
tests/test_dwsep.py), which also validates the wiring independently of any
accuracy question.

Reference parity note: the reference has no such mode — its timm backbone
always runs the exact dense depthwise conv (ref: model/genconvit_ed.py:77-88
via timm convnext); dw_rank=0 keeps exact semantics everywhere.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def factorize_dw_kernel(kernel: Any, rank: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SVD-factorize a depthwise kernel into rank-R separable passes.

    kernel: [kh, kw, 1, C] (HWIO, groups=C). Returns (kr, kc, energy):
      kr [R, 1, kw, 1, C] — per-rank 1-D ROW filters (apply first),
      kc [R, kh, 1, 1, C] — per-rank 1-D COLUMN filters (apply second),
      energy [C]          — per-channel retained SVD energy in [0, 1].

    XLA convs are cross-correlations (no kernel flip, torch-compatible), so
    composing the 1x7 pass then the 7x1 pass applies the outer product
    col_r ⊗ row_r; summing over r reconstructs sum_r s_r u_r v_r^T — the
    best rank-R approximation of each channel's kh x kw filter.
    """
    k = np.asarray(kernel, np.float32)
    kh, kw, one, c = k.shape
    assert one == 1, f"expected depthwise HWIO kernel [kh,kw,1,C], got {k.shape}"
    m = k[:, :, 0, :].transpose(2, 0, 1)              # [C, kh, kw]
    u, s, vt = np.linalg.svd(m)                       # [C,kh,kh],[C,r],[C,kw,kw]
    r = min(rank, s.shape[1])
    sq = np.sqrt(s[:, :r])                            # split s across both passes
    col = u[:, :, :r] * sq[:, None, :]                # [C, kh, r]
    row = vt[:, :r, :] * sq[:, :, None]               # [C, r, kw]
    kr = row.transpose(1, 2, 0)[:, None, :, None, :]  # [r, 1, kw, 1, C]
    kc = col.transpose(2, 1, 0)[:, :, None, None, :]  # [r, kh, 1, 1, C]
    tot = np.sum(s * s, axis=1)
    energy = np.sum(s[:, :r] * s[:, :r], axis=1) / np.maximum(tot, 1e-30)
    return kr, kc, energy


def add_dw_sep(params: Any, rank: int) -> Tuple[Any, Dict[str, float]]:
    """Attach separable factors beside every depthwise conv in a param tree.

    Walks any nested dict/list tree; wherever a block dict holds a
    `conv_dw` entry with an HWIO [kh,kw,1,C] kernel, adds a sibling
    `conv_dw_sep = {"kr", "kc"}` (stored in the conv kernel's dtype; SVD in
    f32 of the stored — i.e. already bf16-rounded, matching the effective
    exact-path weights — values). Model forwards dispatch on the PRESENCE
    of `conv_dw_sep` (models/convnext.py `_dw_conv`), so the returned tree
    is self-describing and naturally re-keys every jit cache.

    Returns (new_tree, stats) with retained-energy aggregates over all
    factorized filters: {"count", "energy_mean", "energy_min"}.
    """
    energies = []

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            cd = out.get("conv_dw")
            if (isinstance(cd, dict) and "kernel" in cd
                    and getattr(cd["kernel"], "ndim", 0) == 4
                    and cd["kernel"].shape[2] == 1):
                import jax.numpy as jnp

                kr, kc, energy = factorize_dw_kernel(cd["kernel"], rank)
                dt = cd["kernel"].dtype
                out["conv_dw_sep"] = {"kr": jnp.asarray(kr, dt),
                                      "kc": jnp.asarray(kc, dt)}
                energies.append(energy)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    tree = walk(params)
    if energies:
        all_e = np.concatenate(energies)
        stats = {"count": float(len(all_e)),
                 "energy_mean": float(all_e.mean()),
                 "energy_min": float(all_e.min())}
    else:
        stats = {"count": 0.0, "energy_mean": 1.0, "energy_min": 1.0}
    return tree, stats
