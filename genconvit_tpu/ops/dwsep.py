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

from typing import Any, Dict, Tuple, Union

import numpy as np

RankSpec = Union[int, str]


def parse_rank_spec(rank: RankSpec) -> Tuple[str, float, int]:
    """Normalize a dw_rank knob value into (mode, energy_bar, max_rank).

    Accepted forms:
      R (int, or an int-like str)      -> ("fixed", 0.0, R)
      "auto:<energy>"                  -> ("auto", energy, 3)
      "auto:<energy>:<max_rank>"      -> ("auto", energy, max_rank)

    Auto mode picks a per-BLOCK rank: the smallest R such that every
    channel's retained SVD energy at rank R meets the bar; blocks needing
    more than max_rank stay EXACT (no factors attached — the per-block
    presence dispatch in models/convnext.py handles the mix natively).
    max_rank defaults to 3: at R=3 the separable path costs 42 taps vs the
    exact 49, already near the break-even of the two-pass overhead.
    """
    if isinstance(rank, int):
        return ("fixed", 0.0, rank)
    s = str(rank).strip()
    if not s.startswith("auto"):
        return ("fixed", 0.0, int(s or 0))
    parts = s.split(":")
    if len(parts) < 2 or len(parts) > 3:
        raise ValueError(f"bad dw_rank spec {rank!r}: want 'auto:<energy>"
                         f"[:<max_rank>]' or an integer rank")
    energy = float(parts[1])
    if not 0.0 < energy <= 1.0:
        raise ValueError(f"dw_rank auto energy bar must be in (0,1], "
                         f"got {energy}")
    max_rank = int(parts[2]) if len(parts) == 3 else 3
    if max_rank < 1:
        raise ValueError(f"dw_rank auto max_rank must be >=1, got {max_rank}")
    return ("auto", energy, max_rank)


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


def required_block_rank(kernel: Any, energy_bar: float) -> int:
    """Smallest rank R such that EVERY channel of this block's depthwise
    kernel retains >= energy_bar of its SVD energy at rank R."""
    k = np.asarray(kernel, np.float32)
    m = k[:, :, 0, :].transpose(2, 0, 1)                  # [C, kh, kw]
    s = np.linalg.svd(m, compute_uv=False)                # [C, r]
    s2 = s * s
    cum = np.cumsum(s2, axis=1) / np.maximum(
        s2.sum(axis=1, keepdims=True), 1e-30)             # [C, r] cumulative
    # per-channel first rank index meeting the bar (argmax of the bool mask)
    need = np.argmax(cum >= energy_bar - 1e-9, axis=1) + 1
    return int(need.max())


def add_dw_sep(params: Any, rank: RankSpec) -> Tuple[Any, Dict[str, float]]:
    """Attach separable factors beside depthwise convs in a param tree.

    Walks any nested dict/list tree; wherever a block dict holds a
    `conv_dw` entry with an HWIO [kh,kw,1,C] kernel, adds a sibling
    `conv_dw_sep = {"kr", "kc"}` (stored in the conv kernel's dtype; SVD in
    f32 of the stored — i.e. already bf16-rounded, matching the effective
    exact-path weights — values). Model forwards dispatch on the PRESENCE
    of `conv_dw_sep` (models/convnext.py `_dw_conv`), so the returned tree
    is self-describing and naturally re-keys every jit cache.

    `rank` is an int (fixed rank for every block) or an adaptive spec
    "auto:<energy>[:<max_rank>]" (parse_rank_spec): each block gets the
    smallest rank whose worst channel meets the energy bar; blocks that
    would need more than max_rank stay EXACT (no factors attached).

    Returns (new_tree, stats): retained-energy aggregates over the
    channels actually factorized {"count", "energy_mean", "energy_min"},
    plus {"blocks_sep", "blocks_exact", "rank_hist"} describing the
    per-block decisions ("rank_hist" maps rank -> block count; exact
    blocks appear under "blocks_exact" only).
    """
    mode, energy_bar, max_rank = parse_rank_spec(rank)
    energies = []
    rank_hist: Dict[int, int] = {}
    blocks_exact = 0

    def walk(node):
        nonlocal blocks_exact
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            cd = out.get("conv_dw")
            if (isinstance(cd, dict) and "kernel" in cd
                    and getattr(cd["kernel"], "ndim", 0) == 4
                    and cd["kernel"].shape[2] == 1):
                import jax.numpy as jnp

                r = max_rank
                if mode == "auto":
                    r = required_block_rank(cd["kernel"], energy_bar)
                    if r > max_rank:
                        blocks_exact += 1
                        return out
                kr, kc, energy = factorize_dw_kernel(cd["kernel"], r)
                dt = cd["kernel"].dtype
                out["conv_dw_sep"] = {"kr": jnp.asarray(kr, dt),
                                      "kc": jnp.asarray(kc, dt)}
                energies.append(energy)
                rank_hist[r] = rank_hist.get(r, 0) + 1
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
    stats["blocks_sep"] = float(sum(rank_hist.values()))
    stats["blocks_exact"] = float(blocks_exact)
    stats["rank_hist"] = {int(k): int(v) for k, v in sorted(rank_hist.items())}
    return tree, stats
