#!/usr/bin/env python
"""Measure what GENCONVIT_DW_RANK=R actually does to this checkpoint's
predictions: exact vs rank-R outputs on the bundled sample videos.

The rank-R separable depthwise mode (ops/dwsep.py) is an approximation
whose error depends entirely on the SVD residual of the *loaded* 7x7
depthwise filters — retained energy is logged at engine prep, but energy is
an indirect proxy. This tool reports the direct quantity: per-video
probability deltas and verdict flips between the exact model and the
rank-R model, using identical face crops and identical VAE sampling keys.

With random-init weights (no weight/ directory) the numbers characterize
random filters only — and read as ~0 delta, which is NOT evidence the mode
is safe: timm init puts layer-scale gamma at 1e-6, so every block's
(approximated) contribution is suppressed to ~1e-6 of the residual stream
(measured: max |prob delta| 0.0 over the 8 samples, energy mean 0.415).
Trained checkpoints have O(1) gammas; run this in a weights-enabled
environment for the number that matters, exactly like the parity runbook
(docs/parity_runbook.md). Reference workload: 15-frame prediction over the
sample videos, ref model/pred_func.py:111-131.

Usage: python tools/dwrank_sensitivity.py [--rank 1] [--frames 15]
           [--dir /root/reference/sample_prediction_data] [--net genconvit]

Output: one JSON line with per-video prob pairs, max/mean |delta|, flips.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", default="1",
                    help="integer rank or adaptive 'auto:<energy>[:<max>]'; "
                         "comma-separate to sweep several in one process "
                         "(shared predictor, crops, and VAE keys)")
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--dir", default="/root/reference/sample_prediction_data")
    ap.add_argument("--net", default="genconvit")
    ap.add_argument("--face-backend", default=None)
    ap.add_argument("--ed", default=None,
                    help="explicit ED weight path (e.g. the trained "
                         "weight/genconvit_ed_best.gcv)")
    ap.add_argument("--vae", default=None, help="explicit VAE weight path")
    args = ap.parse_args()

    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor
    from genconvit_tpu.ops.kernel_plan import KernelPlan

    vids = sorted(
        os.path.join(args.dir, f) for f in os.listdir(args.dir)
        if f.lower().endswith((".mp4", ".avi", ".mov")))
    if not vids:
        print(json.dumps({"error": f"no videos under {args.dir}"}))
        return 1

    cfg = Config()
    # Force the EXACT baseline regardless of env: with GENCONVIT_DW_RANK
    # exported (the likely state when evaluating this mode) an inherited
    # from_env() plan would attach separable factors at engine init and
    # this tool would compare rank-R against rank-R — a vacuous 0-delta.
    import dataclasses
    base = dataclasses.replace(KernelPlan.from_env(), dw_rank=0)
    # ONE predictor; the exact and rank-R param trees share every leaf except
    # the attached factors, and the engine's jit re-keys on tree structure —
    # so both paths see identical crops, dtype, and per-video sampling keys.
    pred = Predictor(cfg, net=args.net,
                     ed_weight=args.ed, vae_weight=args.vae,
                     face_backend=args.face_backend,
                     kernel_plan=base)
    from genconvit_tpu.ops.dwsep import add_dw_sep

    params_exact = pred.params
    crops = [(v, pred.extract_faces(v, args.frames)) for v in vids]
    rc = 0
    for rank_s in args.rank.split(","):
        rank = rank_s if rank_s.startswith("auto") else int(rank_s)
        params_sep, stats = add_dw_sep(params_exact, rank)
        print(f"rank={rank}: {int(stats['count'])} filter-channels across "
              f"{int(stats['blocks_sep'])} blocks (rank mix "
              f"{stats['rank_hist']}, {int(stats['blocks_exact'])} exact), "
              f"retained energy mean {stats['energy_mean']:.4f} "
              f"min {stats['energy_min']:.4f}", file=sys.stderr)

        rows = []
        for v, faces in crops:
            out = {"video": os.path.basename(v)}
            for tag, p in (("exact", params_exact), ("sep", params_sep)):
                pred.params = p
                pred._rng = __import__("jax").random.PRNGKey(0)  # same VAE keys
                pred._video_counter = 0
                label, prob = pred.predict_faces(faces, args.frames)
                out[f"label_{tag}"] = label
                out[f"prob_{tag}"] = round(float(prob), 5)
            out["delta"] = round(abs(out["prob_exact"] - out["prob_sep"]), 5)
            out["flip"] = out["label_exact"] != out["label_sep"]
            rows.append(out)
            print(f"  {out['video']}: exact {out['prob_exact']:.4f} vs "
                  f"rank{rank_s} {out['prob_sep']:.4f} "
                  f"(|d|={out['delta']:.4f}{', FLIP' if out['flip'] else ''})",
                  file=sys.stderr)

        deltas = [r["delta"] for r in rows]
        print(json.dumps({
            "rank": rank_s,
            "net": args.net,
            "videos": len(rows),
            "rank_hist": stats["rank_hist"],
            "blocks_exact": int(stats["blocks_exact"]),
            "energy_mean": round(stats["energy_mean"], 4),
            "max_abs_prob_delta": round(max(deltas), 5),
            "mean_abs_prob_delta": round(float(np.mean(deltas)), 5),
            "verdict_flips": sum(r["flip"] for r in rows),
            "weights": {"ed": args.ed or "default-lookup",
                        "vae": args.vae or "default-lookup"},
            "per_video": rows,
        }), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
