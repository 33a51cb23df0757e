#!/usr/bin/env python
"""Verdict sensitivity to the face-detector backend: same checkpoint, same
VAE sampling keys, crops from backend A vs backend B on the bundled sample
videos.

The production question behind the jax-vs-hybrid detector choice is not
box IoU (tools/facedet_realframe_fixture.py measures that) but whether the
*verdicts* move when the crop geometry changes. This tool answers it
directly: per-video probability deltas and verdict flips between two
detector backends, holding the model, weights, dtype, and per-video VAE
keys fixed. Reference workload: 15-frame prediction over the sample
videos through dlib-HOG crops, ref model/pred_func.py:70-92,111-131.

With random-init weights the probs sit near 0.5 and flips are noise; run
with trained checkpoints (--ed/--vae) for the number that matters.

Usage: python tools/crop_sensitivity.py [--backends jax,hybrid]
           [--jax-checkpoint /tmp/facedet_r5.gcv] [--frames 15]
           [--ed weight/genconvit_ed_best.gcv] [--vae ...] [--net ed]

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
    ap.add_argument("--backends", default="jax,hybrid",
                    help="two detector backends, comma-separated; the first "
                         "is the candidate, the second the baseline")
    ap.add_argument("--jax-checkpoint", default=None,
                    help="explicit checkpoint for the jax backend (default: "
                         "the shipped asset)")
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--dir", default="/root/reference/sample_prediction_data")
    ap.add_argument("--net", default="genconvit")
    ap.add_argument("--ed", default=None,
                    help="explicit ED weight path (e.g. the trained "
                         "weight/genconvit_ed_best.gcv)")
    ap.add_argument("--vae", default=None, help="explicit VAE weight path")
    args = ap.parse_args()

    from genconvit_tpu.config import Config
    from genconvit_tpu.data.faces import make_detector
    from genconvit_tpu.infer.engine import Predictor

    vids = sorted(
        os.path.join(args.dir, f) for f in os.listdir(args.dir)
        if f.lower().endswith((".mp4", ".avi", ".mov")))
    if not vids:
        print(json.dumps({"error": f"no videos under {args.dir}"}))
        return 1

    cand, base = args.backends.split(",")
    kwargs = {"jax": ({"checkpoint": args.jax_checkpoint}
                      if args.jax_checkpoint else {})}
    dets = {b: make_detector(b, **kwargs.get(b, {})) for b in (cand, base)}

    pred = Predictor(Config(), net=args.net,
                     ed_weight=args.ed, vae_weight=args.vae)
    # crops per backend, decoded once per video (extract_faces re-decodes;
    # acceptable at 8 videos — identical frame stepping both times)
    import jax as _jax

    rows = []
    for v in vids:
        out = {"video": os.path.basename(v)}
        for tag, b in (("cand", cand), ("base", base)):
            pred.detector = dets[b]
            faces = pred.extract_faces(v, args.frames)
            pred._rng = _jax.random.PRNGKey(0)  # same VAE keys per backend
            pred._video_counter = 0
            if faces is None or len(faces) == 0:
                out[f"label_{tag}"], out[f"prob_{tag}"] = 0, 0.5  # B2 default
            else:
                label, prob = pred.predict_faces(faces, args.frames)
                out[f"label_{tag}"] = label
                out[f"prob_{tag}"] = round(float(prob), 5)
        out["delta"] = round(abs(out["prob_cand"] - out["prob_base"]), 5)
        out["flip"] = out["label_cand"] != out["label_base"]
        rows.append(out)
        print(f"  {out['video']}: {cand} {out['prob_cand']:.4f} vs "
              f"{base} {out['prob_base']:.4f} "
              f"(|d|={out['delta']:.4f}{', FLIP' if out['flip'] else ''})",
              file=sys.stderr)

    deltas = [r["delta"] for r in rows]
    print(json.dumps({
        "candidate": cand,
        "baseline": base,
        "jax_checkpoint": args.jax_checkpoint or "shipped-asset",
        "net": args.net,
        "videos": len(rows),
        "max_abs_prob_delta": round(max(deltas), 5),
        "mean_abs_prob_delta": round(float(np.mean(deltas)), 5),
        "verdict_flips": sum(r["flip"] for r in rows),
        "weights": {"ed": args.ed or "default-lookup",
                    "vae": args.vae or "default-lookup"},
        "per_video": rows,
    }, ), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
