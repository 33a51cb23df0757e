#!/usr/bin/env python
"""Metrics-enabled prediction CLI — equivalent of the reference's
prediction_v2.py (ref prediction_v2.py:320-521): same spine as prediction.py
plus sklearn metrics and a metadata block (incl. runtime_seconds) embedded in
the result JSON (schema: ref docs/comparison_tools.md:77-105).

--arch-type v2 is accepted for compatibility; the reference's "v2"
architecture is behaviorally identical to the original (its SwiGLU module is
never instantiated — SURVEY.md §8 B12), so both arch types run the same
graph here. --use-attention/--use-residual are accepted and ignored, exactly
as in the reference (ref prediction_v2.py:382-387).

Ground-truth: the v2 CLI's own label heuristics (v2_labels=True in
infer/walkers.py) — flat dirs by filename-contains-'fake'
(ref prediction_v2.py:68), DFDC by the '_0.mp4' suffix (ref :185), timit
walking real dirs too (ref :223-232). Documented deviation: the reference
embeds the metrics block only for vids/dfdc/faceforensics and merely PRINTS
metrics for timit/celeb (ref :258-265,308-315); this CLI embeds the same
metrics for every dataset (a superset — offline consumers that ignore the
block are unaffected).
"""

import argparse
import logging
import time

from genconvit_tpu.config import apply_size, load_config
from genconvit_tpu.infer.engine import Predictor
from genconvit_tpu.infer.result import (attach_metadata, attach_metrics,
                                        result_path, write_result)
from genconvit_tpu.infer.walkers import WALKERS, vids

logging.basicConfig(level=logging.INFO, format="%(message)s")


def gen_parser() -> argparse.Namespace:
    p = argparse.ArgumentParser("GenConViT prediction v2 (TPU)")
    p.add_argument("--p", type=str, help="video or directory path")
    p.add_argument("--f", type=int, default=15)
    p.add_argument("--d", type=str, default="other")
    p.add_argument("--s", type=str)
    p.add_argument("--e", nargs="?", const="genconvit_ed_inference",
                   default="genconvit_ed_inference")
    p.add_argument("--v", "--value", dest="v", nargs="?",
                   const="genconvit_vae_inference",
                   default="genconvit_vae_inference")
    p.add_argument("--fp16", type=str, default=None)
    p.add_argument("--arch-type", choices=["original", "v2"], default="original",
                   help="accepted for compatibility; v2 == original (B12)")
    p.add_argument("--use-attention", action="store_true", help="ignored (B12)")
    p.add_argument("--use-residual", action="store_true", help="ignored (B12)")
    p.add_argument("--net", choices=["ed", "vae", "genconvit"], default="genconvit")
    p.add_argument("--face-backend", default=None)
    p.add_argument("--transfer-format", choices=["rgb", "yuv420"], default="rgb")
    p.add_argument("--weights-dir", default="weight")
    p.add_argument("--json-dir", default="json_file")
    p.add_argument("--result-dir", default="result")
    p.add_argument("--workers", type=int, default=8)
    return p.parse_args()


def main():
    start = time.perf_counter()
    args = gen_parser()
    config = load_config()
    if args.s:
        apply_size(config, args.s)
    config.weight_dir = args.weights_dir

    predictor = Predictor(config, net=args.net, ed_weight=args.e,
                          vae_weight=args.v, fp16=bool(args.fp16),
                          face_backend=args.face_backend,
                          transfer_format=args.transfer_format)

    # v2_labels: the v2 CLI carries its OWN ground-truth heuristics —
    # flat dirs label by filename-contains-'fake' (ref prediction_v2.py:68),
    # DFDC by the '_0.mp4' suffix (ref :185), timit walks real dirs too
    # (ref :223-232) — so the metrics block populates where the reference's
    # does (v1 leaves those unlabeled).
    dataset = args.d if args.d in WALKERS else "other"
    if dataset == "other":
        state = vids(predictor, args.p, args.f, workers=args.workers,
                     v2_labels=True)
    elif dataset == "timit":
        state = WALKERS[dataset](predictor, args.p, args.f,
                                 workers=args.workers, v2_labels=True)
    else:
        state = WALKERS[dataset](predictor, args.p, args.f,
                                 json_dir=args.json_dir, workers=args.workers,
                                 v2_labels=True)

    runtime = time.perf_counter() - start
    attach_metrics(state.result, state.y_true, state.y_pred)
    attach_metadata(state.result, dataset=dataset, net=args.net,
                    num_frames=args.f, runtime_seconds=runtime,
                    extra={"arch_type": args.arch_type,
                           "model_size": args.s or "tiny",
                           "stage_timers": predictor.timers.summary()})
    out = write_result(state.result,
                       result_path(args.result_dir, dataset,
                                   f"{args.net}_{args.arch_type}"))
    if state.result.get("metrics"):
        print("metrics:", state.result["metrics"])
    print(f"result written to {out}")
    print(f"\n\n--- {runtime:.2f} seconds ---")


if __name__ == "__main__":
    main()
