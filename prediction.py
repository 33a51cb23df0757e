#!/usr/bin/env python
"""GenConViT prediction CLI — flag-compatible with the reference's
prediction.py (ref prediction.py:269-338), TPU-native engine underneath.

Reference flags: --p --f --d --s --e --v --fp16. Note the reference's
--e/--v single-branch selection is unreachable (both flags carry defaults, so
net is always 'genconvit' — SURVEY.md §8 B14); we reproduce that default and
add a working `--net ed|vae|genconvit` override.

Extensions: --net, --face-backend, --weights-dir, --json-dir, --result-dir,
--deterministic-vae, --workers.
"""

import argparse
import logging
import os
import time

from genconvit_tpu.config import apply_size, load_config
from genconvit_tpu.infer.engine import Predictor
from genconvit_tpu.infer.result import attach_metadata, result_path, write_result
from genconvit_tpu.infer.walkers import WALKERS, vids

logging.basicConfig(level=logging.INFO, format="%(message)s")


def gen_parser() -> argparse.Namespace:
    p = argparse.ArgumentParser("GenConViT prediction (TPU)")
    p.add_argument("--p", type=str, help="video or directory path")
    p.add_argument("--f", type=int, default=15,
                   help="number of frames to process for prediction")
    p.add_argument("--d", type=str, default="other",
                   help="dataset type: dfdc, faceforensics, timit, celeb")
    p.add_argument("--s", type=str, help="model size: tiny, large")
    p.add_argument("--e", nargs="?", const="genconvit_ed_inference",
                   default="genconvit_ed_inference", help="weight for ed")
    p.add_argument("--v", "--value", dest="v", nargs="?",
                   const="genconvit_vae_inference",
                   default="genconvit_vae_inference", help="weight for vae")
    p.add_argument("--fp16", type=str, default=None,
                   help="half precision (maps to bfloat16 on TPU)")
    # --- extensions ---
    p.add_argument("--net", choices=["ed", "vae", "genconvit"],
                   default="genconvit", help="branch selection (working B14 fix)")
    p.add_argument("--face-backend", default=None,
                   help="jax|hybrid|haar|fullframe|center|skin|recorded")
    p.add_argument("--face-sidecar", default=None,
                   help="recorded-boxes JSON for --face-backend recorded "
                        "(from tools/record_reference_torch.py)")
    p.add_argument("--weights-dir", default="weight")
    p.add_argument("--json-dir", default="json_file")
    p.add_argument("--result-dir", default="result")
    p.add_argument("--deterministic-vae", action="store_true",
                   help="z = mu instead of eval-time sampling (quirk B4 off)")
    p.add_argument("--transfer-format", choices=["rgb", "yuv420"], default="rgb",
                   help="yuv420 halves host->device bytes (fullframe+native)")
    p.add_argument("--workers", type=int, default=8)
    return p.parse_args()


def main():
    start = time.perf_counter()
    args = gen_parser()
    if not args.p or not os.path.isdir(args.p):
        raise SystemExit(f"error: --p must name an existing directory "
                         f"(got {args.p!r})")
    config = load_config()
    if args.s:
        apply_size(config, args.s)
    config.weight_dir = args.weights_dir
    if args.face_sidecar:
        os.environ["GENCONVIT_FACE_SIDECAR"] = args.face_sidecar
        if args.face_backend is None:
            args.face_backend = "recorded"

    predictor = Predictor(
        config,
        net=args.net,
        ed_weight=args.e,
        vae_weight=args.v,
        fp16=bool(args.fp16),
        face_backend=args.face_backend,
        deterministic_vae=args.deterministic_vae,
        transfer_format=args.transfer_format,
    )

    dataset = args.d if args.d in ("dfdc", "faceforensics", "timit", "celeb") else "other"
    if dataset == "other":
        state = vids(predictor, args.p, args.f, workers=args.workers)
    else:
        walker = WALKERS[dataset]
        state = walker(predictor, args.p, args.f, workers=args.workers) \
            if dataset == "timit" else \
            walker(predictor, args.p, args.f, json_dir=args.json_dir,
                   workers=args.workers)

    runtime = time.perf_counter() - start
    attach_metadata(state.result, dataset=dataset, net=args.net,
                    num_frames=args.f, runtime_seconds=runtime)
    out = write_result(state.result, result_path(args.result_dir, dataset, args.net))
    if state.has_labels:
        labeled = len(state.y_true)  # unlabeled videos don't dilute accuracy
        print(f"accuracy: {state.correct}/{labeled}"
              f" = {state.correct / max(labeled, 1):.4f}")
    print(f"result written to {out}")
    print(f"\n\n--- {runtime:.2f} seconds ---")


if __name__ == "__main__":
    main()
