#!/usr/bin/env python
"""Convert reference torch .pth checkpoints (HuggingFace
genconvit_ed_inference.pth / genconvit_vae_inference.pth, or train.py saves)
into native genconvit_tpu checkpoints.

Usage:
  python convert_weights.py weight/genconvit_ed_inference.pth \
      [--out weight/genconvit_ed_inference.gcv] [--which ed|vae] [--no-dead]
"""

import argparse
import os

from genconvit_tpu.core.checkpoint import save_checkpoint
from genconvit_tpu.core.convert import convert_checkpoint, detect_branch, unwrap_state_dict
from genconvit_tpu.core.pytree import param_count


def main():
    p = argparse.ArgumentParser("convert_weights")
    p.add_argument("pth", help="torch checkpoint path")
    p.add_argument("--out", default=None)
    p.add_argument("--which", choices=["ed", "vae"], default=None)
    p.add_argument("--no-dead", action="store_true",
                   help="drop checkpoint-only parameter groups (SURVEY.md §8 B9)")
    p.add_argument("--strict", action="store_true",
                   help="fail unless every checkpoint key was consumed "
                        "(catches timm-layout misreadings; use on the "
                        "published HuggingFace weights)")
    args = p.parse_args()

    import torch

    obj = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = unwrap_state_dict(obj)
    which = args.which or detect_branch(sd)
    params = convert_checkpoint(obj, which=which,
                                carry_dead_params=not args.no_dead,
                                strict=args.strict)
    out = args.out or os.path.splitext(args.pth)[0] + ".gcv"
    epoch = obj.get("epoch", 0) if isinstance(obj, dict) else 0
    min_loss = obj.get("min_loss", 0.0) if isinstance(obj, dict) else 0.0
    save_checkpoint(out, params, epoch=int(epoch), min_loss=float(min_loss),
                    extra={"source": os.path.basename(args.pth), "branch": which})
    print(f"{args.pth} [{which}] -> {out}  ({param_count(params):,} params)")


if __name__ == "__main__":
    main()
