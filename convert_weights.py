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
    p.add_argument("pth", nargs="?", help="torch checkpoint path")
    p.add_argument("--out", default=None)
    p.add_argument("--which", choices=["ed", "vae"], default=None)
    p.add_argument("--no-dead", action="store_true",
                   help="drop checkpoint-only parameter groups (SURVEY.md §8 B9)")
    p.add_argument("--strict", action="store_true",
                   help="fail unless every checkpoint key was consumed "
                        "(catches timm-layout misreadings; use on the "
                        "published HuggingFace weights)")
    p.add_argument("--preflight", metavar="MANIFEST_JSON",
                   help="dry-run the strict conversion against a key/shape "
                        "manifest recorded by tools/record_reference_torch.py "
                        "--manifest (no weights or torch needed); exits "
                        "non-zero on any naming/shape drift")
    p.add_argument("--expect-init", action="store_true",
                   help="with --preflight: also check the converted tree's "
                        "leaf shapes against this framework's init tree at "
                        "the default 224 config (jax.eval_shape — catches "
                        "dimension drift the transposes pass through); use "
                        "on the real published checkpoints")
    args = p.parse_args()

    if args.preflight:
        import json
        import sys

        from genconvit_tpu.core.convert import preflight_manifest

        with open(args.preflight) as f:
            manifest = json.load(f)
        expected = None
        if args.expect_init:
            import jax

            from genconvit_tpu.config import load_config
            from genconvit_tpu.core.convert import detect_branch, state_dict_from_manifest
            from genconvit_tpu.models.genconvit import init_genconvit

            config = load_config()
            branch = args.which or detect_branch(
                state_dict_from_manifest(manifest))
            expected = jax.eval_shape(
                lambda k: init_genconvit(k, config, branch),
                jax.random.PRNGKey(0))[branch]
        report = preflight_manifest(manifest, which=args.which,
                                    carry_dead_params=not args.no_dead,
                                    expected=expected)
        print(json.dumps(report, indent=2))
        if report["ok"]:
            print(f"PREFLIGHT OK: the converter consumes all "
                  f"{report['keys']} keys of this {report['branch']} "
                  f"checkpoint layout")
        sys.exit(0 if report["ok"] else 1)

    if not args.pth:
        p.error("pass a .pth checkpoint (or --preflight MANIFEST_JSON)")

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
