#!/usr/bin/env python
"""GenConViT training CLI — flag-compatible with the reference train.py
(ref train.py:161-196: -e/--epoch, -v/--version, -d/--dir, -m/--model,
-p/--pretrained, -t/--test, -b/--batch_size), TPU-native loop underneath.

Extensions: --kl (enable the KL term the reference leaves commented out),
--save-best (fork-style best-val checkpointing), --img-size, --seed.
"""

import argparse
import logging
import time

from genconvit_tpu.config import load_config
from genconvit_tpu.train.loop import train_model

import jax.numpy as jnp  # after genconvit_tpu: GENCONVIT_PLATFORM pinning

logging.basicConfig(level=logging.INFO, format="%(message)s")


def gen_parser() -> argparse.Namespace:
    p = argparse.ArgumentParser("Train GenConViT model (TPU)")
    p.add_argument("-e", "--epoch", type=int, default=None,
                   help="number of training epochs")
    p.add_argument("-v", "--version", default=None, help="version 0.1")
    p.add_argument("-d", "--dir", required=True, help="training data path")
    p.add_argument("-m", "--model", default="vae",
                   help="model variant: ed or vae (or genconvit for joint)")
    p.add_argument("-p", "--pretrained", default=None,
                   help="checkpoint to resume from")
    p.add_argument("-t", "--test", default=None,
                   help="run test on the test split after training")
    p.add_argument("-b", "--batch_size", default=None, help="batch size")
    p.add_argument("--kl", action="store_true",
                   help="enable the VAE KL loss term (reference keeps it off)")
    p.add_argument("--save-best", action="store_true")
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--weight-dir", default="weight")
    p.add_argument("--vae-variant", choices=["original", "updated"],
                   default=None,
                   help="'updated' = the train_updated.py variant (fixed "
                        "reparameterization, Tanh decoder, dropout head — "
                        "ref model/genconvit_vae_updated.py)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 forward/backward, "
                        "f32 master weights + Adam state (f32 = the "
                        "torch-parity default)")
    return p.parse_args()


def main():
    start = time.perf_counter()
    args = gen_parser()
    config = load_config()
    if args.img_size:
        config.img_size = args.img_size
        config.model.latent_dims = config.derived_latent_dims()
    if args.vae_variant:
        config.model.vae_variant = args.vae_variant
    mod = "ed" if args.model == "ed" else ("genconvit" if args.model == "genconvit" else "vae")
    epochs = args.epoch if args.epoch else config.epoch
    batch_size = int(args.batch_size) if args.batch_size else config.batch_size
    train_model(
        args.dir, mod, epochs,
        pretrained=args.pretrained,
        test_model=bool(args.test),
        batch_size=batch_size,
        config=config,
        weight_dir=args.weight_dir,
        seed=args.seed,
        use_kl=args.kl,
        save_best=args.save_best,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    print(f"\n\n--- {time.perf_counter() - start:.2f} seconds ---")


if __name__ == "__main__":
    main()
