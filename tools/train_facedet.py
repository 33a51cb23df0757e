#!/usr/bin/env python
"""Train the on-device face detector from a WIDER-FACE-style annotation file.

Annotation JSON: {"<image path>": [[cy, cx, h, w], ...]} with normalized
box coords. Images are resized to 128x128.

Usage:
  python tools/train_facedet.py --ann boxes.json [--root .] \
      --out weight/facedet.gcv [--epochs 20] [--batch 32] [--lr 1e-3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def dataset(ann, root, input_size):
    import cv2

    for path, boxes in ann.items():
        img = cv2.imread(os.path.join(root, path), cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (input_size, input_size),
                         interpolation=cv2.INTER_AREA)
        yield img, boxes


def main():
    p = argparse.ArgumentParser("train_facedet")
    p.add_argument("--ann", required=True)
    p.add_argument("--root", default=".")
    p.add_argument("--out", default="weight/facedet.gcv")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from genconvit_tpu.core.checkpoint import save_checkpoint
    from genconvit_tpu.models.facedet import INPUT_SIZE
    from genconvit_tpu.train.facedet_train import train_facedet

    with open(args.ann) as f:
        ann = json.load(f)

    class Reiterable:
        def __iter__(self):
            return dataset(ann, args.root, INPUT_SIZE)

    params = train_facedet(Reiterable(), epochs=args.epochs,
                           batch_size=args.batch, lr=args.lr)
    save_checkpoint(args.out, params, extra={"kind": "facedet"})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
