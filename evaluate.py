#!/usr/bin/env python
"""Standalone ImageFolder evaluation — a *working* equivalent of the
reference's broken evaluate_genconvit.py (its genconvit_standalone import
doesn't exist — SURVEY.md §8 B13; intended surface: classification report,
confusion matrix, ROC-AUC, plots over an ImageFolder split,
ref evaluate_genconvit.py:85-207).

Usage: python evaluate.py --data <dir> [--split test] [--net ed|vae|genconvit]
"""

import argparse
import logging
import os

import numpy as np

from genconvit_tpu.config import load_config
from genconvit_tpu.data.folder import FolderDataset

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    p = argparse.ArgumentParser("evaluate GenConViT on an ImageFolder split")
    p.add_argument("--data", required=True, help="ImageFolder root")
    p.add_argument("--split", default="test", help="subdir (test/valid/train), "
                   "or '.' if --data is already a class folder root")
    p.add_argument("--net", choices=["ed", "vae", "genconvit"], default="genconvit")
    p.add_argument("--weights-dir", default="weight")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--out-dir", default="result/eval")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from genconvit_tpu.infer.engine import Predictor

    config = load_config()
    if args.img_size:
        config.img_size = args.img_size
        config.model.latent_dims = config.derived_latent_dims()
    config.weight_dir = args.weights_dir
    predictor = Predictor(config, net=args.net)

    split_dir = args.data if args.split == "." else os.path.join(args.data, args.split)
    ds = FolderDataset(split_dir, config.img_size)
    print(f"{len(ds)} images, classes {ds.classes}")

    net = args.net

    @jax.jit
    def forward(params, images_u8, rng):
        from genconvit_tpu.data.preprocess import normalize_batch
        from genconvit_tpu.models.genconvit import genconvit_apply

        x = normalize_batch(images_u8, predictor.dtype)
        logits, _ = genconvit_apply(params, x, net=net, rng=rng)
        if net == "genconvit":  # average the two branch blocks
            n = x.shape[0]
            logits = (logits[:n] + logits[n:]) / 2
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    y_true, y_prob = [], []
    key = jax.random.PRNGKey(0)
    for imgs, labels in ds.batches(args.batch_size):
        key, k = jax.random.split(key)
        probs = np.asarray(forward(predictor.params, jnp.asarray(imgs), k))
        y_true.extend(labels.tolist())
        y_prob.extend(probs[: len(labels), 1].tolist())  # P(class 1)

    y_true = np.array(y_true)
    y_prob = np.array(y_prob)
    y_pred = (y_prob >= 0.5).astype(int)

    from sklearn.metrics import (classification_report, confusion_matrix,
                                 roc_auc_score)

    print(classification_report(y_true, y_pred, target_names=ds.classes,
                                zero_division=0))
    cm = confusion_matrix(y_true, y_pred)
    print("confusion matrix:\n", cm)
    if len(set(y_true.tolist())) > 1:
        print(f"ROC-AUC: {roc_auc_score(y_true, y_prob):.4f}")

    os.makedirs(args.out_dir, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(cm, cmap="Blues")
    for r in range(cm.shape[0]):
        for c in range(cm.shape[1]):
            ax.text(c, r, str(cm[r, c]), ha="center", va="center")
    ax.set_xticks(range(len(ds.classes)), ds.classes)
    ax.set_yticks(range(len(ds.classes)), ds.classes)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    out = os.path.join(args.out_dir, "confusion_matrix.png")
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
