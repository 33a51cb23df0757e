#!/usr/bin/env python
"""Plot training-history .pkl files (the loss/acc curves train.py saves
alongside each checkpoint) into one loss+accuracy figure.

The reference stores the same four lists but never plots them (ref
train.py:129-131 pickles [train_loss, train_acc, valid_loss, valid_acc]);
this closes the loop for the training report (docs/training_report.md).

Usage: python tools/plot_history.py weight/genconvit_ed_*.pkl \
           [more.pkl ...] [--out docs/img/training_curves.png]

Accepts either the 4-list pickle train.py writes or a history dict with
train_loss/train_acc/valid_loss/valid_acc keys (checkpoint 'history'
extras). Multiple files plot side-by-side panels labeled by basename.
"""

import argparse
import os
import pickle
import re
import sys


def load_history(path):
    with open(path, "rb") as f:
        h = pickle.load(f)
    if isinstance(h, dict):
        return (h["train_loss"], h["train_acc"],
                h["valid_loss"], h["valid_acc"])
    tl, ta, vl, va = h
    return tl, ta, vl, va


def label_of(path):
    base = os.path.basename(path)
    m = re.match(r"genconvit_(\w+?)_", base)
    return m.group(1) if m else os.path.splitext(base)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pkls", nargs="+")
    ap.add_argument("--out", default="docs/img/training_curves.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(args.pkls)
    fig, axes = plt.subplots(2, n, figsize=(5.2 * n, 6.4), squeeze=False)
    for ci, path in enumerate(args.pkls):
        tl, ta, vl, va = load_history(path)
        ep = range(len(tl))
        name = label_of(path)
        ax = axes[0][ci]
        ax.plot(ep, tl, label="train", color="#4053d3")
        ax.plot(ep, vl, label="valid", color="#dd2c2c")
        bi = min(range(len(vl)), key=vl.__getitem__)
        ax.axvline(bi, ls=":", color="gray", lw=1)
        ax.annotate(f"best {vl[bi]:.4f}\n@ep{bi}", (bi, vl[bi]),
                    textcoords="offset points", xytext=(6, 8), fontsize=8)
        ax.set_title(f"{name}: loss")
        ax.set_xlabel("epoch")
        ax.legend(fontsize=8)
        ax = axes[1][ci]
        ax.plot(ep, ta, label="train", color="#4053d3")
        ax.plot(ep, va, label="valid", color="#dd2c2c")
        ax.set_title(f"{name}: accuracy")
        ax.set_xlabel("epoch")
        ax.set_ylim(0, 1)
        ax.legend(fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
