#!/usr/bin/env python
"""Train the on-device face detector from the reference's bundled media —
fully offline (no WIDER-FACE, no dlib): synthetic composites of the 166
dlib-cropped sample faces + skin-weak-labeled sample-video frames
(data/facedet_synth.py). Produces the checkpoint shipped as
genconvit_tpu/assets/facedet.gcv.

  python tools/train_facedet_synth.py \
      [--ref /root/reference] [--out genconvit_tpu/assets/facedet.gcv] \
      [--n 4096] [--epochs 8] [--batch 64]

Prints a held-out evaluation (mean IoU of the top detection on composites
built from UNSEEN faces) at the end.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def evaluate(params, faces, frames, n=128, seed=999):
    """Mean IoU of the best detection vs ground truth on single-face
    composites from held-out faces; also detection rate at IoU>=0.5."""
    import functools

    import jax
    import jax.numpy as jnp

    from genconvit_tpu.data.facedet_synth import composite_sample
    from genconvit_tpu.models.facedet import detect_batch

    rng = np.random.default_rng(seed)
    imgs, gts = [], []
    while len(imgs) < n:
        img, boxes = composite_sample(faces, frames, rng)
        if len(boxes) != 1:
            continue
        imgs.append(img)
        gts.append(boxes[0])
    fn = jax.jit(functools.partial(detect_batch, max_faces=1, score_thresh=0.1))
    scores, boxes = fn(params, jnp.asarray(np.stack(imgs)))
    boxes = np.asarray(boxes)[:, 0]
    scores = np.asarray(scores)[:, 0]
    ious = []
    for (cy, cx, h, w), (gcy, gcx, gh, gw), s in zip(boxes, gts, scores):
        if not np.isfinite(s):
            ious.append(0.0)
            continue
        t1, b1, l1, r1 = cy - h / 2, cy + h / 2, cx - w / 2, cx + w / 2
        t2, b2, l2, r2 = gcy - gh / 2, gcy + gh / 2, gcx - gw / 2, gcx + gw / 2
        ih = max(0.0, min(b1, b2) - max(t1, t2))
        iw = max(0.0, min(r1, r2) - max(l1, l2))
        inter = ih * iw
        union = h * w + gh * gw - inter
        ious.append(inter / max(union, 1e-9))
    ious = np.array(ious)
    return float(ious.mean()), float((ious >= 0.5).mean())


def main():
    p = argparse.ArgumentParser("train_facedet_synth")
    p.add_argument("--ref", default="/root/reference")
    p.add_argument("--out", default="genconvit_tpu/assets/facedet.gcv")
    p.add_argument("--n", type=int, default=6144,
                   help="pregenerated composite count (reused every epoch)")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("genconvit_tpu")

    from genconvit_tpu.core.checkpoint import save_checkpoint
    from genconvit_tpu.data.facedet_synth import (load_face_crops,
                                                  load_video_frames,
                                                  synth_dataset)
    from genconvit_tpu.train.facedet_train import train_facedet

    train_faces = load_face_crops(
        os.path.join(args.ref, "sample_train_data"), ("train", "valid"))
    heldout_faces = load_face_crops(
        os.path.join(args.ref, "sample_train_data"), ("test",))
    frames = []
    for sub in ("sample_prediction_data", "sample_videos_kaggle"):
        d = os.path.join(args.ref, sub)
        if os.path.isdir(d):
            frames.extend(load_video_frames(d))
    log.info("foregrounds: %d train / %d held-out faces; %d bg frames",
             len(train_faces), len(heldout_faces), len(frames))
    if not train_faces:
        sys.exit("no face crops found under --ref")

    # pregenerate once (host data-gen on this 1-core sandbox costs ~2.5min
    # per 3k samples — paying it once lets us afford 40+ epochs), reshuffled
    # per epoch
    log.info("pregenerating %d samples...", args.n)
    samples = list(synth_dataset(train_faces, frames, args.n, seed=args.seed))
    shuffle_rng = np.random.default_rng(args.seed + 1)

    class Reiterable:
        def __iter__(self):
            order = shuffle_rng.permutation(len(samples))
            return iter([samples[i] for i in order])

    steps = (args.n // args.batch) * args.epochs
    params = train_facedet(Reiterable(), epochs=args.epochs,
                           batch_size=args.batch, lr=args.lr, seed=args.seed,
                           cosine_decay_steps=steps)

    miou, det = evaluate(params, heldout_faces or train_faces, frames)
    log.info("held-out composites: mean IoU %.3f, det-rate@0.5 %.3f", miou, det)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_checkpoint(args.out, params,
                    extra={"kind": "facedet", "heldout_mean_iou": miou,
                           "heldout_det_rate_at_05": det})
    print(f"saved {args.out} (mean IoU {miou:.3f}, det@0.5 {det:.3f})")


if __name__ == "__main__":
    main()
