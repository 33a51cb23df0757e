#!/usr/bin/env python
"""Distill the pretrained Haar cascade's real-frame detections into the
on-device jax face detector.

The jax detector (models/facedet.py, shipped checkpoint trained by
tools/train_facedet_synth.py) is limited by its synthetic-composite
training distribution: real-frame mean IoU 0.513 vs the curated fixture
(tests/fixtures/facedet_realframes.json). The system OpenCV Haar cascade is
real-face-trained and localizes better where it fires (native/gcv_facedet.cc)
— this tool uses it as a TEACHER:

  1. harvest: decode frames from the reference's bundled videos, run the
     STAGED SCORED cascade pipeline (confidence-thresholded frontal ->
     mirrored profile fallback -> dlib-geometry calibration), keep
     detections that agree with the per-video track median (faces in this
     footage move slowly, so temporal consensus filters the cascade's rare
     false positives);
  2. windows: turn each (frame, box) into training crops that mirror the
     pyramid-inference distribution (JaxFaceDetector._windows): square
     windows where the face occupies mostly 0.30-0.80 of the side with
     tails down to 0.15 and up to 0.92 (the scale-1 windows on 1080p
     footage see the face at ~0.15-0.4), plus the anisotropic full-frame
     squeeze, horizontal flips, photometric jitter, and face-free negative
     windows;
  2b. hard negatives (round-3 addition, VERDICT r4 #2): run the CURRENT
     student checkpoint's pyramid on the harvested frames; every student
     detection that does NOT overlap the teacher box becomes a dedicated
     negative training window (unless the real face substantially enters
     that window, in which case it becomes a corrective positive) — this
     targets exactly the false positives that cost fixture IoU;
  3. train: fine-tune the shipped checkpoint on real crops mixed with the
     synthetic composites (forgetting guard), cosine-decayed lr;
  4. eval: pyramid inference on the curated real-frame fixture
     (tools/facedet_realframe_fixture.py) + the synthetic held-out bar
     (tools/train_facedet_synth.evaluate).

Leakage protocol: --holdout videos (default 0048_fake.mp4.mp4,sample_3.mp4)
contribute NO training data and are reported separately in eval; frames at
the fixture's exact curated indices are excluded from harvest everywhere.

Usage:
  GENCONVIT_PLATFORM=cpu python tools/facedet_distill.py \
      [--out /tmp/facedet_distilled.gcv] [--epochs 10] [--lr 5e-4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = os.environ.get("GENCONVIT_REF", "/root/reference")
VIDEO_DIRS = ("sample_prediction_data", "sample_videos_kaggle")
DEFAULT_HOLDOUT = "0048_fake.mp4.mp4,sample_3.mp4"


def fixture_indices():
    """{video name: set(frame idx)} of curated fixture frames (excluded)."""
    from tools.facedet_realframe_fixture import FIXTURE

    out = {}
    if os.path.isfile(FIXTURE):
        with open(FIXTURE) as f:
            for key in json.load(f)["boxes"]:
                name, fi = key.rsplit("#", 1)
                out.setdefault(name, set()).add(int(fi))
    return out


def harvest(stride, holdout, max_per_video=150):
    """[(name, frame RGB, (t,r,b,l))] haar detections after track-median
    veto; holdout videos and curated fixture frame indices are skipped."""
    import cv2

    from genconvit_tpu.data.faces import HaarDetector, _box_iou

    det = HaarDetector()
    excluded = fixture_indices()
    kept = []
    for sub in VIDEO_DIRS:
        d = os.path.join(REF, sub)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.lower().endswith((".mp4", ".avi", ".mov")):
                continue
            if fn in holdout:
                print(f"  {fn}: HOLDOUT (no training data)")
                continue
            cap = cv2.VideoCapture(os.path.join(d, fn))
            frames, idxs = [], []
            i = 0
            while len(frames) < max_per_video:
                ok, fr = cap.read()
                if not ok:
                    break
                if i % stride == 0 and i not in excluded.get(fn, ()):
                    frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
                    idxs.append(i)
                i += 1
            cap.release()
            if not frames:
                continue
            dets = det.detect(np.stack(frames))
            hits = [(k, d[0]) for k, d in enumerate(dets) if d]
            if len(hits) < 5:
                print(f"  {fn}: haar fired on {len(hits)}/{len(frames)} "
                      f"frames — skipped (no reliable track)")
                continue
            arr = np.array([b for _, b in hits], np.float32)
            med = tuple(np.median(arr, axis=0))
            n0 = len(hits)
            hits = [(k, b) for k, b in hits if _box_iou(b, med) >= 0.2]
            print(f"  {fn}: kept {len(hits)}/{n0} haar detections "
                  f"({len(frames)} frames scanned)")
            kept += [(fn, frames[k], b) for k, b in hits]
    return kept


def _jitter(img, rng, p=0.35):
    """Photometric jitter: brightness/contrast shift on a fraction of crops
    (videos differ in exposure more than the synthetic composites do)."""
    if rng.random() >= p:
        return img
    a = rng.uniform(0.75, 1.25)   # contrast
    b = rng.uniform(-24, 24)      # brightness
    return np.clip(img.astype(np.float32) * a + b, 0, 255).astype(np.uint8)


def _sample_u(rng):
    """Face fraction of the window side: mass in the trained 0.30-0.80
    band, tails covering the scale-1 windows on 1080p (face ~0.15-0.4 of
    the short side) and extreme close-ups."""
    x = rng.random()
    if x < 0.70:
        return rng.uniform(0.30, 0.80)
    if x < 0.90:
        return rng.uniform(0.16, 0.30)
    return rng.uniform(0.80, 0.92)


def window_crops(harvested, rng, per_det=3, neg_frac=0.2, squeeze_frac=0.15,
                 flip_p=0.5):
    """(crop [128,128,3] u8, boxes [[cy,cx,h,w]]) samples mirroring the
    pyramid-inference window distribution."""
    import cv2

    from genconvit_tpu.models.facedet import INPUT_SIZE

    def emit(img, boxes):
        img = _jitter(img, rng)
        if rng.random() < flip_p:  # mirror: cx -> 1-cx
            img = img[:, ::-1].copy()
            boxes = [[cy, 1.0 - cx, h, w] for cy, cx, h, w in boxes]
        samples.append((img, boxes))

    samples = []
    for _, frame, (t, r, b, l) in harvested:
        H, W = frame.shape[:2]
        fside = max(b - t, r - l)
        for _ in range(per_det):
            if rng.random() < squeeze_frac:
                img = cv2.resize(frame, (INPUT_SIZE, INPUT_SIZE),
                                 interpolation=cv2.INTER_AREA)
                emit(img, [[(t + b) / 2 / H, (l + r) / 2 / W,
                            (b - t) / H, (r - l) / W]])
                continue
            u = _sample_u(rng)
            s = int(round(fside / u))
            s = min(s, H, W)
            if s < fside:  # face wider than the frame's short side
                continue
            t0_lo, t0_hi = max(0, b - s), min(t, H - s)
            l0_lo, l0_hi = max(0, r - s), min(l, W - s)
            if t0_lo > t0_hi or l0_lo > l0_hi:
                continue
            t0 = int(rng.integers(t0_lo, t0_hi + 1))
            l0 = int(rng.integers(l0_lo, l0_hi + 1))
            crop = frame[t0: t0 + s, l0: l0 + s]
            img = cv2.resize(crop, (INPUT_SIZE, INPUT_SIZE),
                             interpolation=cv2.INTER_AREA)
            emit(img, [[((t + b) / 2 - t0) / s,
                        ((l + r) / 2 - l0) / s,
                        (b - t) / s, (r - l) / s]])
        if rng.random() < neg_frac * per_det:
            # face-free window: same scale family, zero overlap with the box
            s = int(round(fside / rng.uniform(0.30, 0.80)))
            s = min(s, H, W)
            for _ in range(8):  # rejection-sample a non-overlapping window
                t0 = int(rng.integers(0, max(1, H - s + 1)))
                l0 = int(rng.integers(0, max(1, W - s + 1)))
                if min(b, t0 + s) - max(t, t0) <= 0 or \
                   min(r, l0 + s) - max(l, l0) <= 0:
                    crop = frame[t0: t0 + s, l0: l0 + s]
                    img = cv2.resize(crop, (INPUT_SIZE, INPUT_SIZE),
                                     interpolation=cv2.INTER_AREA)
                    samples.append((img, []))
                    break
    return samples


def hard_negatives(harvested, ckpt, rng, cap=1500, frames_per_video=30):
    """Student-FP mining (VERDICT r4 #2): run the CURRENT checkpoint's
    pyramid on a subsample of harvested frames; every student detection
    that does not overlap the teacher box becomes a dedicated negative
    window centered on the false positive (or a corrective positive when
    the real face substantially enters that window). These windows target
    exactly the mislocalizations that cost fixture IoU — generic random
    negatives almost never cover them."""
    import cv2

    from genconvit_tpu.data.faces import JaxFaceDetector, _box_iou
    from genconvit_tpu.models.facedet import INPUT_SIZE

    det = JaxFaceDetector(ckpt, score_thresh=0.3)
    by_video = {}
    for name, frame, box in harvested:
        by_video.setdefault(name, []).append((frame, box))
    out = []
    n_pos = 0
    for name, items in sorted(by_video.items()):
        if len(items) > frames_per_video:  # bound the pyramid cost
            sel = np.linspace(0, len(items) - 1, frames_per_video).astype(int)
            items = [items[i] for i in sel]
        found = det.detect(np.stack([f for f, _ in items]))
        for (frame, tbox), dets in zip(items, found):
            H, W = frame.shape[:2]
            t, r, b, l = tbox
            fh, fw = b - t, r - l
            for d in dets:
                if _box_iou(d, tbox) >= 0.10:
                    continue  # roughly right — not a hard negative
                dside = max(d[2] - d[0], d[1] - d[3])
                if dside <= 8:
                    continue
                s = int(round(dside / rng.uniform(0.35, 0.70)))
                s = max(16, min(s, H, W))
                cy, cx = (d[0] + d[2]) // 2, (d[3] + d[1]) // 2
                t0 = int(np.clip(cy - s // 2, 0, H - s))
                l0 = int(np.clip(cx - s // 2, 0, W - s))
                crop = frame[t0: t0 + s, l0: l0 + s]
                img = cv2.resize(crop, (INPUT_SIZE, INPUT_SIZE),
                                 interpolation=cv2.INTER_AREA)
                fcy, fcx = (t + b) / 2, (l + r) / 2
                inside = (t0 <= fcy <= t0 + s) and (l0 <= fcx <= l0 + s)
                frac = max(fh, fw) / s
                if inside and frac >= 0.16:
                    # the FP window actually contains the face: supervise
                    # the correct box instead of a blanket negative
                    boxes = [[(fcy - t0) / s, (fcx - l0) / s, fh / s, fw / s]]
                    n_pos += 1
                else:
                    ih = max(0, min(b, t0 + s) - max(t, t0))
                    iw = max(0, min(r, l0 + s) - max(l, l0))
                    if ih * iw > 0.25 * fh * fw:
                        continue  # partially-visible face: no clean label
                    boxes = []
                out.append((img, boxes))
                if len(out) >= cap:
                    print(f"hard negatives: cap {cap} hit "
                          f"({n_pos} corrective positives)")
                    return out
    print(f"hard negatives: {len(out)} windows "
          f"({n_pos} corrective positives)")
    return out


def main():
    p = argparse.ArgumentParser("facedet_distill")
    p.add_argument("--out", default="/tmp/facedet_distilled.gcv")
    p.add_argument("--init", default=None,
                   help="checkpoint to fine-tune (default: shipped asset; "
                        "'none' = from scratch)")
    p.add_argument("--stride", type=int, default=3)
    p.add_argument("--max-per-video", type=int, default=150)
    p.add_argument("--holdout", default=DEFAULT_HOLDOUT)
    p.add_argument("--per-det", type=int, default=3)
    p.add_argument("--hardneg", type=int, default=1500,
                   help="student-FP mining cap (0 disables)")
    p.add_argument("--synth-n", type=int, default=3072,
                   help="synthetic composites mixed in (forgetting guard)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; evaluate --init (or the asset)")
    args = p.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from genconvit_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from genconvit_tpu.data.faces import default_facedet_checkpoint
    from genconvit_tpu.data.facedet_synth import (load_face_crops,
                                                  load_video_frames,
                                                  synth_dataset)
    from genconvit_tpu.train.facedet_train import train_facedet
    from tools.facedet_realframe_fixture import evaluate
    from tools.train_facedet_synth import evaluate as synth_evaluate

    holdout = set(args.holdout.split(",")) if args.holdout else set()

    if not args.eval_only:
        print("harvesting haar detections...")
        harvested = harvest(args.stride, holdout,
                            max_per_video=args.max_per_video)
        rng = np.random.default_rng(args.seed)
        real = window_crops(harvested, rng, per_det=args.per_det)
        print(f"{len(harvested)} teacher detections -> {len(real)} "
              f"real-window training crops")
        if args.hardneg > 0:
            base = (args.init if args.init not in (None, "none")
                    else default_facedet_checkpoint())
            if base:
                print("mining student false positives...")
                real += hard_negatives(harvested, base, rng, cap=args.hardneg)

        train_faces = load_face_crops(
            os.path.join(REF, "sample_train_data"), ("train", "valid"))
        frames = []
        for sub in VIDEO_DIRS:
            d = os.path.join(REF, sub)
            if os.path.isdir(d):
                frames.extend(load_video_frames(d))
        synth = list(synth_dataset(train_faces, frames, args.synth_n,
                                   seed=args.seed))
        samples = real + synth
        print(f"training set: {len(real)} real + {len(synth)} synthetic")

        init = None
        if args.init != "none":
            ckpt = args.init or default_facedet_checkpoint()
            init = load_checkpoint(ckpt)["params"]
            print(f"fine-tuning from {ckpt}")

        shuffle_rng = np.random.default_rng(args.seed + 1)

        class Reiterable:
            def __iter__(self):
                order = shuffle_rng.permutation(len(samples))
                return iter([samples[i] for i in order])

        steps = (len(samples) // args.batch) * args.epochs
        params = train_facedet(Reiterable(), epochs=args.epochs,
                               batch_size=args.batch, lr=args.lr,
                               seed=args.seed, params=init,
                               cosine_decay_steps=steps)
        save_checkpoint(args.out, params, extra={"kind": "facedet",
                                                 "distilled": True})
        print(f"saved {args.out}")
        ckpt_for_eval = args.out
    else:
        ckpt_for_eval = args.init or default_facedet_checkpoint()

    print("\n== real-frame fixture (holdout videos were NOT trained on) ==")
    evaluate(backends=("jax",), checkpoint=ckpt_for_eval)

    print("\n== synthetic held-out bar (tests/test_facedet.py floor: "
          "mean IoU >= 0.5, det@0.5 >= 0.75) ==")
    heldout_faces = load_face_crops(
        os.path.join(REF, "sample_train_data"), ("test",))
    frames = []
    for sub in VIDEO_DIRS:
        d = os.path.join(REF, sub)
        if os.path.isdir(d):
            frames.extend(load_video_frames(d))
    params = load_checkpoint(ckpt_for_eval)["params"]
    miou, det = synth_evaluate(params, heldout_faces, frames)
    print(f"synthetic held-out: mean IoU {miou:.3f}, det@0.5 {det:.3f}")


if __name__ == "__main__":
    main()
