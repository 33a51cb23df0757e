#!/usr/bin/env python
"""Fit + validate the cascade box calibration (faces.HAAR_CALIBRATION).

Reproduces the committed constants and the honest-generalization number:

  fit     re-derive HAAR_CALIBRATION from the curated real-frame fixture
          (tests/fixtures/facedet_realframes.json): per-cascade medians of
          (dx_facing, dy, w_ratio, h_ratio) over matched detections
          (IoU >= 0.1), profile L/R pooled in facing-normalized
          coordinates. Prints the constants next to the committed ones.
  loocv   leave-one-video-out cross-validation of the FULL hybrid pipeline
          (staged scored cascades + calibration + jax fusion/fallback):
          for each fixture video, calibration is refit WITHOUT it and the
          pipeline evaluated on it. This is the number quoted as "LOO-CV"
          in STATUS.md/faces.py — the committed all-data constants cannot
          be honestly evaluated on the same 119 frames they were fit to.

Both stages re-decode fixture frames from the reference sample mount
(pixels are never committed). Reference crop-geometry stakes:
model/pred_func.py:67-92 — the dlib-HOG box convention feeds the model.

Usage:
  GENCONVIT_PLATFORM=cpu python tools/facedet_calibrate.py fit
  GENCONVIT_PLATFORM=cpu python tools/facedet_calibrate.py loocv
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def load_fixture_frames():
    """{video: (frames [N,H,W,3] RGB, [gt boxes])} from the curated fixture."""
    import cv2

    from tools.facedet_realframe_fixture import FIXTURE, SAMPLE_DIR

    with open(FIXTURE) as f:
        fixture = json.load(f)["boxes"]
    by_video = {}
    for key, e in fixture.items():
        name, fi = key.rsplit("#", 1)
        by_video.setdefault(name, []).append((int(fi), e["box"]))
    out = {}
    for name, items in sorted(by_video.items()):
        cap = cv2.VideoCapture(os.path.join(SAMPLE_DIR, name))
        frames, gts = [], []
        for fi, box in sorted(items):
            cap.set(cv2.CAP_PROP_POS_FRAMES, fi)
            ok, fr = cap.read()
            if ok:
                frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
                gts.append(tuple(box))
        cap.release()
        if frames:
            out[name] = (np.stack(frames), gts)
    return out


def raw_detections(frames_by_video):
    """{video: per-frame [(label, weight, box, mirrored)]} from the scored
    shim — frontal + profile + mirrored profile, uncalibrated."""
    import ctypes

    import cv2

    from genconvit_tpu.data.faces import SYSTEM_CASCADE_DIR, _find_cascade
    from genconvit_tpu.data.native import load_facedet_lib

    lib = load_facedet_lib()
    if lib is None or not hasattr(lib, "gcv_haar_detect_scored"):
        raise SystemExit("native scored shim missing — run `make -C native`")

    def detect(handle, gray, max_per=8):
        n, h, w = gray.shape
        min_size = max(24, int(0.05 * min(h, w)))
        rects = np.zeros((n, max_per, 4), np.int32)
        weights = np.zeros((n, max_per), np.float64)
        counts = np.zeros(n, np.int32)
        rc = lib.gcv_haar_detect_scored(
            handle, gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, ctypes.c_double(1.1), 5, min_size,
            rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_per)
        assert rc == 0
        return rects, weights, counts

    h_front = lib.gcv_haar_create(
        _find_cascade("haarcascade_frontalface_default.xml").encode())
    h_prof = lib.gcv_haar_create(
        _find_cascade("haarcascade_profileface.xml").encode())
    cache = {}
    for name, (arr, _) in frames_by_video.items():
        n, H, W = arr.shape[:3]
        gray = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in arr])
        per_frame = [[] for _ in range(n)]
        for label, handle, g, mirrored in (
                ("front", h_front, gray, False),
                ("profile", h_prof, gray, False),
                ("profile", h_prof, gray[:, :, ::-1].copy(), True)):
            rects, weights, counts = detect(handle, g)
            for i in range(n):
                for j in range(counts[i]):
                    x, y, bw, bh = rects[i, j]
                    if mirrored:
                        box = (int(y), int(W - x), int(y + bh),
                               int(W - x - bw))
                    else:
                        box = (int(y), int(x + bw), int(y + bh), int(x))
                    per_frame[i].append(
                        (label, float(weights[i, j]), box, mirrored))
        cache[name] = per_frame
    return cache


def fit_calibration(frames_by_video, cache, videos):
    """Median (dx_facing, dy, sw, sh) per cascade family over matched
    detections (IoU >= 0.1) of `videos`; profile L/R pooled."""
    from tools.facedet_realframe_fixture import iou

    obs = {"front": [], "profile": []}
    for name in videos:
        _, gts = frames_by_video[name]
        for i, gt in enumerate(gts):
            for (label, w, box, mirrored) in cache[name][i]:
                if iou(gt, box) < 0.1:
                    continue
                t, r, b, l = box
                gtt, gtr, gtb, gtl = gt
                s = (b - t + r - l) / 2
                dx = (((gtl + gtr) / 2) - ((l + r) / 2)) / s
                if mirrored:
                    dx = -dx
                obs[label].append((dx,
                                   (((gtt + gtb) / 2) - ((t + b) / 2)) / s,
                                   (gtr - gtl) / (r - l),
                                   (gtb - gtt) / (b - t)))
    return {k: (tuple(np.median(np.array(v), axis=0))
                if len(v) >= 5 else (0.0, 0.0, 1.0, 1.0))
            for k, v in obs.items()}


def hybrid_predict(frames_by_video, cache, name, calib, jax_boxes,
                   front_thresh=3.0, prof_thresh=0.0, fuse_weight=0.8,
                   fuse_iou=0.4):
    """The HybridFaceDetector pipeline with explicit calibration constants
    (mirrors faces.HaarDetector.detect + HybridFaceDetector.detect)."""
    from genconvit_tpu.data.faces import _apply_calib, _box_iou

    arr, gts = frames_by_video[name]
    H, W = arr.shape[1:3]
    out = []
    for i in range(len(gts)):
        dets = cache[name][i]
        jb = jax_boxes[name][i]
        front = sorted([(w, box, m) for (lab, w, box, m) in dets
                        if lab == "front" and w >= front_thresh],
                       reverse=True)
        if front:
            boxes = [_apply_calib(box, m, calib["front"], H, W)
                     for _, box, m in front]
        else:
            prof = sorted([(w, box, m) for (lab, w, box, m) in dets
                           if lab == "profile" and w >= prof_thresh],
                          reverse=True)
            if prof:
                _, box, m = prof[0]
                boxes = [_apply_calib(box, m, calib["profile"], H, W)]
            else:
                out.append(jb)
                continue
        fused = []
        for box in boxes:
            if jb:
                match = max(jb, key=lambda j: _box_iou(box, j))
                if _box_iou(box, match) >= fuse_iou:
                    box = tuple(int(round(
                        (box[k] + fuse_weight * match[k]) / (1 + fuse_weight)))
                        for k in range(4))
            fused.append(box)
        out.append(fused)
    return out


def main():
    ap = argparse.ArgumentParser("facedet_calibrate")
    ap.add_argument("stage", choices=["fit", "loocv"])
    args = ap.parse_args()

    from genconvit_tpu.data.faces import HAAR_CALIBRATION
    from tools.facedet_realframe_fixture import iou

    frames_by_video = load_fixture_frames()
    cache = raw_detections(frames_by_video)
    names = sorted(frames_by_video)
    nf = sum(len(g) for _, g in frames_by_video.values())
    print(f"{len(names)} videos, {nf} curated frames")

    if args.stage == "fit":
        calib = fit_calibration(frames_by_video, cache, names)
        for k in ("front", "profile"):
            fitted = tuple(round(float(x), 3) for x in calib[k])
            print(f"{k:8s} fitted {fitted}  committed {HAAR_CALIBRATION[k]}")
            if fitted != HAAR_CALIBRATION[k]:
                print(f"  NOTE: drift vs committed constants — fixture or "
                      f"cascade behavior changed; consider updating "
                      f"HAAR_CALIBRATION")
        return

    from genconvit_tpu.data.faces import (JaxFaceDetector,
                                          default_facedet_checkpoint)

    jaxdet = JaxFaceDetector(default_facedet_checkpoint())
    jax_boxes = {n: jaxdet.detect(frames_by_video[n][0]) for n in names}

    def run(calib_by_video):
        ious = []
        per = {}
        for n in names:
            _, gts = frames_by_video[n]
            pred = hybrid_predict(frames_by_video, cache, n,
                                  calib_by_video[n], jax_boxes)
            vid = [max((iou(gt, b) for b in boxes), default=0.0)
                   for gt, boxes in zip(gts, pred)]
            per[n] = float(np.mean(vid))
            ious += vid
        a = np.array(ious)
        return a.mean(), (a >= 0.5).mean(), per

    m, d, per = run({h: fit_calibration(
        frames_by_video, cache, [n for n in names if n != h]) for h in names})
    print(f"LOO-CV:       mean IoU {m:.3f}  det@0.5 {d:.1%}")
    for n in names:
        print(f"    {n}: {per[n]:.3f}")
    allfit = fit_calibration(frames_by_video, cache, names)
    m, d, _ = run({h: allfit for h in names})
    print(f"all-data fit: mean IoU {m:.3f}  det@0.5 {d:.1%} "
          f"(= the shipped constants' fixture score)")


if __name__ == "__main__":
    main()
