#!/usr/bin/env python
"""Record face boxes into the RecordedDetector sidecar format.

Exact-parity evaluation needs the reference's dlib-HOG boxes (crop geometry
affects AUC — SURVEY.md §7.3). Run this with --backend dlib on a machine with
face_recognition installed to capture reference boxes, or with any built-in
backend to freeze this framework's detections; then evaluate anywhere with
`--face-backend recorded` + the sidecar.

Sidecar schema: {"<video basename>": [[[t,r,b,l], ...] per sampled frame]}

Usage:
  python tools/record_boxes.py --dir videos/ --frames 15 \
      --backend skin|fullframe|center|jax|dlib --out boxes.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class DlibHOGDetector:
    """Reference-exact detector (requires dlib + face_recognition, not
    installed in this image): reproduces model/pred_func.py:67-92 including
    the BGR quirk (B6) and upsample=0."""

    def detect(self, frames):
        import cv2
        import face_recognition

        out = []
        for frame in frames:
            bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            locs = face_recognition.face_locations(
                bgr, number_of_times_to_upsample=0, model="hog")
            out.append([tuple(int(v) for v in b) for b in locs])
        return out


def main():
    p = argparse.ArgumentParser("record_boxes")
    p.add_argument("--dir", required=True, help="directory of videos")
    p.add_argument("--frames", type=int, default=15)
    p.add_argument("--backend", default="skin")
    p.add_argument("--out", default="boxes.json")
    args = p.parse_args()

    from genconvit_tpu.data.faces import make_detector
    from genconvit_tpu.data.video import extract_frames, is_video

    det = DlibHOGDetector() if args.backend == "dlib" else \
        make_detector(args.backend)

    sidecar = {}
    for name in sorted(os.listdir(args.dir)):
        path = os.path.join(args.dir, name)
        if not is_video(path):
            continue
        try:
            frames = extract_frames(path, args.frames)
            boxes = det.detect(frames)
        except Exception as e:
            print(f"skip {name}: {e}")
            continue
        sidecar[name] = [[list(b) for b in per_frame] for per_frame in boxes]
        print(f"{name}: {sum(len(b) for b in boxes)} boxes over {len(boxes)} frames")

    with open(args.out, "w") as f:
        json.dump(sidecar, f)
    print(f"wrote {args.out} ({len(sidecar)} videos)")


if __name__ == "__main__":
    main()
