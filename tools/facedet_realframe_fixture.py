#!/usr/bin/env python
"""Build + evaluate the REAL-FRAME face-box fixture (VERDICT r2 missing #2).

The trained jax detector's quality bars previously lived only on the
synthetic-composite distribution it was trained on. This tool grounds them
on actually-decoded reference sample videos:

  stage 'propose':  decode N frames/video from the reference's bundled
      sample videos (or explicit --videos), run the jax + skin (+ hybrid
      when the cascade shim is built) detectors, write (a) a candidates
      JSON and (b) overlay grids (PNG) for human curation — jax boxes drawn
      GREEN, skin boxes BLUE, hybrid boxes RED, frame index labels burned
      in.
  stage 'freeze':   merge a curation JSON (frame key -> accepted box or
      corrected [t,r,b,l]) with the candidates into the committed fixture
      tests/fixtures/facedet_realframes.json.
  stage 'eval':     decode the fixture's frames, run the jax detector,
      report per-video and overall IoU vs the curated boxes (the number
      quoted in STATUS.md; pinned by tests/test_facedet.py when the
      reference media is present).

Pixels are never committed — the fixture stores (video, frame_index, box),
and consumers re-decode from the reference mount (tests skip without it).

Usage:
  GENCONVIT_PLATFORM=cpu python tools/facedet_realframe_fixture.py propose
  GENCONVIT_PLATFORM=cpu python tools/facedet_realframe_fixture.py freeze \
      --curation /tmp/facedet_curation.json
  GENCONVIT_PLATFORM=cpu python tools/facedet_realframe_fixture.py eval
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLE_DIR = os.environ.get("GENCONVIT_BENCH_SAMPLES",
                            "/root/reference/sample_prediction_data")
FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "facedet_realframes.json")


def resolve_video(name: str) -> str:
    """Fixture keys are '<video>#<frame>'. A bare video name lives in
    SAMPLE_DIR (the original 8 sample_prediction_data videos); a name with a
    '/' is relative to the reference mount root (e.g.
    'sample_videos_kaggle/01__exit_phone_room.mp4')."""
    if "/" in name:
        return os.path.join(os.path.dirname(SAMPLE_DIR.rstrip("/")), name)
    return os.path.join(SAMPLE_DIR, name)


def iou(a, b):
    """(t, r, b, l) boxes."""
    t = max(a[0], b[0]); btm = min(a[2], b[2])
    lf = max(a[3], b[3]); r = min(a[1], b[1])
    inter = max(0, btm - t) * max(0, r - lf)
    area = lambda x: max(0, x[2] - x[0]) * max(0, x[1] - x[3])  # noqa: E731
    union = area(a) + area(b) - inter
    return inter / union if union else 0.0


def sample_videos():
    return sorted(
        os.path.join(SAMPLE_DIR, f) for f in os.listdir(SAMPLE_DIR)
        if f.lower().endswith((".mp4", ".avi", ".mov")))


def decode_frames(path, n):
    """n evenly-spaced full-resolution RGB frames + their indices."""
    import cv2

    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 1
    idxs = np.linspace(0, max(total - 1, 0), n).astype(int)
    frames, kept = [], []
    for i in sorted(set(idxs.tolist())):
        cap.set(cv2.CAP_PROP_POS_FRAMES, i)
        ok, fr = cap.read()
        if ok:
            frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
            kept.append(int(i))
    cap.release()
    return frames, kept


def propose(out_dir, per_video, videos=None):
    import cv2

    from genconvit_tpu.data.faces import make_detector

    os.makedirs(out_dir, exist_ok=True)
    jaxdet = make_detector("jax")
    skindet = make_detector("skin")
    try:
        hybdet = make_detector("hybrid")
    except Exception:
        hybdet = None  # cascade shim unbuilt: jax+skin overlays only
    candidates = {}
    ref_root = os.path.dirname(SAMPLE_DIR.rstrip("/"))
    for vp in (videos or sample_videos()):
        # key: bare basename for SAMPLE_DIR videos, reference-root-relative
        # path otherwise (see resolve_video)
        if os.path.dirname(os.path.abspath(vp)) == SAMPLE_DIR.rstrip("/"):
            name = os.path.basename(vp)
        else:
            name = os.path.relpath(os.path.abspath(vp), ref_root)
        frames, idxs = decode_frames(vp, per_video)
        if not frames:
            continue
        arr = np.stack(frames)
        jb = jaxdet.detect(arr)
        sb = skindet.detect(arr)
        hb = hybdet.detect(arr) if hybdet is not None else [[]] * len(frames)
        tiles = []
        for k, (fr, fi) in enumerate(zip(frames, idxs)):
            key = f"{name}#{fi}"
            candidates[key] = {"jax": [list(map(int, b)) for b in jb[k]],
                               "skin": [list(map(int, b)) for b in sb[k]],
                               "hybrid": [list(map(int, b)) for b in hb[k]],
                               "h": int(fr.shape[0]), "w": int(fr.shape[1])}
            vis = fr.copy()
            for (t, r, b, l) in jb[k]:
                cv2.rectangle(vis, (l, t), (r, b), (0, 255, 0), 3)
            for (t, r, b, l) in sb[k]:
                cv2.rectangle(vis, (l, t), (r, b), (0, 0, 255), 3)
            for (t, r, b, l) in hb[k]:  # hybrid = quality leader, drawn RED
                cv2.rectangle(vis, (l, t), (r, b), (255, 0, 0), 3)
            cv2.putText(vis, f"#{fi}", (8, 36), cv2.FONT_HERSHEY_SIMPLEX,
                        1.2, (255, 255, 0), 3)
            tiles.append(cv2.resize(vis, (320, 320)))
        rows = []
        for g in range(0, len(tiles), 5):
            row = tiles[g:g + 5]
            row += [np.zeros_like(tiles[0])] * (5 - len(row))
            rows.append(np.concatenate(row, axis=1))
        grid = np.concatenate(rows, axis=0)
        cv2.imwrite(os.path.join(out_dir, f"{name.replace('/', '__')}.png"),
                    cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        print(f"{name}: {len(frames)} frames, "
              f"jax fired {sum(bool(x) for x in jb)}, "
              f"skin fired {sum(bool(x) for x in sb)}")
    with open(os.path.join(out_dir, "candidates.json"), "w") as f:
        json.dump(candidates, f, indent=1)
    print(f"overlays + candidates in {out_dir}")


def freeze(curation_path, merge=False):
    with open(curation_path) as f:
        curation = json.load(f)
    fixture = {"source": "reference sample videos (sample_prediction_data + "
                         "path-prefixed keys for other reference dirs), "
                         "boxes curated by visual inspection of detector "
                         "overlays (tools/facedet_realframe_fixture.py "
                         "propose)",
               "boxes": {}}
    if merge and os.path.exists(FIXTURE):
        with open(FIXTURE) as f:
            fixture["boxes"] = json.load(f)["boxes"]
    for key, entry in sorted(curation.items()):
        if entry.get("box") is None:
            continue  # frame rejected (no clear face)
        fixture["boxes"][key] = {"box": [int(v) for v in entry["box"]],
                                 "note": entry.get("note", "")}
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"froze {len(fixture['boxes'])} curated boxes -> {FIXTURE}")


def evaluate(backends=("jax",), checkpoint=None):
    """Per-backend IoU of detected crops vs the curated boxes — the
    crop-geometry sensitivity table (VERDICT r2 item #3): how much face the
    engine's 224x224 crop actually contains under each backend bounds the
    'crop geometry affects AUC' parity risk (SURVEY.md §7.3-3)."""
    from genconvit_tpu.data.faces import make_detector

    with open(FIXTURE) as f:
        fixture = json.load(f)["boxes"]
    by_video = {}
    for key, e in fixture.items():
        name, fi = key.rsplit("#", 1)
        by_video.setdefault(name, []).append((int(fi), e["box"]))
    kwargs = {"jax": {"checkpoint": checkpoint}} if checkpoint else {}
    dets = {b: make_detector(b, **kwargs.get(b, {})) for b in backends}
    ious = {b: [] for b in backends}
    per_video = {b: {} for b in backends}
    for name, items in sorted(by_video.items()):
        vp = resolve_video(name)
        import cv2

        cap = cv2.VideoCapture(vp)
        frames, gts = [], []
        for fi, box in sorted(items):
            cap.set(cv2.CAP_PROP_POS_FRAMES, fi)
            ok, fr = cap.read()
            if ok:
                frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
                gts.append(box)
        cap.release()
        if not frames:
            continue
        arr = np.stack(frames)
        for b, det in dets.items():
            found = det.detect(arr)
            vid = [max((iou(tuple(gt), d) for d in dd), default=0.0)
                   for gt, dd in zip(gts, found)]
            per_video[b][name] = float(np.mean(vid))
            ious[b] += vid
        row = "  ".join(f"{b}={per_video[b][name]:.3f}" for b in backends)
        print(f"{name} ({len(frames)} frames): {row}")
    print()
    out = {}
    for b in backends:
        mean = float(np.mean(ious[b])) if ious[b] else 0.0
        det50 = float(np.mean([v >= 0.5 for v in ious[b]])) if ious[b] else 0.0
        out[b] = (mean, det50)
        print(f"OVERALL {b:>10}: mean IoU {mean:.3f}, IoU>=0.5 on "
              f"{det50:.1%} of {len(ious[b])} curated real frames")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["propose", "freeze", "eval"])
    ap.add_argument("--out-dir", default="/tmp/facedet_realframe")
    ap.add_argument("--per-video", type=int, default=10)
    ap.add_argument("--curation")
    ap.add_argument("--merge", action="store_true",
                    help="freeze: keep existing fixture boxes, add new ones")
    ap.add_argument("--videos", nargs="*", default=None,
                    help="propose: explicit video paths (default: SAMPLE_DIR)")
    ap.add_argument("--backends", default="hybrid,jax,haar",
                    help="comma list: hybrid,jax,haar,fullframe,center,skin")
    ap.add_argument("--checkpoint", default=None,
                    help="alternate facedet checkpoint for the jax backend")
    args = ap.parse_args()
    if args.stage == "propose":
        propose(args.out_dir, args.per_video, videos=args.videos)
    elif args.stage == "freeze":
        freeze(args.curation, merge=args.merge)
    else:
        evaluate(tuple(args.backends.split(",")), checkpoint=args.checkpoint)
