"""Face-detection backends.

The reference uses dlib HOG (CPU) / CNN (CUDA) via face_recognition
(ref: model/pred_func.py:67-92) with two load-bearing quirks we preserve in
the interface: boxes are (top, right, bottom, left); detection runs on the
BGR-converted frame (quirk B6); every face in every frame counts toward the
frame budget (quirk B7).

No dlib model files exist in this environment, so exact-parity detection is a
*recorded-boxes* mode (evaluation against the reference records boxes once on
the PyTorch side); the other backends are self-contained:

  fullframe  whole frame as the "face" box (deterministic; default fallback)
  center     centered square crop
  skin       classical skin-segmentation heuristic (YCrCb threshold +
             connected components + geometry filters) — reasonable on
             talking-head benchmark footage, zero trained weights
  haar       pretrained OpenCV cascades (real-face-trained, same classical
             family as dlib-HOG) through the native C++ shim
             native/gcv_facedet.cc — the Python cv2 wheel here is OpenCV 5,
             which removed the CascadeClassifier binding, but the system
             OpenCV 4 C++ install ships both the API and the cascade files
             (/usr/share/opencv4/haarcascades). Staged scored pipeline:
             confidence-thresholded frontal -> mirrored-pair profile
             fallback -> dlib-geometry box calibration (HAAR_CALIBRATION)
  jax        trained on-device batched detector (one TPU call per clip) —
             see JaxFaceDetector
  hybrid     staged cascades fused with jax + jax fallback; quality leader
             on the real-frame fixture (mean IoU 0.641, LOO-CV 0.618) and
             the engine default — see HybridFaceDetector
  recorded   boxes from a JSON sidecar {video_basename: [[t,r,b,l], ...] per frame}
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

Box = Tuple[int, int, int, int]  # (top, right, bottom, left) — dlib order


class FaceDetector:
    """Base: detect(frames RGB uint8 [F,H,W,3]) -> per-frame list of boxes."""

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        raise NotImplementedError

    def detect_many(self, frames_list: List[np.ndarray]
                    ) -> List[List[List[Box]]]:
        """Detect over several videos' frame stacks at once. Device-backed
        detectors override this to score EVERY video's windows in one
        batched call (the per-video device round trip dominates grouped
        inference otherwise); the base implementation is the serial
        per-video loop with identical results."""
        return [self.detect(f) for f in frames_list]


class FullFrameDetector(FaceDetector):
    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        h, w = frames.shape[1:3]
        return [[(0, w, h, 0)] for _ in range(len(frames))]


class CenterDetector(FaceDetector):
    """Centered square covering `frac` of the short side."""

    def __init__(self, frac: float = 0.85):
        self.frac = frac

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        h, w = frames.shape[1:3]
        s = int(min(h, w) * self.frac)
        top, left = (h - s) // 2, (w - s) // 2
        return [[(top, left + s, top + s, left)] for _ in range(len(frames))]


class SkinDetector(FaceDetector):
    """Classical heuristic: skin mask in YCrCb, largest blob, squared box
    with headroom. Deterministic, no learned weights."""

    def __init__(self, min_area_frac: float = 0.01, expand: float = 1.25):
        self.min_area_frac = min_area_frac
        self.expand = expand

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        import cv2

        out: List[List[Box]] = []
        for frame in frames:
            h, w = frame.shape[:2]
            ycrcb = cv2.cvtColor(frame, cv2.COLOR_RGB2YCrCb)
            mask = cv2.inRange(ycrcb, (0, 133, 77), (255, 180, 127))
            mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
            mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, np.ones((9, 9), np.uint8))
            n, labels, stats, _ = cv2.connectedComponentsWithStats(mask)
            boxes: List[Box] = []
            if n > 1:
                areas = stats[1:, cv2.CC_STAT_AREA]
                best = int(np.argmax(areas)) + 1
                if stats[best, cv2.CC_STAT_AREA] >= self.min_area_frac * h * w:
                    x, y = stats[best, cv2.CC_STAT_LEFT], stats[best, cv2.CC_STAT_TOP]
                    bw, bh = stats[best, cv2.CC_STAT_WIDTH], stats[best, cv2.CC_STAT_HEIGHT]
                    cx, cy = x + bw / 2, y + bh / 2
                    s = int(max(bw, bh) * self.expand)
                    top = max(0, int(cy - s / 2))
                    left = max(0, int(cx - s / 2))
                    bottom = min(h, top + s)
                    right = min(w, left + s)
                    if bottom > top and right > left:
                        boxes.append((top, right, bottom, left))
            out.append(boxes)
        return out


SYSTEM_CASCADE_DIR = "/usr/share/opencv4/haarcascades"

# Box calibration toward the reference's dlib-HOG crop geometry
# (ref: model/pred_func.py:67-92 — crop geometry feeds the model, so box
# CONVENTION matters, not just localization). Haar rects are systematically
# larger and higher than the dlib-style curated boxes of
# tests/fixtures/facedet_realframes.json: fit as per-cascade medians of
# (dx_facing, dy, w_ratio, h_ratio) over matched detections (IoU>=0.1) on
# that fixture, profile L/R pooled in facing-normalized coords (the mirrored
# pass shares parameters). Units: detection box size. Controlled A/B
# (leave-one-video-out CV at fuse_weight=0.5/fuse_iou=0.3): mean IoU 0.609
# calibrated vs 0.579 uncalibrated; at the shipped fusion defaults and
# detector checkpoint the LOO-CV is 0.618 (tools/facedet_calibrate.py).
HAAR_CALIBRATION = {
    "front": (-0.041, 0.129, 0.889, 0.968),
    "profile": (-0.114, 0.136, 0.860, 0.926),
}


def _apply_calib(box: Box, mirrored: bool, calib, h: int, w: int) -> Box:
    """Shift/scale a (t,r,b,l) box by calibration (dx_facing, dy, sw, sh);
    dx is in the facing direction, so it flips for mirrored detections."""
    dx, dy, sw, sh = calib
    t, r, b, l = box
    s = (b - t + r - l) / 2
    cy = (t + b) / 2 + dy * s
    cx = (l + r) / 2 + (-dx if mirrored else dx) * s
    hh, hw = (b - t) * sh / 2, (r - l) * sw / 2
    return (max(0, int(cy - hh)), min(w, int(cx + hw)),
            min(h, int(cy + hh)), max(0, int(cx - hw)))


def _find_cascade(name: str) -> Optional[str]:
    for d in (os.environ.get("GENCONVIT_HAAR_DIR", ""), SYSTEM_CASCADE_DIR):
        p = os.path.join(d, name) if d else ""
        if p and os.path.isfile(p):
            return p
    return None


class HaarDetector(FaceDetector):
    """Pretrained OpenCV cascades via the native shim (native/gcv_facedet.cc,
    ctypes — the cv2 5.x wheel removed the CascadeClassifier Python binding).
    Real-face-trained, so unlike the synthetic-composite-trained jax backend
    it carries no training-domain gap.

    Default mode is the STAGED SCORED pipeline (measured on the curated
    real-frame fixture, see STATUS.md):

      1. frontal cascade with per-detection confidences (detectMultiScale
         outputRejectLevels levelWeights). On the fixture, true frontal hits
         score median 8.2 vs 2.9 for false positives, so `front_thresh`
         (default 3.0) vetoes the garbage boxes the unscored path returned
         on non-frontal footage;
      2. frames with no confident frontal hit fall back to the profile
         cascade, run on the frame AND its mirror (the cascade is
         left-profile only) — this covers turned-head footage the frontal
         cascade misses entirely;
      3. every kept box is calibrated toward the reference's dlib-style
         crop geometry (HAAR_CALIBRATION).

    A custom `cascade_path` selects single-cascade legacy mode (unscored,
    uncalibrated) for arbitrary cascade files."""

    def __init__(self, cascade_path: Optional[str] = None,
                 profile: bool = True, scale_factor: float = 1.1,
                 min_neighbors: int = 5, max_faces: int = 4,
                 downscale: int = 1, front_thresh: float = 3.0,
                 prof_thresh: float = 0.0, calibrate: bool = True):
        from genconvit_tpu.data.native import load_facedet_lib

        self._lib = load_facedet_lib()
        if self._lib is None:
            # FileNotFoundError so the engine's backend fallback
            # (infer/engine.py) degrades to 'fullframe' instead of crashing
            raise FileNotFoundError(
                "native haar shim not built — run `make -C native` "
                "(needs the system OpenCV 4 C++ libs)")
        self._custom = cascade_path is not None
        path = cascade_path or _find_cascade("haarcascade_frontalface_default.xml")
        if not path or not os.path.isfile(path):
            raise FileNotFoundError(f"Haar cascade not found: {path!r}")
        import ctypes
        import threading

        self._paths = [path]
        if profile and not self._custom:
            pp = _find_cascade("haarcascade_profileface.xml")
            if pp:
                self._paths.append(pp)
        # staged mode needs the scored shim entry point; a stale pre-round-3
        # .so falls back to the legacy unscored single-pass path
        self._scored = (not self._custom
                        and hasattr(self._lib, "gcv_haar_detect_scored"))
        # cv::CascadeClassifier::detectMultiScale is NOT thread-safe and the
        # engine fans extract_faces() out over a thread pool
        # (infer/engine.py predict_files). Handle-sets are CHECKED OUT of a
        # pool per detect() call (not per-thread): the engine builds a fresh
        # executor per predict_files call, so thread-local handles would
        # leak a parsed cascade per new worker thread in a serving loop —
        # the pool bounds live handles to the max observed concurrency.
        import queue

        self._pool: "queue.SimpleQueue[List[int]]" = queue.SimpleQueue()
        self._all_handles: List[int] = []
        self._reg_lock = threading.Lock()
        self._ctypes = ctypes
        self.scale_factor = scale_factor
        self.min_neighbors = min_neighbors
        self.max_faces = max_faces
        self.front_thresh = front_thresh
        self.prof_thresh = prof_thresh
        self.calibrate = calibrate
        # detect on a 1/downscale frame: boxes are scaled back to frame
        # coordinates; _effective_downscale floors the detection frame at
        # 360px short side so small inputs never lose the min-face
        # resolution the cascades need. The class default is 1 (full-res);
        # make_detector injects the production default (2, env
        # GENCONVIT_HAAR_DOWNSCALE) — measured trade in
        # _default_haar_downscale's docstring.
        self.downscale = max(1, int(downscale))
        self._thread_handles()  # fail fast on a bad cascade file

    def _checkout_handles(self) -> List[int]:
        """Take a handle-set from the pool, creating one if all are in use;
        return it with _release_handles (contextmanager-style via detect)."""
        import queue

        try:
            return self._pool.get_nowait()
        except queue.Empty:
            pass
        handles = []
        for p in self._paths:
            h = self._lib.gcv_haar_create(p.encode())
            if not h:
                raise ValueError(f"failed to load cascade {p!r}")
            handles.append(h)
        with self._reg_lock:
            self._all_handles.extend(handles)
        return handles

    def _release_handles(self, handles: List[int]) -> None:
        self._pool.put(handles)

    def _thread_handles(self) -> List[int]:
        """Validation-only: create (and immediately pool) one handle-set so
        a bad cascade file fails at construction, not first detect."""
        handles = self._checkout_handles()
        self._release_handles(handles)
        return handles

    def __del__(self):
        for h in getattr(self, "_all_handles", []):
            try:
                self._lib.gcv_haar_destroy(h)
            except Exception:
                pass

    def _effective_downscale(self, frames: np.ndarray) -> int:
        ds = self.downscale
        while ds > 1 and min(frames.shape[1], frames.shape[2]) // ds < 360:
            ds -= 1
        return ds

    def _gray_frames(self, frames: np.ndarray, ds: int):
        import cv2

        n = len(frames)
        h, w = frames.shape[1] // ds, frames.shape[2] // ds
        gray = np.empty((n, h, w), np.uint8)
        for i, f in enumerate(frames):
            g = cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)
            gray[i] = g if ds == 1 else cv2.resize(
                g, (w, h), interpolation=cv2.INTER_AREA)
        return gray

    def _run_scored(self, handle, gray: np.ndarray):
        """(rects [n,max,4] xywh, weights [n,max], counts [n]) on gray."""
        ct = self._ctypes
        n, h, w = gray.shape
        # min face ~= 5% of the short side: prunes the (quadratic) scan of
        # tiny windows on 1080p frames without excluding benchmark faces
        min_size = max(24, int(0.05 * min(h, w)))
        rects = np.zeros((n, self.max_faces, 4), np.int32)
        weights = np.zeros((n, self.max_faces), np.float64)
        counts = np.zeros(n, np.int32)
        rc = self._lib.gcv_haar_detect_scored(
            handle, gray.ctypes.data_as(ct.POINTER(ct.c_uint8)),
            n, h, w, ct.c_double(self.scale_factor), self.min_neighbors,
            min_size, rects.ctypes.data_as(ct.POINTER(ct.c_int32)),
            weights.ctypes.data_as(ct.POINTER(ct.c_double)),
            counts.ctypes.data_as(ct.POINTER(ct.c_int32)), self.max_faces)
        if rc != 0:
            raise RuntimeError("gcv_haar_detect_scored failed")
        return rects, weights, counts

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        if not self._scored:
            return self._detect_legacy(frames)
        handles = self._checkout_handles()
        try:
            return self._detect_staged(frames, handles)
        finally:
            self._release_handles(handles)

    def _detect_staged(self, frames: np.ndarray,
                       handles: List[int]) -> List[List[Box]]:
        n = len(frames)
        ds = self._effective_downscale(frames)
        H, W = frames.shape[1], frames.shape[2]
        gray = self._gray_frames(frames, ds)
        cal_f = HAAR_CALIBRATION["front"] if self.calibrate else (0, 0, 1, 1)
        cal_p = HAAR_CALIBRATION["profile"] if self.calibrate else (0, 0, 1, 1)

        out: List[List[Box]] = [[] for _ in range(n)]
        rects, weights, counts = self._run_scored(handles[0], gray)
        for i in range(n):
            for j in range(counts[i]):
                if weights[i, j] < self.front_thresh:
                    break  # descending-weight order
                x, y, bw, bh = rects[i, j]
                box = (int(y) * ds, int(x + bw) * ds,
                       int(y + bh) * ds, int(x) * ds)
                out[i].append(_apply_calib(box, False, cal_f, H, W))

        pending = [i for i in range(n) if not out[i]]
        if pending and len(handles) > 1:
            sub = gray[pending]
            best: Dict[int, Tuple[float, Box]] = {}
            for mirrored, g in ((False, sub),
                                (True, sub[:, :, ::-1].copy())):
                rects, weights, counts = self._run_scored(handles[1], g)
                for k, i in enumerate(pending):
                    for j in range(counts[k]):
                        wt = float(weights[k, j])
                        if wt < self.prof_thresh:
                            break
                        x, y, bw, bh = rects[k, j]
                        if mirrored:
                            box = (int(y) * ds, (gray.shape[2] - int(x)) * ds,
                                   int(y + bh) * ds,
                                   (gray.shape[2] - int(x + bw)) * ds)
                        else:
                            box = (int(y) * ds, int(x + bw) * ds,
                                   int(y + bh) * ds, int(x) * ds)
                        if i not in best or wt > best[i][0]:
                            best[i] = (wt, _apply_calib(
                                box, mirrored, cal_p, H, W))
            for i, (_, box) in best.items():
                out[i].append(box)
        return [b[: self.max_faces] for b in out]

    def _detect_legacy(self, frames: np.ndarray) -> List[List[Box]]:
        """Unscored single-pass path: custom cascade files, stale .so."""
        handles = self._checkout_handles()
        try:
            return self._detect_legacy_with(frames, handles)
        finally:
            self._release_handles(handles)

    def _detect_legacy_with(self, frames: np.ndarray,
                            handles: List[int]) -> List[List[Box]]:
        ct = self._ctypes
        n = len(frames)
        ds = self._effective_downscale(frames)
        gray = self._gray_frames(frames, ds)
        h, w = gray.shape[1:]
        min_size = max(24, int(0.05 * min(h, w)))
        out: List[List[Box]] = [[] for _ in range(n)]
        rects = np.zeros((n, self.max_faces, 4), np.int32)
        counts = np.zeros(n, np.int32)
        for handle in handles:
            rc = self._lib.gcv_haar_detect(
                handle, gray.ctypes.data_as(ct.POINTER(ct.c_uint8)),
                n, h, w, ct.c_double(self.scale_factor),
                self.min_neighbors, min_size,
                rects.ctypes.data_as(ct.POINTER(ct.c_int32)),
                counts.ctypes.data_as(ct.POINTER(ct.c_int32)),
                self.max_faces)
            if rc != 0:
                raise RuntimeError("gcv_haar_detect failed")
            for i in range(n):
                for x, y, bw, bh in rects[i, : counts[i]]:
                    box = (int(y) * ds, int(x + bw) * ds,
                           int(y + bh) * ds, int(x) * ds)
                    # frontal + profile can double-report the same face
                    if all(_box_iou(box, b) < 0.45 for b in out[i]):
                        out[i].append(box)
        return [b[: self.max_faces] for b in out]


class HybridFaceDetector(FaceDetector):
    """Staged cascades fused with the jax detector — the quality leader on
    the curated real-frame fixture: mean IoU 0.641 / 87.4% of frames at
    IoU>=0.5 (leave-one-video-out CV of the fitted thresholds/calibration:
    0.618 / 85.7%, tools/facedet_calibrate.py — the fuse_weight/fuse_iou
    defaults were themselves selected by LOO-CV score, so that number
    carries the one-hyperparameter-pick selection bias), vs 0.599/79.0%
    jax-only (two-round distilled checkpoint) and the round-3-early 0.543
    haar-first/jax-fallback hybrid (tools/facedet_realframe_fixture.py
    eval).

    The two backends fail differently: the real-face-trained cascades are
    the better localizer where they fire with confidence, while the
    synthetic-trained jax pyramid still detects on footage the cascades
    miss. Per frame: confident cascade boxes win, each box refined by
    averaging with an agreeing jax box (weight `fuse_weight`, overlap gate
    `fuse_iou` — the two detectors' independent localization errors partly
    cancel: fixture mean 0.579 fused vs 0.571 unfused, pre-calibration);
    frames without any cascade hit use the jax detection outright. The jax
    pass is one batched TPU call for the whole clip, so fusion adds no
    per-frame device cost."""

    def __init__(self, checkpoint: Optional[str] = None,
                 haar_downscale: int = 1, downscale: Optional[int] = None,
                 fuse_weight: float = 0.8, fuse_iou: float = 0.4, **kwargs):
        self.haar = HaarDetector(
            downscale=downscale if downscale is not None else haar_downscale,
            **{k: v for k, v in kwargs.items()
               if k in ("profile", "scale_factor", "min_neighbors",
                        "max_faces", "front_thresh", "prof_thresh",
                        "calibrate")})
        self.jax = JaxFaceDetector(
            checkpoint or default_facedet_checkpoint(),
            **{k: v for k, v in kwargs.items()
               if k in ("score_thresh", "max_faces", "fuse")})
        self.fuse_weight = fuse_weight
        self.fuse_iou = fuse_iou

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        return self._fuse_video(self.haar.detect(frames),
                                self.jax.detect(frames))

    def detect_many(self, frames_list: List[np.ndarray]
                    ) -> List[List[List[Box]]]:
        """Grouped hybrid: cascades stay per-video host C++ calls; the jax
        pyramid batches ALL videos into one device call (detect_many);
        fusion is per frame as in `detect` — identical boxes, fewer device
        round trips."""
        haar_all = [self.haar.detect(f) for f in frames_list]
        jax_all = self.jax.detect_many(frames_list)
        return [self._fuse_video(hb, jb)
                for hb, jb in zip(haar_all, jax_all)]

    def _fuse_video(self, haar_boxes: List[List[Box]],
                    jax_boxes: List[List[Box]]) -> List[List[Box]]:
        out: List[List[Box]] = []
        for hb, jb in zip(haar_boxes, jax_boxes):
            if not hb:
                out.append(jb)
                continue
            if not jb or self.fuse_weight <= 0:
                out.append(hb)
                continue
            fused = []
            for box in hb:
                match = max(jb, key=lambda j: _box_iou(box, j))
                if _box_iou(box, match) >= self.fuse_iou:
                    wj = self.fuse_weight
                    box = tuple(int(round((box[i] + wj * match[i]) / (1 + wj)))
                                for i in range(4))
                fused.append(box)  # type: ignore[arg-type]
            out.append(fused)
        return out


def _box_iou(a: Box, b: Box) -> float:
    ih = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iw = max(0, min(a[1], b[1]) - max(a[3], b[3]))
    inter = ih * iw
    union = ((a[2] - a[0]) * (a[1] - a[3])
             + (b[2] - b[0]) * (b[1] - b[3]) - inter)
    return inter / union if union > 0 else 0.0


class RecordedDetector(FaceDetector):
    """Exact-parity mode: boxes recorded from the reference's dlib-HOG run.
    Sidecar schema: {"<video basename>": [[ [t,r,b,l], ...] per sampled frame]}"""

    def __init__(self, sidecar_path: str, video_name: Optional[str] = None):
        with open(sidecar_path) as f:
            self._all = json.load(f)
        self._name = video_name

    def for_video(self, video_name: str) -> "RecordedDetector":
        d = RecordedDetector.__new__(RecordedDetector)
        d._all = self._all
        d._name = video_name
        return d

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        per_frame = self._all.get(self._name or "", [])
        out: List[List[Box]] = []
        for i in range(len(frames)):
            boxes = per_frame[i] if i < len(per_frame) else []
            out.append([tuple(int(v) for v in b) for b in boxes])
        return out


class JaxFaceDetector(FaceDetector):
    """On-device batched detector (models/facedet.py): all frames of a video
    are scored in ONE TPU call instead of serial per-frame host detection.
    Needs a trained checkpoint (none ships with the repo); random init keeps
    the pipeline runnable but finds nothing useful."""

    def __init__(self, checkpoint: Optional[str] = None,
                 score_thresh: float = 0.3, max_faces: int = 4,
                 allow_random: bool = False, fuse: bool = True):
        # score_thresh 0.3: top-detection scores on the reference's real
        # sample frames cluster 0.33-0.63 (synthetic-composite training
        # domain gap); 0.5 missed over half the frames, 0.3 fires on ~95%
        # while frames with no clear face still return nothing (dlib-like).
        import jax

        from genconvit_tpu.models.facedet import (INPUT_SIZE, detect_batch,
                                                  init_facedet)

        self._input = INPUT_SIZE
        self.score_thresh = score_thresh
        self.max_faces = max_faces
        self.fuse = fuse
        if checkpoint and os.path.isfile(checkpoint):
            from genconvit_tpu.core.checkpoint import load_checkpoint

            self.params = load_checkpoint(checkpoint)["params"]
        elif allow_random:  # structural tests only
            self.params = init_facedet(jax.random.PRNGKey(0))
        else:
            # fail loudly: a random-weight detector silently finds nothing,
            # which is indistinguishable from "no faces in this video"
            raise FileNotFoundError(
                f"jax face detector: no trained checkpoint at {checkpoint!r} "
                f"(set GENCONVIT_FACEDET_CKPT or restore "
                f"genconvit_tpu/assets/facedet.gcv)")
        import functools

        self._fn = jax.jit(functools.partial(
            detect_batch, max_faces=max_faces, score_thresh=score_thresh))

    @staticmethod
    def _starts(dim: int, side: int) -> np.ndarray:
        """Window starts covering [0, dim) with >=50% overlap."""
        if side >= dim:
            return np.zeros(1, np.int64)
        n = int(np.ceil((dim - side) / (side / 2))) + 1
        return np.unique(np.round(np.linspace(0, dim - side, n)).astype(np.int64))

    def _windows(self, h: int, w: int) -> List[Tuple[int, int, int]]:
        """(top, left, side) square sub-windows: aspect-preserving scale
        pyramid. The model was trained on faces 0.28-0.85 of its 128px input
        (data/facedet_synth.py _paste), so a face must occupy that fraction
        of SOME window to be in-domain: scale 1 covers faces >=~0.3 of the
        short side, scale 1/2 covers ~0.15-0.4 (the talking-head range in
        1080p footage — measured on tests/fixtures/facedet_realframes.json,
        where whole-frame squeeze inference scored IoU 0.02-0.04 on 1080p).
        Small inputs keep the single-window path (a 64px window would be
        upsampled noise)."""
        m = min(h, w)
        scales = (1.0,) if m <= 2 * self._input else (1.0, 0.5, 1 / 3)
        wins: List[Tuple[int, int, int]] = []
        if h != w:
            # anisotropic full-frame squeeze: the only view that keeps a
            # face WIDER than the short side fully inside the input
            # (extreme close-ups), at the cost of aspect distortion
            wins.append((0, 0, -1))
        for s in scales:
            side = int(round(m * s))
            if side < 2 * self._input and s != 1.0:
                continue  # upsampled-noise windows
            for top in self._starts(h, side):
                for left in self._starts(w, side):
                    wins.append((int(top), int(left), side))
        return wins

    @staticmethod
    def _bucket(n: int) -> int:
        """Round a batch size up to the next 8*(1, 1.5)*2^k bucket so the
        jitted detector compiles per BUCKET, not per exact frames x windows
        product — the window count depends on frame resolution, and a
        mixed-resolution dataset would otherwise recompile per resolution
        (tens of seconds each on the relay-attached chip). Worst-case 50%
        padding; padded rows are junk scored and sliced off on host."""
        b = 8
        while b < n:
            b = b * 3 // 2 if (b & (b - 1)) == 0 else b * 4 // 3
        return b

    def detect(self, frames: np.ndarray) -> List[List[Box]]:
        return self.detect_many([frames])[0]

    def detect_many(self, frames_list: List[np.ndarray]
                    ) -> List[List[List[Box]]]:
        """All videos' pyramid windows scored in ONE device call (grouped
        inference would otherwise pay a relay/PCIe round trip per video).
        Window geometry, crops, scoring and NMS are identical to the
        per-video path, so the boxes are bitwise the same — only the device
        batching changes (the bucket padding already absorbs arbitrary
        crop counts)."""
        import cv2

        per_video = []  # (wins, n_frames, h, w)
        m = 0
        for frames in frames_list:
            h, w = frames.shape[1:3]
            wins = self._windows(h, w)
            per_video.append((wins, len(frames), h, w))
            m += len(frames) * len(wins)
        if m == 0:
            return [[[] for _ in range(n)] for _, n, _, _ in per_video]
        crops = np.zeros((self._bucket(m), self._input, self._input, 3),
                         np.uint8)
        i = 0
        for frames, (wins, _, _, _) in zip(frames_list, per_video):
            for f in frames:
                for (top, left, side) in wins:
                    src = f if side < 0 else f[top: top + side,
                                               left: left + side]
                    crops[i] = cv2.resize(src, (self._input, self._input),
                                          interpolation=cv2.INTER_AREA)
                    i += 1
        scores_all, boxes_all = self._fn(self.params, crops)
        scores_all = np.asarray(scores_all)[:m]
        boxes_all = np.asarray(boxes_all)[:m]
        out: List[List[List[Box]]] = []
        off = 0
        for wins, n_frames, h, w in per_video:
            k = n_frames * len(wins)
            if k == 0:  # zero-frame entry: no windows were scored
                out.append([[] for _ in range(n_frames)])
                continue
            scores = scores_all[off: off + k].reshape(n_frames, len(wins), -1)
            boxes = boxes_all[off: off + k].reshape(n_frames, len(wins), -1, 4)
            off += k
            merged: List[List[Tuple[float, Box]]] = []
            for fi in range(n_frames):
                cands: List[Tuple[float, Box]] = []
                for wi, (top0, left0, side) in enumerate(wins):
                    sy, sx = (h, w) if side < 0 else (side, side)
                    for s, (cy, cx, bh, bw) in zip(scores[fi, wi],
                                                   boxes[fi, wi]):
                        if s <= self.score_thresh or not np.isfinite(s):
                            continue
                        t = int(np.clip(top0 + (cy - bh / 2) * sy, 0, h))
                        b = int(np.clip(top0 + (cy + bh / 2) * sy, 0, h))
                        lf = int(np.clip(left0 + (cx - bw / 2) * sx, 0, w))
                        r = int(np.clip(left0 + (cx + bw / 2) * sx, 0, w))
                        if b > t and r > lf:
                            cands.append((float(s), (t, r, b, lf)))
                merged.append(self._merge(cands))
            out.append([[box for _, box in frame] for frame in merged])
        return out

    @staticmethod
    def _iou(a: Box, b: Box) -> float:
        ih = max(0, min(a[2], b[2]) - max(a[0], b[0]))
        iw = max(0, min(a[1], b[1]) - max(a[3], b[3]))
        inter = ih * iw
        union = ((a[2] - a[0]) * (a[1] - a[3])
                 + (b[2] - b[0]) * (b[1] - b[3]) - inter)
        return inter / union if union > 0 else 0.0

    def _merge(self, cands: List[Tuple[float, Box]],
               iou_thresh: float = 0.45) -> List[Tuple[float, Box]]:
        """Cross-window NMS on frame-coordinate boxes. With `fuse` (default),
        each kept detection is the score-weighted mean of its overlapping
        cluster (weighted box fusion) — the same face seen from several
        pyramid windows localizes better averaged than picked: mean IoU
        0.513 vs 0.495 pick-top on the real-frame fixture. Two further
        passes measured on the same fixture and NOT shipped: re-scoring each
        box on a recentered 2x window (no gain), and per-video temporal
        track consensus (0.505 — slightly worse; the track median drags
        good frames toward the occasional coherent mislocalization)."""
        cands.sort(key=lambda c: -c[0])
        clusters: List[List[Tuple[float, Box]]] = []
        for s, box in cands:
            for cl in clusters:
                if self._iou(cl[0][1], box) >= iou_thresh:
                    if self.fuse:
                        cl.append((s, box))
                    break
            else:
                if len(clusters) < self.max_faces:
                    clusters.append([(s, box)])
        out: List[Tuple[float, Box]] = []
        for cl in clusters:
            top_s = cl[0][0]
            if not self.fuse or len(cl) == 1:
                out.append((top_s, cl[0][1]))
                continue
            wsum = sum(s for s, _ in cl)
            fused = tuple(int(round(sum(s * b[i] for s, b in cl) / wsum))
                          for i in range(4))
            out.append((top_s, fused))  # type: ignore[arg-type]
        return out


def _default_haar_downscale() -> int:
    """Production default for the cascade detection-time downscale.

    GENCONVIT_HAAR_DOWNSCALE overrides; the built-in default is 2: the
    cascades scan a half-resolution frame (floored at 360px short side by
    HaarDetector._effective_downscale, so sub-720p footage is unaffected)
    and boxes scale back to frame coordinates. Measured on the curated
    148-frame real fixture + trained checkpoints (2026-08, see
    docs/performance.md): cascade host cost 2.0x lower (69.0s -> 34.5s),
    hybrid mean IoU 0.664 -> 0.656, det@0.5 89.9% -> 89.2%, and verdict
    sensitivity over the 8 sample videos = 0/8 flips, max |dprob| 0.030.
    Set GENCONVIT_HAAR_DOWNSCALE=1 for full-resolution detection."""
    try:
        return max(1, int(os.environ.get("GENCONVIT_HAAR_DOWNSCALE", "2")))
    except ValueError:
        return 2


def make_detector(backend: str, **kwargs) -> FaceDetector:
    if backend in ("haar", "hybrid") and not any(
            k in kwargs for k in ("downscale", "haar_downscale")):
        kwargs["downscale"] = _default_haar_downscale()
    if backend in ("fullframe", "none"):
        return FullFrameDetector()
    if backend == "center":
        return CenterDetector(**kwargs)
    if backend == "skin":
        return SkinDetector(**kwargs)
    if backend == "haar":
        return HaarDetector(
            kwargs.get("cascade_path",
                       os.environ.get("GENCONVIT_HAAR_CASCADE") or None),
            **{k: v for k, v in kwargs.items()
               if k in ("profile", "scale_factor", "min_neighbors",
                        "max_faces", "downscale", "front_thresh",
                        "prof_thresh", "calibrate")})
    if backend == "recorded":
        sidecar = kwargs.get("sidecar_path",
                             os.environ.get("GENCONVIT_FACE_SIDECAR"))
        if not sidecar or not os.path.isfile(sidecar):
            raise FileNotFoundError(
                f"recorded backend needs a boxes sidecar (--face-sidecar / "
                f"GENCONVIT_FACE_SIDECAR); got {sidecar!r}")
        return RecordedDetector(sidecar)
    if backend == "jax":
        return JaxFaceDetector(
            kwargs.get("checkpoint", default_facedet_checkpoint()),
            **{k: v for k, v in kwargs.items()
               if k in ("score_thresh", "max_faces", "fuse")})
    if backend == "hybrid":
        return HybridFaceDetector(
            kwargs.get("checkpoint", default_facedet_checkpoint()),
            **{k: v for k, v in kwargs.items()
               if k in ("haar_downscale", "downscale", "profile",
                        "scale_factor", "min_neighbors", "score_thresh",
                        "max_faces", "fuse", "fuse_weight", "fuse_iou",
                        "front_thresh", "prof_thresh", "calibrate")})
    raise ValueError(f"unknown face backend: {backend}")


def default_facedet_checkpoint() -> Optional[str]:
    """GENCONVIT_FACEDET_CKPT env, else the committed package asset
    (genconvit_tpu/assets/facedet.gcv — trained offline on synthetic
    composites of the reference's sample faces, tools/train_facedet_synth.py)."""
    env = os.environ.get("GENCONVIT_FACEDET_CKPT")
    if env:
        return env
    asset = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "facedet.gcv")
    return asset if os.path.isfile(asset) else None


def crop_faces(frames: np.ndarray, boxes_per_frame: List[List[Box]],
               budget: int, img_size: int = 224) -> np.ndarray:
    """Crop + INTER_AREA resize, filling a uint8 [<=budget, S, S, 3] batch.

    Reproduces the reference's budget semantics (quirk B7): every detected
    face in every frame consumes a slot until `budget` faces are collected
    (ref: model/pred_func.py:78-90).
    """
    import cv2

    out = np.zeros((budget, img_size, img_size, 3), dtype=np.uint8)
    count = 0
    for frame, boxes in zip(frames, boxes_per_frame):
        for (top, right, bottom, left) in boxes:
            if count >= budget:
                break
            face = frame[top:bottom, left:right]
            if face.size == 0:
                continue
            out[count] = cv2.resize(face, (img_size, img_size),
                                    interpolation=cv2.INTER_AREA)
            count += 1
    return out[:count]
