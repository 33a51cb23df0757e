"""Staged serving pipeline — the serving analog of the engine's grouped
production driver (`Predictor.predict_files_group_detect`).

serve.py's original flow ran decode+detect+crop inside each request's
handler thread and only batched the final device launch (infer/batcher.py).
Measured under concurrency (tools/bench_serve.py, VERDICT r4 weak #6), that
shape was throughput-NEGATIVE vs a plain lock: the artificial batch window
added latency on a decode-bound host, and none of the grouped decode/detect
pipelining that exists in the batch driver helped a serving workload.

This pipeline restores the production staging for queued requests:

  stage 1 (shared pool)   each accepted request's video decodes in a
                          bounded ThreadPoolExecutor the moment it arrives
                          (cv2/FFmpeg release the GIL);
  stage 2 (worker)        decoded requests are drained GREEDILY — whatever
                          is ready right now, up to max_batch, with NO
                          artificial window by default (window_ms=0): under
                          closed-loop clients, completions re-arrive in
                          bursts, so coalescing happens naturally without
                          adding wait;
  stage 3 (worker)        ONE batched detector.detect_many call for the
                          whole drain (the jax pyramid scores every
                          request's windows in a single device trip);
  stage 4 (worker)        crop on host, pad to a power-of-two bucket
                          (compile-cache friendly, same buckets serve.py
                          warms at startup), ONE batched model launch.

While the worker waits on the device fetch for batch i, the pool is already
decoding batch i+1's requests — the same decode/compute overlap as the
batch driver, expressed across requests instead of across file groups.

The reference has no serving story (SURVEY.md §2 — CLI-only,
ref prediction.py:232-260 is a batch loop); the bar here is internal:
staged throughput >= the lock-serialized baseline at equal verdicts.
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
import os
import threading
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("genconvit_tpu")


class _Req:
    __slots__ = ("path", "frames", "event", "result", "error", "faces_found")

    def __init__(self, path: str):
        self.path = path
        self.frames: Optional[np.ndarray] = None
        self.event = threading.Event()
        self.result: Optional[Tuple[int, float]] = None
        self.error: Optional[BaseException] = None
        self.faces_found = 0


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class StagedPipeline:
    """Accepts video paths, returns (y, y_val, faces_found) per request.

    submit() blocks the calling (request handler) thread until the verdict
    is ready; decode/detect/launch run in the shared stages above."""

    def __init__(self, predictor, num_frames: int, *, max_batch: int = 8,
                 decode_workers: Optional[int] = None,
                 window_ms: float = 0.0):
        self.predictor = predictor
        self.num_frames = num_frames
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self.launches = 0        # observability (serve.py /statz)
        self.batched_videos = 0
        self._ready: List[_Req] = []
        self._cv = threading.Condition()
        self._closed = False
        self._pool = cf.ThreadPoolExecutor(
            max_workers=decode_workers or min(8, 2 * (os.cpu_count() or 1)),
            thread_name_prefix="gcv-decode")
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="gcv-staged-batcher")
        self._worker.start()

    # ------------------------------------------------------------- request

    def submit(self, path: str, timeout: float = 600.0
               ) -> Tuple[int, float, int]:
        req = _Req(path)
        with self._cv:
            if self._closed:
                raise RuntimeError("StagedPipeline is closed")
        self._pool.submit(self._decode, req)
        if not req.event.wait(timeout):
            raise TimeoutError("staged prediction timed out")
        if req.error is not None:
            raise req.error
        assert req.result is not None
        return req.result[0], req.result[1], req.faces_found

    # -------------------------------------------------------------- stages

    def _decode(self, req: _Req) -> None:
        """Stage 1: decode in the shared pool, then mark ready."""
        from genconvit_tpu.data.video import extract_frames

        try:
            req.frames = extract_frames(req.path, self.num_frames,
                                        self.predictor.prefer_native_decode)
        except BaseException as e:  # per-request fault tolerance
            req.error = e
        with self._cv:
            self._ready.append(req)
            self._cv.notify()

    def _take_batch(self) -> Optional[List[_Req]]:
        with self._cv:
            while not self._ready and not self._closed:
                self._cv.wait()
            if not self._ready:
                return None  # closed and drained
        if self.window_s > 0:  # opt-in straggler window (default off)
            threading.Event().wait(self.window_s)
        with self._cv:
            batch = self._ready[: self.max_batch]
            del self._ready[: len(batch)]
        return batch or None

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                self._process(batch)
            except BaseException as e:  # propagate to every waiter
                for r in batch:
                    if not r.event.is_set():
                        r.error = e
                        r.event.set()

    def _process(self, batch: List[_Req]) -> None:
        from genconvit_tpu.data.faces import RecordedDetector, crop_faces
        from genconvit_tpu.data.preprocess import pad_faces
        from genconvit_tpu.infer.aggregate import DEFAULT_VERDICT

        p = self.predictor
        s = p.config.img_size

        det_items: List[_Req] = []
        for r in batch:
            if r.error is not None:
                r.event.set()
            elif r.frames is None or r.frames.size == 0:
                r.result = DEFAULT_VERDICT  # zero frames: (0, 0.5) (B2)
                r.event.set()
            else:
                det_items.append(r)
        if not det_items:
            return
        # stage 3: ONE batched detect for the whole drain
        if isinstance(p.detector, RecordedDetector):
            boxes_list = [
                p.detector.for_video(os.path.basename(r.path)).detect(r.frames)
                for r in det_items]
        else:
            boxes_list = p.detector.detect_many([r.frames for r in det_items])
        rows: List[Tuple[np.ndarray, np.ndarray]] = []
        keep: List[_Req] = []
        for r, boxes in zip(det_items, boxes_list):
            faces = crop_faces(r.frames, boxes, self.num_frames, s)
            r.frames = None  # free the full-res frames early
            r.faces_found = int(len(faces))
            if len(faces) == 0:
                r.result = DEFAULT_VERDICT
                r.event.set()
                continue
            rows.append(pad_faces(faces, self.num_frames, s))
            keep.append(r)
        if not keep:
            return
        # stage 4: pad to the warmed power-of-two bucket, ONE launch
        b = _bucket(len(keep), self.max_batch)
        faces_b = np.zeros((b,) + rows[0][0].shape, np.uint8)
        masks_b = np.zeros((b,) + rows[0][1].shape, np.float32)
        for i, (fb, mb) in enumerate(rows):
            faces_b[i] = fb
            masks_b[i] = mb
        ys, vals = p.predict_videos_batched(faces_b, masks_b)
        self.launches += 1
        self.batched_videos += len(keep)
        for i, r in enumerate(keep):
            r.result = (int(ys[i]), float(vals[i]))
            r.event.set()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._worker.join(timeout=5)
