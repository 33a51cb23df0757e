"""Cross-request micro-batching for serving.

The reference has no serving story at all (SURVEY.md §2: CLI-only); serve.py
adds one, and this module keeps it from collapsing to single-video latency
under concurrency: instead of serializing the chip with a per-request lock,
concurrent requests within a small window coalesce into ONE batched launch
through the engine's [V,F,...] path (infer/engine.predict_videos_batched).

Batch sizes are padded to fixed buckets (powers of two up to max_batch) so
the jit cache stays small — one compile per bucket, reused forever.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple

import numpy as np


class _Pending:
    __slots__ = ("faces", "mask", "event", "result", "error")

    def __init__(self, faces: np.ndarray, mask: np.ndarray):
        self.faces = faces
        self.mask = mask
        self.event = threading.Event()
        self.result: Optional[Tuple[int, float]] = None
        self.error: Optional[BaseException] = None


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class MicroBatcher:
    """Collects predict requests for up to `window_ms` and scores them in one
    batched device launch.

    submit() blocks the calling (request) thread until its verdict is ready.
    The single worker thread drains the queue: it waits for the first item,
    then gives the window for stragglers to join, then launches.
    """

    def __init__(self, predictor, num_frames: int, *, window_ms: float = 8.0,
                 max_batch: int = 8):
        self.predictor = predictor
        self.num_frames = num_frames
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self.launches = 0          # observability: device launches issued
        self.batched_videos = 0    # videos scored through those launches
        self._queue: List[_Pending] = []
        self._cv = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="gcv-microbatcher")
        self._worker.start()

    # ------------------------------------------------------------- request

    def submit(self, faces: np.ndarray, timeout: float = 120.0
               ) -> Tuple[int, float]:
        """faces: [k,S,S,3] uint8 (k in [0, num_frames]). Blocks until the
        batched verdict for this video is available."""
        from genconvit_tpu.data.preprocess import pad_faces
        from genconvit_tpu.infer.aggregate import DEFAULT_VERDICT

        if len(faces) == 0:
            return DEFAULT_VERDICT  # no device trip (ref prediction.py:250-253)
        batch, mask = pad_faces(faces, self.num_frames,
                                self.predictor.config.img_size)
        item = _Pending(batch, mask)
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append(item)
            self._cv.notify()
        if not item.event.wait(timeout):
            raise TimeoutError("batched prediction timed out")
        if item.error is not None:
            raise item.error
        assert item.result is not None
        return item.result

    # ------------------------------------------------------------- worker

    def _take_batch(self) -> Optional[List[_Pending]]:
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait()
            if not self._queue:
                return None  # closed and drained
        # window: let concurrent requests pile in (outside the lock so
        # submitters aren't blocked), then grab up to max_batch
        if self.window_s > 0:
            threading.Event().wait(self.window_s)
        with self._cv:
            batch = self._queue[: self.max_batch]
            del self._queue[: len(batch)]
        return batch or None

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                b = _bucket(len(batch), self.max_batch)
                faces = np.zeros((b,) + batch[0].faces.shape, np.uint8)
                masks = np.zeros((b,) + batch[0].mask.shape, np.float32)
                for i, it in enumerate(batch):
                    faces[i] = it.faces
                    masks[i] = it.mask
                ys, vals = self.predictor.predict_videos_batched(faces, masks)
                self.launches += 1
                self.batched_videos += len(batch)
                for i, it in enumerate(batch):
                    it.result = (int(ys[i]), float(vals[i]))
                    it.event.set()
            except BaseException as e:  # propagate to every waiter
                for it in batch:
                    it.error = e
                    it.event.set()

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=5)
