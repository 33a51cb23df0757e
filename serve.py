#!/usr/bin/env python
"""Minimal production serving endpoint.

POST a video to /predict and get the REAL/FAKE verdict JSON; GET /healthz for
liveness. The model stays resident and jitted; requests flow through the
STAGED pipeline by default (infer/serve_pipeline.py — the serving analog of
the engine's grouped production driver: shared decode pool, greedy drain,
one batched detect, one batched launch per drain). `--batcher micro`
restores the window-based MicroBatcher, `--batcher none` the lock-serialized
per-request path (both kept as measured baselines, docs/performance.md).

  python serve.py [--port 8787] [--net genconvit] [--f 15] [--fp16]
  curl -s -X POST --data-binary @video.mp4 localhost:8787/predict
  -> {"pred_label": "FAKE", "pred": 0.93, "y": 0, "num_frames": 15}

Stdlib HTTP server (threaded) — no extra dependencies; front with a real
ingress for multi-host deployments (shard_file_list covers batch jobs).
"""

import argparse
import json
import logging
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("genconvit_tpu.serve")


def make_handler(predictor, num_frames: int, batcher=None, pipeline=None):
    """pipeline: infer.serve_pipeline.StagedPipeline (production staging).
    batcher: infer.batcher.MicroBatcher (window-based device batching only).
    With neither, requests lock-serialize the chip per video."""
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/statz":
                # device-side accounting: how many launches served how many
                # videos (the staging's whole point is launches << videos)
                src = pipeline or batcher
                if src is not None:
                    self._reply(200, {
                        "mode": ("staged" if pipeline is not None
                                 else "micro-batched"),
                        "device_launches": src.launches,
                        "videos_scored": src.batched_videos})
                else:
                    self._reply(200, {"mode": "lock-serialized"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > 1 << 30:
                self._reply(400, {"error": "missing or oversized body"})
                return
            data = self.rfile.read(length)
            suffix = ".mp4"
            if "avi" in (self.headers.get("Content-Type") or ""):
                suffix = ".avi"
            tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
            try:
                tmp.write(data)
                tmp.close()
                if pipeline is not None:
                    # staged: decode/detect/crop/launch all shared
                    y, y_val, faces_found = pipeline.submit(tmp.name)
                else:
                    faces = predictor.extract_faces(tmp.name, num_frames)
                    faces_found = int(len(faces))
                    if batcher is not None:
                        y, y_val = batcher.submit(faces)
                    else:
                        with lock:
                            y, y_val = predictor.predict_faces(faces,
                                                               num_frames)
                from genconvit_tpu.infer.aggregate import real_or_fake

                self._reply(200, {
                    "pred_label": real_or_fake(y),
                    "pred": round(float(y_val), 6),
                    "y": int(y),
                    "num_frames": num_frames,
                    "faces_found": faces_found,
                })
            except Exception as e:  # per-request fault tolerance
                log.error("predict failed: %s", e)
                self._reply(500, {"error": str(e)})
            finally:
                os.unlink(tmp.name)

        def log_message(self, fmt, *args):
            log.info("%s %s", self.address_string(), fmt % args)

    return Handler


def main():
    p = argparse.ArgumentParser("genconvit_tpu serving")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--net", choices=["ed", "vae", "genconvit"],
                   default="genconvit")
    p.add_argument("--f", type=int, default=15)
    p.add_argument("--fp16", action="store_true")
    p.add_argument("--face-backend", default=None)
    p.add_argument("--weights-dir", default="weight")
    p.add_argument("--batcher", choices=["staged", "micro", "none"],
                   default="staged",
                   help="staged = production pipeline (default); micro = "
                        "window-based device batching; none = per-request "
                        "lock")
    p.add_argument("--batch-window-ms", type=float, default=None,
                   help="straggler window: micro default 8ms, staged "
                        "default 0 (greedy drain). For backward compat, "
                        "explicit 0 with --batcher micro selects 'none'.")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--decode-workers", type=int, default=None,
                   help="staged decode pool size (default 2x cores, <=8)")
    args = p.parse_args()

    from genconvit_tpu.config import load_config
    from genconvit_tpu.infer.engine import Predictor

    config = load_config()
    config.weight_dir = args.weights_dir
    predictor = Predictor(config, net=args.net, fp16=args.fp16,
                          face_backend=args.face_backend)
    # warm the compile cache so the first request isn't a 30-80s compile
    import numpy as np

    predictor.predict_faces(
        np.zeros((1, config.img_size, config.img_size, 3), np.uint8), args.f)

    mode = args.batcher
    if mode == "micro" and args.batch_window_ms == 0:
        mode = "none"  # old `--batch-window-ms 0` semantics
    batcher = pipeline = None
    if mode in ("staged", "micro"):
        # warm EVERY power-of-two bucket the staging can launch (1,2,4,...,
        # max_batch): each distinct [B,F,...] shape is its own XLA
        # compilation, and an un-warmed bucket turns the first concurrent
        # burst into a 30-80s compile INSIDE a request (measured: p50 90.5s
        # vs 5.5s lock-serialized on the relay before this warmup existed)
        b = 1
        while b <= args.max_batch:
            predictor.predict_videos_batched(
                np.zeros((b, args.f, config.img_size, config.img_size, 3),
                         np.uint8),
                np.ones((b, args.f), np.float32))
            log.info("warmed batch bucket B=%d", b)
            b *= 2
    if mode == "staged":
        from genconvit_tpu.infer.serve_pipeline import StagedPipeline

        pipeline = StagedPipeline(
            predictor, args.f, max_batch=args.max_batch,
            decode_workers=args.decode_workers,
            window_ms=args.batch_window_ms or 0.0)
    elif mode == "micro":
        from genconvit_tpu.infer.batcher import MicroBatcher

        batcher = MicroBatcher(
            predictor, args.f,
            window_ms=(8.0 if args.batch_window_ms is None
                       else args.batch_window_ms),
            max_batch=args.max_batch)
    log.info("model warm; serving on %s:%d (batcher=%s)",
             args.host, args.port, mode)

    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(predictor, args.f, batcher, pipeline))
    server.serve_forever()


if __name__ == "__main__":
    main()
