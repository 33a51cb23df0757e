#!/usr/bin/env python
"""Minimal production serving endpoint.

POST a video to /predict and get the REAL/FAKE verdict JSON; GET /healthz for
liveness. The model stays resident and jitted; host preprocessing runs per
request while the chip is shared across requests (the engine's fixed-shape
compile cache means no recompiles after warmup).

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


def make_handler(predictor, num_frames: int, batcher=None):
    """batcher: optional infer.batcher.MicroBatcher — concurrent requests
    coalesce into one batched launch instead of serializing the chip behind
    a lock. Falls back to lock-serialized per-video calls when None."""
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
                # videos (the batcher's whole point is launches << videos)
                if batcher is not None:
                    self._reply(200, {"mode": "micro-batched",
                                      "device_launches": batcher.launches,
                                      "videos_scored": batcher.batched_videos})
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
                faces = predictor.extract_faces(tmp.name, num_frames)
                if batcher is not None:
                    y, y_val = batcher.submit(faces)
                else:
                    with lock:
                        y, y_val = predictor.predict_faces(faces, num_frames)
                from genconvit_tpu.infer.aggregate import real_or_fake

                self._reply(200, {
                    "pred_label": real_or_fake(y),
                    "pred": round(float(y_val), 6),
                    "y": int(y),
                    "num_frames": num_frames,
                    "faces_found": int(len(faces)),
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
    p.add_argument("--batch-window-ms", type=float, default=8.0,
                   help="micro-batch window; 0 disables cross-request batching")
    p.add_argument("--max-batch", type=int, default=8)
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

    batcher = None
    if args.batch_window_ms > 0:
        from genconvit_tpu.infer.batcher import MicroBatcher

        batcher = MicroBatcher(predictor, args.f,
                               window_ms=args.batch_window_ms,
                               max_batch=args.max_batch)
        # warm EVERY power-of-two bucket the batcher can launch (1,2,4,...,
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
    log.info("model warm; serving on %s:%d (micro-batch window %.1fms)",
             args.host, args.port, args.batch_window_ms)

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(predictor, args.f, batcher))
    server.serve_forever()


if __name__ == "__main__":
    main()
