"""Cross-request micro-batching: coalescing, correctness vs the per-video
path, fault propagation, and the HTTP server integration under concurrency."""

import concurrent.futures as cf
import json
import threading
import urllib.request

import numpy as np
import pytest

from genconvit_tpu.config import Config
from genconvit_tpu.infer.batcher import MicroBatcher
from genconvit_tpu.infer.engine import Predictor


@pytest.fixture(scope="module")
def predictor():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    return Predictor(cfg, net="ed", face_backend="fullframe")  # deterministic


def test_concurrent_requests_coalesce(predictor, rng):
    """8 concurrent submits within the window must land in strictly fewer
    launches than requests (the whole point of micro-batching), and each
    verdict must match the per-video path."""
    batcher = MicroBatcher(predictor, num_frames=3, window_ms=150.0, max_batch=8)
    videos = [(rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
              for _ in range(8)]
    # warm the bucket compile so the window isn't distorted by compile time
    batcher.submit(videos[0])
    launches_before = batcher.launches
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(batcher.submit, videos))
    coalesced_launches = batcher.launches - launches_before
    assert coalesced_launches < 8, "requests were not batched"
    for faces, (y, y_val) in zip(videos, results):
        y1, v1 = predictor.predict_faces(faces, 3)
        assert y == y1
        np.testing.assert_allclose(y_val, v1, rtol=1e-4, atol=1e-5)
    batcher.close()


def test_zero_faces_short_circuits(predictor):
    batcher = MicroBatcher(predictor, num_frames=3, window_ms=1.0)
    before = batcher.launches
    assert batcher.submit(np.zeros((0, 64, 64, 3), np.uint8)) == (0, 0.5)
    assert batcher.launches == before  # no device trip
    batcher.close()


def test_error_propagates_to_waiter(predictor, rng):
    batcher = MicroBatcher(predictor, num_frames=3, window_ms=1.0)
    bad = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)  # wrong size
    with pytest.raises(Exception):
        batcher.submit(bad)
    # the worker must survive the failed batch
    good = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    y, y_val = batcher.submit(good)
    assert y in (0, 1)
    batcher.close()


def test_server_concurrency_with_batcher(predictor, tmp_path):
    """The HTTP server with a batcher: concurrent posts all succeed and
    coalesce into fewer launches than requests."""
    import cv2
    from http.server import ThreadingHTTPServer

    from serve import make_handler

    path = str(tmp_path / "c.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 64))
    r = np.random.default_rng(0)
    for _ in range(12):
        vw.write(r.integers(0, 255, (64, 64, 3), np.uint8))
    vw.release()
    data = open(path, "rb").read()

    batcher = MicroBatcher(predictor, num_frames=3, window_ms=100.0, max_batch=8)
    batcher.submit((r.random((3, 64, 64, 3)) * 255).astype(np.uint8))  # warm
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(predictor, 3, batcher))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}/predict"
    before = batcher.launches

    def post(_):
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req) as resp:
            return json.load(resp)

    try:
        with cf.ThreadPoolExecutor(max_workers=6) as ex:
            outs = list(ex.map(post, range(6)))
        assert all(o["pred_label"] in ("REAL", "FAKE") for o in outs)
        assert batcher.launches - before < 6
    finally:
        srv.shutdown()
        batcher.close()
