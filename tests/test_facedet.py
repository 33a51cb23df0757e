"""On-device face detector: shapes, NMS correctness vs numpy reference,
backend integration, and the committed checkpoint's detection quality."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genconvit_tpu.models.facedet import (
    anchor_centers, detect_batch, facedet_apply, init_facedet, nms)

ASSET = os.path.join(os.path.dirname(__file__), "..", "genconvit_tpu",
                     "assets", "facedet.gcv")
REF_FACES = "/root/reference/sample_train_data"


@pytest.fixture(scope="module")
def params():
    return init_facedet(jax.random.PRNGKey(0))


def test_anchor_count():
    assert anchor_centers().shape == (16 * 16 * 2 + 8 * 8 * 6, 2)


def test_forward_shapes(params, rng):
    x = jnp.asarray(rng.standard_normal((3, 128, 128, 3)).astype(np.float32))
    scores, boxes = facedet_apply(params, x)
    assert scores.shape == (3, 896)
    assert boxes.shape == (3, 896, 4)
    assert np.isfinite(np.asarray(boxes)).all()


def _nms_numpy(scores, boxes, max_out, score_thresh, iou_thresh):
    def corners(b):
        return b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2

    def iou(a, b):
        t1, l1, b1, r1 = corners(a)
        t2, l2, b2, r2 = corners(b)
        ih = max(0.0, min(b1, b2) - max(t1, t2))
        iw = max(0.0, min(r1, r2) - max(l1, l2))
        inter = ih * iw
        union = a[2] * a[3] + b[2] * b[3] - inter
        return inter / max(union, 1e-9)

    order = np.argsort(-scores)[:32]
    kept = []
    alive = list(order)
    while alive and len(kept) < max_out:
        j = alive[0]
        if scores[j] <= score_thresh:
            break
        kept.append(j)
        alive = [k for k in alive if iou(boxes[j], boxes[k]) < iou_thresh]
    return kept


def test_nms_matches_numpy(rng):
    scores = rng.random(100).astype(np.float32)
    centers = rng.random((100, 2)).astype(np.float32)
    sizes = (rng.random((100, 2)) * 0.3 + 0.05).astype(np.float32)
    boxes = np.concatenate([centers, sizes], -1)
    ks, kb = nms(jnp.asarray(scores), jnp.asarray(boxes), max_out=4,
                 score_thresh=0.2, iou_thresh=0.3)
    ks, kb = np.asarray(ks), np.asarray(kb)
    ref = _nms_numpy(scores, boxes, 4, 0.2, 0.3)
    got = [i for i in range(4) if np.isfinite(ks[i])]
    assert len(got) == len(ref)
    for i, j in zip(got, ref):
        np.testing.assert_allclose(kb[i], boxes[j], rtol=1e-5)
        np.testing.assert_allclose(ks[i], scores[j], rtol=1e-5)


def test_detect_batch_shapes(params, rng):
    frames = (rng.random((5, 128, 128, 3)) * 255).astype(np.uint8)
    scores, boxes = detect_batch(params, jnp.asarray(frames), max_faces=4)
    assert scores.shape == (5, 4)
    assert boxes.shape == (5, 4, 4)


def test_jax_backend_integration(rng):
    from genconvit_tpu.data.faces import JaxFaceDetector, make_detector

    det = (make_detector("jax") if os.path.isfile(ASSET)
           else JaxFaceDetector(allow_random=True))
    frames = (rng.random((2, 240, 320, 3)) * 255).astype(np.uint8)
    out = det.detect(frames)
    assert len(out) == 2
    for boxes in out:
        for (t, r, b, l) in boxes:
            assert 0 <= t < b <= 240 and 0 <= l < r <= 320


def _haar_available():
    from genconvit_tpu.data.faces import _find_cascade
    from genconvit_tpu.data.native import load_facedet_lib

    return (load_facedet_lib() is not None
            and _find_cascade("haarcascade_frontalface_default.xml"))


@pytest.mark.skipif(not _haar_available(),
                    reason="native haar shim or system cascades missing")
def test_haar_backend_smoke():
    """Native shim loads the system cascade and runs without firing on a
    faceless gradient (the quality bar lives on real frames below)."""
    from genconvit_tpu.data.faces import make_detector

    det = make_detector("haar")
    ramp = np.linspace(0, 255, 320, dtype=np.uint8)
    frames = np.broadcast_to(ramp, (2, 240, 320)).copy()
    frames = np.repeat(frames[..., None], 3, axis=-1)
    out = det.detect(frames)
    assert len(out) == 2
    for boxes in out:
        assert boxes == []


@pytest.mark.skipif(not _haar_available(),
                    reason="native haar shim or system cascades missing")
def test_haar_downscale_in_frame_coords(rng):
    """Haar only fires on real faces, so on noise this asserts the
    downscale=2 path returns boxes (if any) in full-frame coordinates and
    does not crash on odd-sized frames."""
    from genconvit_tpu.data.faces import HaarDetector

    det = HaarDetector(downscale=2)
    frames = (rng.random((2, 479, 641, 3)) * 255).astype(np.uint8)
    for boxes in det.detect(frames):
        for (t, r, b, l) in boxes:
            assert 0 <= t < b <= 479 and 0 <= l < r <= 641


@pytest.mark.skipif(not _haar_available(),
                    reason="native haar shim or system cascades missing")
def test_haar_downscale_env_default(monkeypatch):
    """make_detector injects the production detection-downscale default
    (2) for haar/hybrid; GENCONVIT_HAAR_DOWNSCALE overrides it; an explicit
    kwarg wins over both; direct construction keeps the full-res class
    default (docs/performance.md, round-4 measured trade)."""
    from genconvit_tpu.data.faces import HaarDetector, make_detector

    monkeypatch.delenv("GENCONVIT_HAAR_DOWNSCALE", raising=False)
    assert make_detector("haar").downscale == 2
    monkeypatch.setenv("GENCONVIT_HAAR_DOWNSCALE", "1")
    assert make_detector("haar").downscale == 1
    monkeypatch.setenv("GENCONVIT_HAAR_DOWNSCALE", "not-an-int")
    assert make_detector("haar").downscale == 2  # malformed env -> default
    monkeypatch.setenv("GENCONVIT_HAAR_DOWNSCALE", "4")
    assert make_detector("haar", downscale=3).downscale == 3
    assert HaarDetector().downscale == 1  # library default unchanged


@pytest.mark.skipif(not os.path.isfile(ASSET) or not os.path.isdir(REF_FACES),
                    reason="committed facedet asset or reference mount missing")
def test_committed_checkpoint_iou_on_heldout_faces():
    """The shipped detector (trained on train/valid-split composites) must
    localize HELD-OUT test-split faces: mean IoU >= 0.5 and >= 75% of
    single-face composites detected at IoU >= 0.5 (VERDICT r1 item 2 bar)."""
    from genconvit_tpu.core.checkpoint import load_checkpoint
    from genconvit_tpu.data.facedet_synth import composite_sample, load_face_crops

    params = load_checkpoint(ASSET)["params"]
    faces = load_face_crops(REF_FACES, ("test",))
    assert faces, "no held-out faces found"
    gen = np.random.default_rng(4242)
    imgs, gts = [], []
    while len(imgs) < 48:
        img, boxes = composite_sample(faces, [], gen)
        if len(boxes) != 1:
            continue
        imgs.append(img)
        gts.append(boxes[0])
    scores, boxes = detect_batch(params, jnp.asarray(np.stack(imgs)),
                                 max_faces=1, score_thresh=0.1)
    scores, boxes = np.asarray(scores)[:, 0], np.asarray(boxes)[:, 0]
    ious = []
    for (cy, cx, h, w), (gy, gx, gh, gw), s in zip(boxes, gts, scores):
        if not np.isfinite(s):
            ious.append(0.0)
            continue
        ih = max(0.0, min(cy + h / 2, gy + gh / 2) - max(cy - h / 2, gy - gh / 2))
        iw = max(0.0, min(cx + w / 2, gx + gw / 2) - max(cx - w / 2, gx - gw / 2))
        inter = ih * iw
        ious.append(inter / max(h * w + gh * gw - inter, 1e-9))
    ious = np.array(ious)
    assert ious.mean() >= 0.5, f"mean IoU {ious.mean():.3f}"
    assert (ious >= 0.5).mean() >= 0.75, f"det-rate {(ious >= 0.5).mean():.3f}"


@pytest.mark.skipif(not os.path.isfile(ASSET) or not os.path.isdir(
    "/root/reference/sample_prediction_data"),
    reason="committed facedet asset or reference mount missing")
def test_committed_checkpoint_fires_on_real_frames():
    """In-domain sanity: on real sample-video frames the default jax backend
    must produce face boxes for most frames (the round-1 failure mode was a
    silent fullframe fallback because no backend worked offline)."""
    from genconvit_tpu.data.faces import make_detector
    from genconvit_tpu.data.video import extract_frames

    det = make_detector("jax")
    d = "/root/reference/sample_prediction_data"
    vids = sorted(f for f in os.listdir(d) if f.endswith(".mp4"))[:4]
    fired = total = 0
    for v in vids:
        frames = extract_frames(os.path.join(d, v), 3)
        for boxes in det.detect(frames):
            total += 1
            fired += bool(boxes)
    assert fired / total >= 0.6, f"detector fired on only {fired}/{total} frames"


def test_facedet_training_overfits_synthetic(rng):
    """A few steps on a tiny synthetic box dataset must reduce the loss and
    make the detector find the synthetic 'face'."""
    import optax

    from genconvit_tpu.train.facedet_train import (
        assign_targets, make_facedet_train_step)
    from genconvit_tpu.models.facedet import detect_batch, init_facedet

    def synth(n):
        imgs, boxes = [], []
        for i in range(n):
            img = np.zeros((128, 128, 3), np.uint8)
            cy, cx = rng.uniform(0.3, 0.7, 2)
            h = w = 0.25
            t, l = int((cy - h / 2) * 128), int((cx - w / 2) * 128)
            img[t:t + 32, l:l + 32] = 200  # bright square = "face"
            imgs.append(img)
            boxes.append([[cy, cx, h, w]])
        return imgs, boxes

    imgs, boxes = synth(16)
    labels, regs = zip(*[assign_targets(b) for b in boxes])
    params = init_facedet(jax.random.PRNGKey(0))
    tx = optax.adam(2e-3)
    opt = tx.init(params)
    step = make_facedet_train_step(tx)
    ib = jnp.asarray(np.stack(imgs))
    lb = jnp.asarray(np.stack(labels))
    rb = jnp.asarray(np.stack(regs))
    losses = []
    for _ in range(120):
        params, opt, loss, _ = step(params, opt, ib, lb, rb)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    scores, det = detect_batch(params, ib[:2], max_faces=1, score_thresh=0.1)
    assert np.isfinite(np.asarray(scores)).any()


@pytest.mark.skipif(not os.path.isfile(ASSET) or not os.path.isdir(
    "/root/reference/sample_prediction_data"),
    reason="committed facedet asset or reference mount missing")
def test_realframe_fixture_iou():
    """Real-frame quality bar (VERDICT r2 item #3): on the curated fixture
    (tests/fixtures/facedet_realframes.json — hand-curated boxes on decoded
    reference sample videos, NOT the synthetic training distribution) the
    jax backend must (a) clear an absolute IoU bar and (b) beat the
    fullframe fallback's crop geometry by a wide margin. Subsampled to 3
    frames/video to keep CI time bounded; the full table lives in STATUS.md
    (tools/facedet_realframe_fixture.py eval)."""
    import json

    import cv2

    from genconvit_tpu.data.faces import make_detector

    fix_path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "facedet_realframes.json")
    with open(fix_path) as f:
        fixture = json.load(f)["boxes"]
    by_video = {}
    for key, e in sorted(fixture.items()):
        name, fi = key.rsplit("#", 1)
        by_video.setdefault(name, []).append((int(fi), e["box"]))

    def iou(a, b):
        t = max(a[0], b[0]); btm = min(a[2], b[2])
        lf = max(a[3], b[3]); r = min(a[1], b[1])
        inter = max(0, btm - t) * max(0, r - lf)
        area = lambda x: (x[2] - x[0]) * (x[1] - x[3])  # noqa: E731
        union = area(a) + area(b) - inter
        return inter / union if union else 0.0

    backends = {"jax": make_detector("jax")}
    if _haar_available():
        backends["hybrid"] = make_detector("hybrid")
    ious = {b: [] for b in backends}
    ious_full = []
    for name, items in by_video.items():
        # bare names live in sample_prediction_data; '/'-prefixed keys are
        # relative to the reference root (tools/facedet_realframe_fixture.py
        # resolve_video)
        vp = (os.path.join("/root/reference", name) if "/" in name else
              os.path.join("/root/reference/sample_prediction_data", name))
        cap = cv2.VideoCapture(vp)
        frames, gts = [], []
        for fi, box in sorted(items)[::5][:3]:
            cap.set(cv2.CAP_PROP_POS_FRAMES, fi)
            ok, fr = cap.read()
            if ok:
                frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
                gts.append(tuple(box))
        cap.release()
        if not frames:
            continue
        arr = np.stack(frames)
        h, w = arr.shape[1:3]
        for b, det in backends.items():
            for gt, found in zip(gts, det.detect(arr)):
                ious[b].append(max((iou(gt, d) for d in found), default=0.0))
        for gt in gts:
            ious_full.append(iou(gt, (0, w, h, 0)))
    mean_jax = float(np.mean(ious["jax"]))
    mean_full = float(np.mean(ious_full))
    assert mean_jax >= 0.35, f"jax real-frame mean IoU {mean_jax:.3f}"
    assert np.mean([v >= 0.5 for v in ious["jax"]]) >= 0.40, \
        f"jax det-rate@0.5 {np.mean([v >= 0.5 for v in ious['jax']]):.3f}"
    assert mean_jax > 1.5 * mean_full, \
        f"jax {mean_jax:.3f} vs fullframe {mean_full:.3f}"
    if "hybrid" in ious:
        # staged scored cascades + calibration, fused with jax. Since the
        # round-5 hard-negative distillation the jax student EXCEEDS the
        # hybrid on the extended 148-frame fixture (jax 0.672 / hybrid
        # 0.656 / haar 0.573; zero-leakage holdouts jax 0.735/0.688 vs
        # hybrid 0.743/0.644) — so the old hybrid>=jax ordering no longer
        # holds; both must clear the same floor, and they must agree within
        # a band (the fusion shares the jax proposals, so a large gap
        # signals a fusion regression, not a quality ranking).
        mean_hybrid = float(np.mean(ious["hybrid"]))
        assert mean_hybrid >= 0.50, \
            f"hybrid real-frame mean IoU {mean_hybrid:.3f}"
        assert abs(mean_hybrid - mean_jax) <= 0.15, \
            f"hybrid {mean_hybrid:.3f} vs jax {mean_jax:.3f} diverged"


def test_apply_calib_geometry():
    """Calibration math: dx is in the facing direction (flips when the
    detection came from the mirrored pass), sizes scale about the shifted
    center, output clipped to the frame."""
    from genconvit_tpu.data.faces import _apply_calib

    box = (100, 300, 300, 100)  # (t, r, b, l), 200x200, center (200, 200)
    # pure shift down by 0.1 * size
    t, r, b, l = _apply_calib(box, False, (0.0, 0.1, 1.0, 1.0), 1000, 1000)
    assert (t, r, b, l) == (120, 300, 320, 100)
    # dx=+0.1 moves right unmirrored, left mirrored
    assert _apply_calib(box, False, (0.1, 0.0, 1.0, 1.0), 1000, 1000) \
        == (100, 320, 300, 120)
    assert _apply_calib(box, True, (0.1, 0.0, 1.0, 1.0), 1000, 1000) \
        == (100, 280, 300, 80)
    # shrink width to 0.5 about the center
    t, r, b, l = _apply_calib(box, False, (0.0, 0.0, 0.5, 1.0), 1000, 1000)
    assert (r - l, b - t) == (100, 200) and (l + r) // 2 == 200
    # clipping
    t, r, b, l = _apply_calib((0, 300, 200, 100), False,
                              (0.0, -0.5, 1.0, 1.5), 1000, 1000)
    assert t == 0 and b <= 1000


class _StubLib:
    """Stands in for the native shim: scripted scored detections."""

    def __init__(self, per_cascade):
        # per_cascade: list (one per created handle) of
        #   {frame_idx: [(x, y, w, h, weight), ...]}  (descending weight)
        self._per_cascade = per_cascade
        self._created = 0

    def gcv_haar_create(self, path):
        self._created += 1
        return self._created  # 1-based handle == cascade index + 1

    def gcv_haar_destroy(self, handle):
        pass

    def gcv_haar_detect_scored(self, handle, gray_p, n, h, w, sf, mn,
                               ms, rects_p, weights_p, counts_p, max_per):
        import ctypes

        dets = self._per_cascade[handle - 1]
        rects = np.ctypeslib.as_array(
            ctypes.cast(rects_p, ctypes.POINTER(ctypes.c_int32)),
            (n, max_per, 4))
        weights = np.ctypeslib.as_array(
            ctypes.cast(weights_p, ctypes.POINTER(ctypes.c_double)),
            (n, max_per))
        counts = np.ctypeslib.as_array(
            ctypes.cast(counts_p, ctypes.POINTER(ctypes.c_int32)), (n,))
        for i in range(n):
            ds = dets.get(i, [])[:max_per]
            counts[i] = len(ds)
            for j, (x, y, bw, bh, wt) in enumerate(ds):
                rects[i, j] = (x, y, bw, bh)
                weights[i, j] = wt
        return 0


def _stub_haar(monkeypatch, per_cascade, **kwargs):
    from genconvit_tpu.data import faces as faces_mod
    from genconvit_tpu.data import native as native_mod

    stub = _StubLib(per_cascade)
    monkeypatch.setattr(native_mod, "_facedet_lib", stub)
    monkeypatch.setattr(native_mod, "_facedet_failed", False)
    det = faces_mod.HaarDetector(calibrate=False, **kwargs)
    assert det._scored
    return det


def test_staged_front_thresh_vetoes_weak_detections(monkeypatch):
    """A frontal detection below front_thresh is vetoed; the frame falls
    through to the profile stage (here: empty), not to the weak box."""
    frames = np.zeros((2, 100, 100, 3), np.uint8)
    det = _stub_haar(monkeypatch, [
        {0: [(10, 10, 30, 30, 8.0), (50, 50, 20, 20, 2.0)],
         1: [(40, 40, 20, 20, 1.5)]},   # frame 1: only a weak frontal
        {},                              # profile cascade: nothing
    ])
    out = det.detect(frames)
    assert out[0] == [(10, 40, 40, 10)]  # weak 2.0 co-detection dropped too
    assert out[1] == []


def test_staged_profile_fallback_mirrored_coords(monkeypatch):
    """Frames without a confident frontal hit use the best profile
    detection; the mirrored pass's boxes come back in unmirrored frame
    coordinates."""
    frames = np.zeros((1, 100, 200, 3), np.uint8)
    # profile cascade sees the plain frame (weight 1.0) and the mirrored
    # frame (weight 3.0) -> the mirrored one wins
    calls = []

    class _Recorder(_StubLib):
        def gcv_haar_detect_scored(self, handle, gray_p, n, h, w, *a):
            calls.append((handle, n, h, w))
            return super().gcv_haar_detect_scored(handle, gray_p, n, h, w, *a)

    from genconvit_tpu.data import faces as faces_mod
    from genconvit_tpu.data import native as native_mod

    stub = _Recorder([
        {},  # frontal finds nothing
        {0: [(20, 30, 40, 40, 3.0)]},  # fires on BOTH profile passes
    ])
    monkeypatch.setattr(native_mod, "_facedet_lib", stub)
    monkeypatch.setattr(native_mod, "_facedet_failed", False)
    det = faces_mod.HaarDetector(calibrate=False)
    out = det.detect(frames)
    # 3 scored calls: frontal, profile plain, profile mirrored
    assert [c[0] for c in calls] == [1, 2, 2]
    # same raw rect from both passes, same weight -> plain pass kept
    # (x=20, w=40): t=30, r=60, b=70, l=20
    assert out[0] == [(30, 60, 70, 20)]


def test_staged_profile_mirror_unflips(monkeypatch):
    """A detection ONLY on the mirrored pass maps back to x' = W - x."""
    frames = np.zeros((1, 100, 200, 3), np.uint8)

    class _MirrorOnly(_StubLib):
        def __init__(self):
            super().__init__([{}, {}])
            self.call = 0

        def gcv_haar_detect_scored(self, handle, gray_p, n, h, w, sf, mn,
                                   ms, rects_p, weights_p, counts_p,
                                   max_per):
            import ctypes

            self.call += 1
            counts = np.ctypeslib.as_array(
                ctypes.cast(counts_p, ctypes.POINTER(ctypes.c_int32)), (n,))
            if self.call == 3:  # mirrored profile pass only
                rects = np.ctypeslib.as_array(
                    ctypes.cast(rects_p, ctypes.POINTER(ctypes.c_int32)),
                    (n, max_per, 4))
                weights = np.ctypeslib.as_array(
                    ctypes.cast(weights_p, ctypes.POINTER(ctypes.c_double)),
                    (n, max_per))
                counts[0] = 1
                rects[0, 0] = (10, 20, 50, 40)  # x,y,w,h in mirrored coords
                weights[0, 0] = 2.0
            else:
                counts[:] = 0
            return 0

    from genconvit_tpu.data import faces as faces_mod
    from genconvit_tpu.data import native as native_mod

    monkeypatch.setattr(native_mod, "_facedet_lib", _MirrorOnly())
    monkeypatch.setattr(native_mod, "_facedet_failed", False)
    det = faces_mod.HaarDetector(calibrate=False)
    out = det.detect(frames)
    # mirrored x:[10,60] -> frame x:[200-60, 200-10] = [140, 190]
    assert out[0] == [(20, 190, 60, 140)]


def test_hybrid_fusion_blends_agreeing_boxes(monkeypatch):
    """Hybrid averages a cascade box with an overlapping jax box at
    fuse_weight, keeps the cascade box when jax disagrees, and uses jax
    outright when the cascades found nothing."""
    from genconvit_tpu.data import faces as faces_mod

    class _FakeHaar:
        def detect(self, frames):
            return [[(100, 200, 200, 100)], [], [(0, 50, 50, 0)]]

    class _FakeJax:
        def detect(self, frames):
            return [[(110, 210, 210, 110)],  # agrees with haar frame 0
                    [(40, 80, 80, 40)],      # fallback frame 1
                    [(400, 460, 460, 400)]]  # disagrees frame 2

    hy = faces_mod.HybridFaceDetector.__new__(faces_mod.HybridFaceDetector)
    hy.haar, hy.jax = _FakeHaar(), _FakeJax()
    hy.fuse_weight, hy.fuse_iou = 0.5, 0.3
    out = hy.detect(np.zeros((3, 500, 500, 3), np.uint8))
    # (100 + 0.5*110)/1.5 = 103.33 -> 103; (200 + 0.5*210)/1.5 = 203.33
    assert out[0] == [(103, 203, 203, 103)]
    assert out[1] == [(40, 80, 80, 40)]
    assert out[2] == [(0, 50, 50, 0)]


def test_distill_window_crops_geometry():
    """tools/facedet_distill.window_crops: every emitted sample is a valid
    INPUT_SIZE crop whose normalized box (cy,cx,h,w) round-trips to the
    teacher box within the crop, and negatives carry no boxes."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.facedet_distill import window_crops

    from genconvit_tpu.models.facedet import INPUT_SIZE

    gen = np.random.default_rng(7)
    frame = (gen.random((720, 1280, 3)) * 255).astype(np.uint8)
    teacher_box = (200, 700, 460, 480)  # (t, r, b, l): 260x220 face
    harvested = [("vid.mp4", frame, teacher_box)] * 8
    samples = window_crops(harvested, np.random.default_rng(0), per_det=3)
    assert len(samples) >= 8
    pos = neg = 0
    for img, boxes in samples:
        assert img.shape == (INPUT_SIZE, INPUT_SIZE, 3)
        assert img.dtype == np.uint8
        if not boxes:
            neg += 1
            continue
        pos += 1
        (cy, cx, bh, bw) = boxes[0]
        # in-domain face fraction (0.30-0.80 of the window), inside [0,1]
        assert 0.0 <= cy <= 1.0 and 0.0 <= cx <= 1.0
        assert 0.1 <= bh <= 1.0 and 0.1 <= bw <= 1.0
    assert pos >= 8 and neg >= 1


def test_intact_crop_edge_bias():
    """facedet_synth._intact_crop: crop left positions prefer both frame
    edges over the center (regression for the 50%-pinned-to-zero bug).

    The crop's top-left pixel decodes `left` from a full-range column
    gradient (value ~= left*255/(w-1), no mod-256 wrap; INTER_AREA block
    averaging shifts it by <3 units). Bars were set by simulating the
    three candidate samplers at w=1280, side~U(0.3,0.9)*360 (20k draws):
      edge-biased (shipped): lo=0.13  hi=0.24  center=0.39
      uniform (no bias):     lo=0.06  hi=0.16  center=0.52
      50%-pinned-to-zero:    lo=0.62  hi=0.04  center=0.20
    so lo>=0.09 rejects uniform, hi>=0.19 rejects uniform AND pinned,
    center<=0.46 rejects uniform — each failure mode trips a bar."""
    from genconvit_tpu.data.facedet_synth import _intact_crop

    gen = np.random.default_rng(11)
    w = 1280
    grad = np.tile((np.arange(w) * 255.0 / (w - 1)).astype(np.uint8),
                   (360, 1))
    f = np.stack([grad, grad, grad], -1)  # gray gradient: skin veto off
    vals = []
    for _ in range(500):
        crop = _intact_crop(gen, [f])
        if crop is not None:
            vals.append(int(crop[0, 0, 0]))
    assert len(vals) >= 300
    v = np.array(vals)
    lo = (v <= 12).mean()
    hi = (v >= 178).mean()
    center = ((v > 40) & (v < 150)).mean()
    assert lo >= 0.09, f"hard-left mass {lo:.3f} (uniform-like: no edge bias)"
    assert hi >= 0.19, f"hard-right mass {hi:.3f} (pinned-to-zero regression)"
    assert center <= 0.46, f"center mass {center:.3f} (no edge preference)"


def test_detect_many_matches_per_video_detect(rng):
    """Grouped detection (one device call for all videos — the
    predict_files_group_detect driver) must produce BITWISE the same boxes
    as per-video detect, across mixed resolutions."""
    from genconvit_tpu.data.faces import JaxFaceDetector, make_detector

    det = (make_detector("jax") if os.path.isfile(ASSET)
           else JaxFaceDetector(allow_random=True))
    vids = [
        (rng.random((3, 240, 320, 3)) * 255).astype(np.uint8),
        (rng.random((2, 320, 240, 3)) * 255).astype(np.uint8),
        (rng.random((4, 128, 128, 3)) * 255).astype(np.uint8),
    ]
    grouped = det.detect_many(vids)
    solo = [det.detect(v) for v in vids]
    assert grouped == solo


def test_detect_many_base_fallback(rng):
    """Detectors without a batched override run the serial loop with
    identical results (the engine driver accepts any backend)."""
    from genconvit_tpu.data.faces import CenterDetector

    det = CenterDetector()
    vids = [(rng.random((2, 100, 160, 3)) * 255).astype(np.uint8),
            (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)]
    assert det.detect_many(vids) == [det.detect(v) for v in vids]


def test_detect_many_empty_video_entry(rng):
    from genconvit_tpu.data.faces import JaxFaceDetector

    det = JaxFaceDetector(allow_random=True)
    vids = [np.zeros((0, 240, 320, 3), np.uint8),
            (rng.random((2, 240, 320, 3)) * 255).astype(np.uint8)]
    out = det.detect_many(vids)
    assert out[0] == [] and len(out[1]) == 2
