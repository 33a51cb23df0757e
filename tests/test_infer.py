"""Inference pipeline tests: frame sampling bit-match, aggregation semantics
vs the reference formulas (recomputed in torch), face-budget quirk, engine
end-to-end on synthetic videos, result schema."""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from genconvit_tpu.config import Config
from genconvit_tpu.data.faces import crop_faces, make_detector
from genconvit_tpu.data.frames import sample_frame_indices
from genconvit_tpu.infer.aggregate import aggregate_logits, real_or_fake
from genconvit_tpu.infer.engine import Predictor
from genconvit_tpu.infer.result import set_result, store_result


def _reference_max_prediction_value(y_pred: torch.Tensor):
    """Recomputed reference semantics (ref model/pred_func.py:111-131):
    sigmoid -> mean over frames -> (argmax, pseudo-P(fake))."""
    mean_val = torch.mean(torch.sigmoid(y_pred), dim=0)
    return (
        int(torch.argmax(mean_val)),
        float(mean_val[0]) if mean_val[0] > mean_val[1] else abs(1 - float(mean_val[1])),
    )


class TestFrameSampling:
    @pytest.mark.parametrize("n,f", [(300, 15), (10, 15), (1, 15), (44, 10),
                                     (15, 15), (16, 15), (450, 15), (0, 15)])
    def test_bit_match(self, n, f):
        # oracle: step = max(1, n // f); list(range(0, n, step))[:f]
        if n <= 0:
            assert sample_frame_indices(n, f) == []
            return
        step = max(1, n // f)
        assert sample_frame_indices(n, f) == list(range(0, n, step))[:f]


class TestAggregation:
    @pytest.mark.parametrize("k", [1, 3, 15])
    def test_matches_reference_formula(self, rng, k):
        logits = rng.standard_normal((k, 2)).astype(np.float32)
        y_ref, val_ref = _reference_max_prediction_value(torch.from_numpy(logits))
        y, val = aggregate_logits(jnp.asarray(logits), jnp.ones((k,)))
        assert int(y) == y_ref
        np.testing.assert_allclose(float(val), val_ref, rtol=1e-5, atol=1e-6)

    def test_masked_rows_are_ignored(self, rng):
        logits = rng.standard_normal((4, 2)).astype(np.float32)
        padded = np.concatenate([logits, 100 * np.ones((3, 2), np.float32)])
        mask = np.array([1, 1, 1, 1, 0, 0, 0], np.float32)
        y_a, v_a = aggregate_logits(jnp.asarray(logits), jnp.ones((4,)))
        y_b, v_b = aggregate_logits(jnp.asarray(padded), jnp.asarray(mask))
        assert int(y_a) == int(y_b)
        np.testing.assert_allclose(float(v_a), float(v_b), rtol=1e-5)

    def test_label_mapping_quirk_b2(self):
        # class index 0 = FAKE at the model output (SURVEY.md §8 B2):
        # {0:'REAL',1:'FAKE'}[y ^ 1]
        assert real_or_fake(0) == "FAKE"
        assert real_or_fake(1) == "REAL"


class TestFaceBudget:
    def test_multi_face_frames_consume_slots(self):
        """Quirk B7 (ref model/pred_func.py:78-90): every face in every frame
        consumes a budget slot, in frame-then-box order — so a multi-face
        frame can starve later frames. Frames/regions carry distinct values
        so the test asserts WHICH crops landed, not just the shape."""
        frames = np.zeros((3, 64, 64, 3), np.uint8)
        frames[0, :32, :32] = 10   # f0 face 1: top-left quadrant
        frames[0, 32:, 32:] = 20   # f0 face 2: bottom-right quadrant
        frames[1] = 30
        frames[2] = 40
        boxes = [[(0, 32, 32, 0), (32, 64, 64, 32)],  # 2 faces in frame 0
                 [(0, 64, 64, 0)],
                 [(0, 64, 64, 0)]]
        faces = crop_faces(frames, boxes, budget=3, img_size=32)
        assert faces.shape == (3, 32, 32, 3)
        # budget 3: f0 contributes 2 slots, f1 one -> f2's face (40) dropped
        np.testing.assert_array_equal(faces[0], 10)
        np.testing.assert_array_equal(faces[1], 20)
        np.testing.assert_array_equal(faces[2], 30)

    def test_zero_faces(self):
        frames = np.zeros((2, 32, 32, 3), np.uint8)
        faces = crop_faces(frames, [[], []], budget=5, img_size=32)
        assert faces.shape[0] == 0


def _write_synth_video(path, n_frames=24, size=64):
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (size, size))
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = np.full((size, size, 3), (i * 9) % 255, np.uint8)
        frame[16:48, 16:48] = rng.integers(0, 255, (32, 32, 3), np.uint8)
        vw.write(frame)
    vw.release()


@pytest.fixture(scope="module")
def synth_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vids") / "synth.mp4")
    _write_synth_video(path)
    return path


@pytest.fixture(scope="module")
def small_predictor():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"  # forces random init
    return Predictor(cfg, net="genconvit", face_backend="fullframe", seed=0)


class TestEngine:
    @pytest.mark.parametrize("hwc", ["1", "0"])
    def test_device_head_init(self, monkeypatch, hwc):
        """init_heads_on_device=True: random init generates the VAE latent
        heads with one jitted graph directly in final layout/dtype (the
        bench cold-start path — host materialization of the 630M-param
        heads + the HWC fold cost minutes on degraded hosts)."""
        monkeypatch.setenv("GENCONVIT_VAE_HWC", hwc)
        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        p = Predictor(cfg, net="genconvit", face_backend="fullframe", seed=0,
                      init_heads_on_device=True)
        enc = p.params["vae"]["encoder"]
        want = ("mu_hwc", "var_hwc") if hwc == "1" else ("mu", "var")
        assert all(k in enc for k in want)
        flat = 128 * (64 // 16) ** 2
        assert enc[want[0]]["kernel"].shape == (flat, cfg.model.latent_dims)
        # torch Linear default bound = 1/sqrt(fan_in) (ops/init.py)
        assert float(jnp.abs(enc[want[0]]["kernel"]).max()) <= flat ** -0.5
        faces = np.random.default_rng(0).integers(
            0, 255, (5, 64, 64, 3), dtype=np.uint8)
        label, pred = p.predict_faces(faces, num_frames=5)
        assert label in (0, 1) and np.isfinite(pred)

    def test_skip_latent_heads_keeps_other_leaves(self):
        """skip_latent_heads must only omit mu/var — every other leaf equals
        the full init (the key stream is advanced identically)."""
        from genconvit_tpu.models.vae import init_vae
        import jax

        full = init_vae(jax.random.PRNGKey(3), img_size=64, latent_dims=1024)
        skipped = init_vae(jax.random.PRNGKey(3), img_size=64,
                           latent_dims=1024, skip_latent_heads=True)
        assert "mu" not in skipped["encoder"] and "var" not in skipped["encoder"]
        full["encoder"].pop("mu"), full["encoder"].pop("var")
        leaves_a = jax.tree_util.tree_leaves_with_path(full)
        leaves_b = jax.tree_util.tree_leaves_with_path(skipped)
        assert len(leaves_a) == len(leaves_b)
        for (pa, a), (pb, b) in zip(leaves_a, leaves_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_int8_heads_env_applies_at_load(self, monkeypatch):
        """GENCONVIT_INT8_HEADS=1 must quantize the (hwc-folded) VAE latent
        heads at Predictor construction and still score videos."""
        monkeypatch.setenv("GENCONVIT_INT8_HEADS", "1")
        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        p = Predictor(cfg, net="genconvit", face_backend="fullframe", seed=0)
        enc = p.params["vae"]["encoder"]
        assert "mu_hwc_q" in enc and enc["mu_hwc_q"]["wq"].dtype == jnp.int8
        faces = np.zeros((1, 2, 64, 64, 3), np.uint8)
        y, v = p.predict_videos_batched(faces, np.ones((1, 2), np.float32))
        assert np.isfinite(np.asarray(v)).all()

    def test_video_decode(self, synth_video):
        from genconvit_tpu.data.video import extract_frames

        frames = extract_frames(synth_video, 10, prefer_native=False)
        assert frames.shape == (10, 64, 64, 3)
        assert frames.dtype == np.uint8

    def test_predict_video_end_to_end(self, small_predictor, synth_video):
        y, y_val = small_predictor.predict_video(synth_video, num_frames=5)
        assert y in (0, 1)
        assert 0.0 <= y_val <= 1.0

    def test_mask_invariance_across_pad_garbage(self, small_predictor, rng):
        """The pad-slot contents must not affect the masked aggregation: the
        same 3 real faces with zero pads vs saturated-garbage pads, under the
        SAME rng key, must give identical (y, y_val)."""
        import jax

        faces = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
        batch_a = np.zeros((5, 64, 64, 3), np.uint8)
        batch_b = np.full((5, 64, 64, 3), 255, np.uint8)
        batch_a[:3] = batch_b[:3] = faces
        mask = np.array([1, 1, 1, 0, 0], np.float32)
        fn = small_predictor._forward_fn(5, batched=False)
        key = jax.random.PRNGKey(7)
        y_a, v_a = fn(small_predictor.params, jnp.asarray(batch_a),
                      jnp.asarray(mask), key)
        y_b, v_b = fn(small_predictor.params, jnp.asarray(batch_b),
                      jnp.asarray(mask), key)
        assert int(y_a) == int(y_b)
        np.testing.assert_allclose(float(v_a), float(v_b), rtol=1e-6, atol=1e-7)

    def test_zero_faces_default_verdict(self, small_predictor):
        y, y_val = small_predictor.predict_faces(
            np.zeros((0, 64, 64, 3), np.uint8), 5)
        assert (y, y_val) == (0, 0.5)  # ref prediction.py:250-253

    def test_batched_matches_single(self, rng):
        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        p = Predictor(cfg, net="ed", face_backend="fullframe")  # ed: deterministic
        faces = (rng.random((2, 4, 64, 64, 3)) * 255).astype(np.uint8)
        masks = np.ones((2, 4), np.float32)
        ys, vals = p.predict_videos_batched(faces, masks)
        for v in range(2):
            y1, val1 = p.predict_faces(faces[v], 4)
            assert int(ys[v]) == y1
            np.testing.assert_allclose(vals[v], val1, rtol=1e-4, atol=1e-5)


class TestResultSchema:
    def test_v1_schema_matches_reference(self):
        r = set_result()
        store_result(r, "a.mp4", 1, 0.91, "dfdc", "FAKE")
        store_result(r, "b.mp4", 0, 0.12, "dfdc", "REAL")
        assert set(r["video"].keys()) == {
            "name", "pred", "klass", "pred_label", "correct_label"}
        # y=1 -> REAL, y=0 -> FAKE (quirk B2 mapping)
        assert r["video"]["pred_label"] == ["REAL", "FAKE"]
        assert json.dumps(r)  # JSON-serializable


class TestFaceBackendLadder:
    """Engine fallback: detector-family backends degrade hybrid -> jax ->
    haar -> fullframe; explicit non-detector backends drop straight to
    fullframe (substituting a different detector would silently change the
    crop geometry the caller asked for)."""

    def _predictor_with_failing(self, monkeypatch, backend, failing):
        import genconvit_tpu.infer.engine as engine_mod
        from genconvit_tpu.data.faces import make_detector as real_make

        made = []

        def fake_make(b, **kw):
            if b in failing:
                raise FileNotFoundError(f"{b} unavailable (test)")
            made.append(b)
            return real_make("fullframe")

        monkeypatch.setattr(engine_mod, "make_detector", fake_make)
        cfg = Config()
        cfg.model_size = "_test_small"
        Predictor(cfg, net="ed", face_backend=backend)
        return made

    def test_hybrid_falls_to_jax(self, monkeypatch):
        made = self._predictor_with_failing(
            monkeypatch, "hybrid", failing={"hybrid"})
        assert made == ["jax"]

    def test_jax_tries_haar_before_fullframe(self, monkeypatch):
        made = self._predictor_with_failing(
            monkeypatch, "jax", failing={"jax"})
        assert made == ["haar"]

    def test_recorded_drops_straight_to_fullframe(self, monkeypatch):
        made = self._predictor_with_failing(
            monkeypatch, "recorded", failing={"recorded"})
        assert made == ["fullframe"]


class TestGroupDetect:
    def test_predict_files_group_detect_matches_per_video(self, tmp_path):
        """The grouped-detect driver (default for non-fullframe backends)
        must agree with the serial per-video path: same crops, same
        verdicts (ED branch: no VAE sampling, so parity is exact)."""
        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        p = Predictor(cfg, net="ed", face_backend="center", seed=0)
        paths = []
        for i in range(5):  # 5 pads to video_batch=4's second group
            path = str(tmp_path / f"v{i}.mp4")
            _write_synth_video(path, n_frames=10 + i)
            paths.append(path)
        grouped = dict(p.predict_files(paths, num_frames=4, video_batch=4))
        solo = {q: p.predict_video(q, 4) for q in paths}
        for q in paths:
            assert grouped[q][0] == solo[q][0]
            assert abs(grouped[q][1] - solo[q][1]) < 1e-5
        # and the driver actually took the grouped path
        assert p.timers.summary().get("detect", {}).get("count", 0) > 0

    def test_group_detect_fault_tolerance(self, tmp_path, monkeypatch):
        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        p = Predictor(cfg, net="ed", face_backend="center", seed=0)
        paths = []
        for i in range(3):
            path = str(tmp_path / f"v{i}.mp4")
            _write_synth_video(path)
            paths.append(path)
        monkeypatch.setenv("GENCONVIT_FAULT_INJECT", "1.0")
        out = dict(p.predict_files(paths, num_frames=4, video_batch=4))
        assert all(out[q] is None for q in paths)  # walker maps None -> (0,0.5)
