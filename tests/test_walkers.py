"""Dataset walker tests over synthetic directory trees (tiny 64px videos)."""

import json
import os

import numpy as np
import pytest

from genconvit_tpu.config import Config
from genconvit_tpu.infer.engine import Predictor
from genconvit_tpu.infer import walkers


def _write_video(path, n_frames=12, size=64):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*("mp4v" if path.endswith(".mp4") else "MJPG"))
    vw = cv2.VideoWriter(path, fourcc, 12, (size, size))
    rng = np.random.default_rng(abs(hash(path)) % 2**32)
    for _ in range(n_frames):
        vw.write(rng.integers(0, 255, (size, size, 3), np.uint8))
    vw.release()


@pytest.fixture(scope="module")
def predictor():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    return Predictor(cfg, net="ed", face_backend="fullframe")


def test_dfdc_walker(tmp_path, predictor):
    root = tmp_path / "dfdc"
    names = ["aaa.mp4", "bbb.mp4"]
    for n in names:
        _write_video(str(root / n))
    meta = {"aaa.mp4": {"label": "FAKE"}, "bbb.mp4": {"label": "REAL"}}
    (root / "metadata.json").write_text(json.dumps(meta))
    jdir = tmp_path / "json"
    jdir.mkdir()
    (jdir / "dfdc_files.json").write_text(json.dumps(names))
    state = walkers.dfdc(predictor, str(root), 4, json_dir=str(jdir), workers=2)
    assert state.count == 2
    assert state.result["video"]["correct_label"] == ["FAKE", "REAL"]
    assert len(state.y_true) == 2


def test_celeb_walker(tmp_path, predictor):
    root = tmp_path / "celeb"
    entries = ["Celeb-real/r1.mp4", "Celeb-synthesis/f1.mp4"]
    for e in entries:
        _write_video(str(root / e))
    jdir = tmp_path / "json"
    jdir.mkdir()
    (jdir / "celeb_test.json").write_text(json.dumps(entries))
    state = walkers.celeb(predictor, str(root), 4, json_dir=str(jdir), workers=2)
    assert state.result["video"]["correct_label"] == ["REAL", "FAKE"]
    assert state.result["video"]["klass"] == ["celeb-real", "celeb-synthesis"]


def test_faceforensics_walker(tmp_path, predictor):
    root = tmp_path / "ff"
    vids = {
        "original_sequences/youtube/c23/videos/001.mp4": ("original", "REAL"),
        "manipulated_sequences/Deepfakes/c40/videos/001_002.mp4": ("Deepfakes", "FAKE"),
    }
    for rel in vids:
        _write_video(str(root / rel))
    jdir = tmp_path / "json"
    jdir.mkdir()
    (jdir / "ff_file_list.json").write_text(json.dumps(["001.mp4", "001_002.mp4"]))
    state = walkers.faceforensics(predictor, str(root), 4, json_dir=str(jdir),
                                  workers=2)
    assert state.count == 2
    assert set(state.result["video"]["klass"]) == {"original", "deepfakes"}
    assert set(state.result["video"]["compression"]) == {"c23", "c40"}


def test_timit_walker_labels_everything_fake(tmp_path, predictor):
    root = tmp_path / "timit"
    _write_video(str(root / "higher_quality" / "spk1" / "a.avi"))
    _write_video(str(root / "lower_quality" / "spk1" / "b.avi"))
    state = walkers.timit(predictor, str(root), 4, workers=2)
    assert state.count == 2
    # quirk B8: the walker labels everything FAKE
    assert state.result["video"]["correct_label"] == ["FAKE", "FAKE"]


def test_process_shard_env(tmp_path, predictor, monkeypatch):
    root = tmp_path / "shard"
    names = [f"v{i}.mp4" for i in range(4)]
    for n in names:
        _write_video(str(root / n))
    monkeypatch.setenv("GENCONVIT_PROCESS_SHARD", "0/2")
    s0 = walkers.vids(predictor, str(root), 3, workers=2)
    monkeypatch.setenv("GENCONVIT_PROCESS_SHARD", "1/2")
    s1 = walkers.vids(predictor, str(root), 3, workers=2)
    assert s0.count == 2 and s1.count == 2
    assert sorted(s0.result["video"]["name"] + s1.result["video"]["name"]) == names


def test_fault_injection_resilience(tmp_path, predictor, monkeypatch):
    """With decode faults injected, the walk completes and faulted videos get
    the reference's (0, 0.5) default verdict."""
    root = tmp_path / "faulty"
    names = [f"v{i}.mp4" for i in range(4)]
    for n in names:
        _write_video(str(root / n))
    monkeypatch.setenv("GENCONVIT_FAULT_INJECT", "1.0")  # every decode fails
    state = walkers.vids(predictor, str(root), 3, workers=2)
    assert state.count == 4
    assert state.result["video"]["pred"] == [0.5] * 4


class TestV2Labels:
    """The v2 CLI's OWN ground-truth heuristics (prediction_v2.py passes
    v2_labels=True) vs the v1 rules — ref prediction_v2.py:68,185,217-264."""

    def test_vids_v2_filename_fake_heuristic(self, tmp_path, predictor):
        root = tmp_path / "flat"
        for n in ["0017_fake.mp4", "sample_2.mp4", "MyFAKE_clip.mp4"]:
            _write_video(str(root / n))
        # v1: no labels -> empty metric vectors
        s1 = walkers.vids(predictor, str(root), 3, workers=2)
        assert s1.y_true == [] and not s1.has_labels
        assert set(s1.result["video"]["correct_label"]) == {"unknown"}
        # v2: filename-contains-'fake' (case-insensitive) labels populate
        s2 = walkers.vids(predictor, str(root), 3, workers=2, v2_labels=True)
        assert s2.has_labels and len(s2.y_true) == 3
        by_name = dict(zip(s2.result["video"]["name"],
                           s2.result["video"]["correct_label"]))
        assert by_name["0017_fake.mp4"] == "FAKE"
        assert by_name["MyFAKE_clip.mp4"] == "FAKE"
        assert by_name["sample_2.mp4"] == "REAL"

    def test_dfdc_v2_suffix_heuristic(self, tmp_path, predictor):
        root = tmp_path / "dfdc"
        names = ["abc_0.mp4", "abc_1.mp4"]
        for n in names:
            _write_video(str(root / n))
        jdir = tmp_path / "json"
        jdir.mkdir()
        (jdir / "dfdc_files.json").write_text(json.dumps(names))
        # v1 without metadata.json: unlabeled
        s1 = walkers.dfdc(predictor, str(root), 3, json_dir=str(jdir), workers=2)
        assert set(s1.result["video"]["correct_label"]) == {"unknown"}
        # v2: '_0.mp4' suffix is REAL, everything else FAKE — no metadata read
        s2 = walkers.dfdc(predictor, str(root), 3, json_dir=str(jdir),
                          workers=2, v2_labels=True)
        by_name = dict(zip(s2.result["video"]["name"],
                           s2.result["video"]["correct_label"]))
        assert by_name == {"abc_0.mp4": "REAL", "abc_1.mp4": "FAKE"}
        assert len(s2.y_true) == 2

    def test_dfdc_v2_ignores_contradicting_metadata(self, tmp_path, predictor):
        """v2 labels from the suffix even when metadata.json disagrees —
        the reference v2 never opens metadata.json."""
        root = tmp_path / "dfdc"
        _write_video(str(root / "xyz_0.mp4"))
        (root / "metadata.json").write_text(
            json.dumps({"xyz_0.mp4": {"label": "FAKE"}}))
        jdir = tmp_path / "json"
        jdir.mkdir()
        (jdir / "dfdc_files.json").write_text(json.dumps(["xyz_0.mp4"]))
        s2 = walkers.dfdc(predictor, str(root), 3, json_dir=str(jdir),
                          workers=2, v2_labels=True)
        assert s2.result["video"]["correct_label"] == ["REAL"]

    def test_timit_v2_walks_real_dirs(self, tmp_path, predictor):
        root = tmp_path / "timit"
        _write_video(str(root / "higher_quality" / "spk1" / "a.mp4"))
        _write_video(str(root / "lower_quality" / "spk1" / "b.mp4"))
        _write_video(str(root / "vidtimit" / "spk1" / "c.mp4"))
        # v1: only hq/lq, .avi only -> these .mp4 trees produce nothing
        s1 = walkers.timit(predictor, str(root), 3, workers=2)
        assert s1.count == 0
        # v2: walks everything, .mp4, labels real dirs REAL
        s2 = walkers.timit(predictor, str(root), 3, workers=2, v2_labels=True)
        assert s2.count == 3
        by_name = dict(zip(s2.result["video"]["name"],
                           s2.result["video"]["correct_label"]))
        assert by_name == {"a.mp4": "FAKE", "b.mp4": "FAKE", "c.mp4": "REAL"}
        by_klass = dict(zip(s2.result["video"]["name"],
                            s2.result["video"]["klass"]))
        assert by_klass == {"a.mp4": "high_quality", "b.mp4": "low_quality",
                            "c.mp4": "real"}
