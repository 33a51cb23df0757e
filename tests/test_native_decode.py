"""Native C++ FFmpeg decoder vs the cv2 fallback (skipped if not built)."""

import os

import numpy as np
import pytest

from genconvit_tpu.data.frames import sample_frame_indices

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(os.path.dirname(__file__), "..",
                                    "native", "libgcvdecode.so")),
    reason="native decoder not built (make -C native)")


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("nv") / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (128, 96))
    rng = np.random.default_rng(0)
    for i in range(48):
        frame = np.full((96, 128, 3), i * 5 % 255, np.uint8)
        frame[20:60, 30:90] = rng.integers(0, 255, (40, 60, 3), np.uint8)
        vw.write(frame)
    vw.release()
    return path


def test_native_matches_cv2(video_path):
    from genconvit_tpu.data.native import NativeVideoReader
    from genconvit_tpu.data.video import CV2VideoReader

    nr = NativeVideoReader(video_path)
    cr = CV2VideoReader(video_path)
    assert len(nr) == len(cr)
    idx = sample_frame_indices(len(nr), 10)
    fa = nr.read_frames(idx)
    fb = cr.read_frames(idx)
    nr.close()
    cr.close()
    assert fa.shape == fb.shape
    # colorspace coefficient choices differ slightly (BT.601/709 defaults);
    # decord-equivalence is the goal, cv2 is the available cross-check
    diff = np.abs(fa.astype(int) - fb.astype(int))
    assert diff.mean() < 4.0


def test_native_backward_seek(video_path):
    from genconvit_tpu.data.native import NativeVideoReader

    nr = NativeVideoReader(video_path)
    a = nr.read_frames([30])
    b = nr.read_frames([5])  # requires backward seek
    c = nr.read_frames([30])
    nr.close()
    np.testing.assert_array_equal(a, c)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 0.1


def test_extract_frames_prefers_native(video_path):
    from genconvit_tpu.data.video import extract_frames

    frames = extract_frames(video_path, 10, prefer_native=True)
    assert frames.shape[0] == 10


def test_batched_decode_matches_per_video(video_path, tmp_path):
    """gcv_decode_videos (one C++ thread-pool call for the whole [V,F,...]
    block) must equal per-video scaled reads, and mark unreadable videos
    with count 0."""
    from genconvit_tpu.data.native import NativeVideoReader, decode_videos_batch

    bad = str(tmp_path / "broken.mp4")
    with open(bad, "wb") as f:
        f.write(b"not a video")
    paths = [video_path, bad, video_path]
    frames, counts = decode_videos_batch(paths, 5, 64, 64)
    assert frames.shape == (3, 5, 64, 64, 3)
    assert counts.tolist() == [5, 0, 5]
    r = NativeVideoReader(video_path, out_size=(64, 64))
    try:
        ref = r.read_frames(sample_frame_indices(len(r), 5))
    finally:
        r.close()
    np.testing.assert_array_equal(frames[0], ref)
    np.testing.assert_array_equal(frames[2], ref)
    assert (frames[1] == 0).all()


def test_predict_files_native_rgb_path(video_path, tmp_path):
    """predict_files with fullframe+native+rgb routes through the batched
    C++ decoder and agrees with the per-video engine path; unreadable
    videos get the (0, 0.5) default."""
    import jax.numpy as jnp

    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor

    bad = str(tmp_path / "broken.mp4")
    with open(bad, "wb") as f:
        f.write(b"junk")
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    p = Predictor(cfg, net="ed", face_backend="fullframe")
    paths = [video_path, bad, video_path]
    res = dict(p.predict_files(paths, 4, video_batch=2))
    assert res[bad] == (0, 0.5)
    y_ref, v_ref = p.predict_video(video_path, 4)
    assert res[video_path][0] == y_ref
    np.testing.assert_allclose(res[video_path][1], v_ref, rtol=1e-4, atol=1e-5)
