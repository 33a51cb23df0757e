"""YUV420 transfer path: conversion parity vs cv2, engine yuv pipeline vs rgb."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from genconvit_tpu.config import Config
from genconvit_tpu.data.preprocess import (normalize_batch, normalize_yuv420,
                                           yuv420_to_rgb, yuv_affine,
                                           yuv_matrix)


def test_affine_matches_matrix_plus_flag(rng):
    """yuv_affine folds the range offsets into the [3,4] offset column: the
    affine path must match the [3,3]+full_range path bit-for-bit for every
    (space, range) combination."""
    y = (rng.random((2, 8, 8)) * 255).astype(np.uint8)
    u = (rng.random((2, 4, 4)) * 255).astype(np.uint8)
    v = (rng.random((2, 4, 4)) * 255).astype(np.uint8)
    for space in ("bt601", "bt709"):
        for full in (False, True):
            ref = np.asarray(yuv420_to_rgb(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(yuv_matrix(space, full)), full_range=full))
            out = np.asarray(yuv420_to_rgb(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(yuv_affine(space, full))))
            np.testing.assert_allclose(out, ref, atol=1e-3)


def test_mixed_range_batch_per_video_affine(rng):
    """A [N,3,4] batch mixing full- and limited-range videos must equal each
    video converted with its own range flag — the case a [N,3,3] coefficient
    batch cannot represent (the Y offset differs per video)."""
    y = (rng.random((2, 8, 8)) * 255).astype(np.uint8)
    u = (rng.random((2, 4, 4)) * 255).astype(np.uint8)
    v = (rng.random((2, 4, 4)) * 255).astype(np.uint8)
    affines = np.stack([yuv_affine("bt601", False), yuv_affine("bt709", True)])
    out = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v), jnp.asarray(affines)))
    for i, (space, full) in enumerate((("bt601", False), ("bt709", True))):
        ref = np.asarray(yuv420_to_rgb(
            jnp.asarray(y[i:i + 1]), jnp.asarray(u[i:i + 1]),
            jnp.asarray(v[i:i + 1]), jnp.asarray(yuv_matrix(space, full)),
            full_range=full))
        np.testing.assert_allclose(out[i], ref[0], atol=1e-3)


def test_yuv_to_rgb_matches_cv2_bt601_full(rng):
    """cv2.COLOR_YUV2RGB uses full-range BT.601 — exact reference for the
    (bt601, full) coefficient set."""
    import cv2

    rgb = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    yuv = cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV)
    y = yuv[..., 0][None]
    # full-res chroma (as if 444): feed 2x2-subsampled means
    u = yuv[..., 1].reshape(16, 2, 16, 2).mean((1, 3))[None]
    v = yuv[..., 2].reshape(16, 2, 16, 2).mean((1, 3))[None]
    out = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u.astype(np.uint8)),
                                   jnp.asarray(v.astype(np.uint8)),
                                   jnp.asarray(yuv_matrix("bt601", True)),
                                   full_range=True))
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB).astype(np.float32)
    # chroma was subsampled, so compare loosely on smooth content stats
    assert np.abs(out.mean() - ref.mean()) < 3.0


def test_gray_yuv_roundtrip_exact():
    """Constant gray: chroma neutral, limited-range Y scaling must be exact."""
    y = np.full((1, 8, 8), 126, np.uint8)  # (126-16)*1.164 = 128.04
    u = np.full((1, 4, 4), 128, np.uint8)
    v = np.full((1, 4, 4), 128, np.uint8)
    for space in ("bt601", "bt709"):
        rgb = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v),
                                       jnp.asarray(yuv_matrix(space, False))))
        np.testing.assert_allclose(rgb, 128.04, atol=0.1)


def test_normalize_yuv_equals_normalize_rgb():
    y = np.full((2, 8, 8), 126, np.uint8)
    u = np.full((2, 4, 4), 128, np.uint8)
    v = np.full((2, 4, 4), 128, np.uint8)
    out = np.asarray(normalize_yuv420(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v),
                                      jnp.asarray(yuv_matrix("bt601", False))))
    ref = np.asarray(normalize_batch(jnp.full((2, 8, 8, 3), 128, jnp.uint8)))
    np.testing.assert_allclose(out, ref, atol=5e-3)


NATIVE = os.path.isfile(os.path.join(os.path.dirname(__file__), "..",
                                     "native", "libgcvdecode.so"))


@pytest.mark.skipif(not NATIVE, reason="native decoder not built")
def test_yuv_pipeline_matches_rgb_pipeline(tmp_path, rng):
    """predict_files with transfer_format yuv420 must agree with the rgb
    path on verdicts (scores may differ at the ~1/255 conversion level)."""
    import cv2

    from genconvit_tpu.infer.engine import Predictor

    paths = []
    for k in range(3):
        p = str(tmp_path / f"v{k}.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 64))
        for i in range(24):
            vw.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
        vw.release()
        paths.append(p)

    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    rgb = Predictor(cfg, net="ed", face_backend="fullframe")
    yuv = Predictor(cfg, net="ed", face_backend="fullframe",
                    transfer_format="yuv420", params=rgb.params)
    r_rgb = dict(rgb.predict_files(paths, 4, workers=2))
    r_yuv = dict(yuv.predict_files(paths, 4, workers=2))
    for p in paths:
        assert r_yuv[p] is not None
        np.testing.assert_allclose(r_yuv[p][1], r_rgb[p][1], atol=0.05)
