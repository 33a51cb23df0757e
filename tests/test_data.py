"""Data-layer tests: augmentation pipeline, config system, preprocessing."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from genconvit_tpu.config import Config, apply_size, load_config
from genconvit_tpu.data.augment import (
    _brightness_contrast, _clahe, _emboss, _gauss_noise,
    _hue_saturation_value, _sharpen, _shift_scale_rotate, strong_aug)
from genconvit_tpu.data.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                           denormalize, normalize_batch,
                                           pad_faces)


class TestAugment:
    def test_all_transforms_preserve_shape_dtype(self, rng):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        for fn in [_gauss_noise, _shift_scale_rotate, _clahe, _sharpen,
                   _emboss, _brightness_contrast, _hue_saturation_value]:
            out = fn(img, rng)
            assert out.shape == img.shape, fn.__name__
            assert out.dtype == np.uint8, fn.__name__

    def test_strong_aug_deterministic_under_seed(self):
        img = (np.random.default_rng(3).random((64, 64, 3)) * 255).astype(np.uint8)
        a = strong_aug(img, np.random.default_rng(7))
        b = strong_aug(img, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_strong_aug_p0_is_identity(self):
        img = (np.random.default_rng(3).random((32, 32, 3)) * 255).astype(np.uint8)
        out = strong_aug(img, np.random.default_rng(0), p=0.0)
        np.testing.assert_array_equal(out, img)

    def test_strong_aug_changes_images(self):
        img = (np.random.default_rng(3).random((64, 64, 3)) * 255).astype(np.uint8)
        rng = np.random.default_rng(1)
        changed = sum(
            not np.array_equal(strong_aug(img, rng), img) for _ in range(20))
        assert changed >= 15  # p=0.9 pipeline with 0.5-flip stages


class TestConfig:
    def test_defaults_match_reference_yaml(self):
        cfg = Config()
        assert cfg.model.backbone == "convnext_tiny"
        assert cfg.model.embedder == "swin_tiny_patch4_window7_224"
        assert cfg.model.latent_dims == 12544
        assert cfg.batch_size == 32
        assert cfg.learning_rate == pytest.approx(1e-4)
        assert cfg.weight_decay == pytest.approx(1e-4)
        assert cfg.num_classes == 2
        assert cfg.img_size == 224

    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text("model:\n  backbone: convnext_large\nbatch_size: 8\n")
        cfg = load_config(str(p))
        assert cfg.model.backbone == "convnext_large"
        assert cfg.batch_size == 8
        assert cfg.img_size == 224  # default preserved

    def test_apply_size_rewrites_pair(self):
        cfg = Config()
        apply_size(cfg, "large")
        assert cfg.model.backbone == "convnext_large"
        assert cfg.model.embedder == "swin_large_patch4_window7_224"
        apply_size(cfg, "bogus")  # ignored, like the reference
        assert cfg.model.backbone == "convnext_large"

    def test_derived_latent(self):
        cfg = Config()
        assert cfg.derived_latent_dims() == 12544
        cfg.img_size = 64
        assert cfg.derived_latent_dims() == 256 * 4


class TestPreprocess:
    def test_normalize_matches_reference_formula(self, rng):
        u8 = (rng.random((2, 8, 8, 3)) * 255).astype(np.uint8)
        out = np.asarray(normalize_batch(jnp.asarray(u8)))
        ref = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_denormalize_roundtrip(self, rng):
        u8 = (rng.random((1, 4, 4, 3)) * 255).astype(np.uint8)
        x = normalize_batch(jnp.asarray(u8))
        back = np.asarray(denormalize(x)) * 255.0
        np.testing.assert_allclose(back, u8.astype(np.float32), atol=1e-3)

    def test_pad_faces_mask(self):
        faces = np.ones((3, 8, 8, 3), np.uint8)
        batch, mask = pad_faces(faces, 5, 8)
        assert batch.shape == (5, 8, 8, 3)
        np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0])
        batch, mask = pad_faces(np.zeros((0, 8, 8, 3), np.uint8), 4, 8)
        assert mask.sum() == 0
