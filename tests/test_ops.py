"""Numerical parity of core NHWC ops against torch (CPU) layer semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from genconvit_tpu import ops


def _nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    return np.transpose(w_oihw, (2, 3, 1, 0))


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 0), (4, 0)])
def test_conv2d_matches_torch(rng, stride, padding):
    x = rng.standard_normal((2, 5, 16, 16), dtype=np.float32)
    w = rng.standard_normal((7, 5, 3, 3), dtype=np.float32) * 0.1
    b = rng.standard_normal(7, dtype=np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=padding).numpy()
    out = ops.conv2d(jnp.asarray(_nhwc(x)), jnp.asarray(_to_hwio(w)), jnp.asarray(b),
                     stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_depthwise_conv_matches_torch(rng):
    c = 8
    x = rng.standard_normal((2, c, 14, 14), dtype=np.float32)
    w = rng.standard_normal((c, 1, 7, 7), dtype=np.float32) * 0.1
    b = rng.standard_normal(c, dtype=np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   padding=3, groups=c).numpy()
    # HWIO with groups=C: kernel [kh,kw,1,C]
    w_j = np.transpose(w, (2, 3, 1, 0))
    out = ops.conv2d(jnp.asarray(_nhwc(x)), jnp.asarray(w_j), jnp.asarray(b),
                     padding=3, groups=c)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s", [(2, 2), (4, 2)])
def test_conv_transpose2d_matches_torch(rng, k, s):
    x = rng.standard_normal((2, 6, 7, 7), dtype=np.float32)
    w = rng.standard_normal((6, 4, k, k), dtype=np.float32) * 0.1  # (Cin,Cout,kh,kw)
    b = rng.standard_normal(4, dtype=np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=s).numpy()
    # our storage: HWIO of the forward view = permute(2,3,0,1)
    w_j = np.transpose(w, (2, 3, 0, 1))
    out = ops.conv_transpose2d(jnp.asarray(_nhwc(x)), jnp.asarray(w_j), jnp.asarray(b),
                               stride=s)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    out = ops.max_pool2d(jnp.asarray(_nhwc(x)), 2, 2)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-6, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 7, 32), dtype=np.float32)
    g = rng.standard_normal(32, dtype=np.float32)
    b = rng.standard_normal(32, dtype=np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(g),
                       torch.from_numpy(b), eps=1e-6).numpy()
    out = ops.layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_batch_norm_eval_matches_torch(rng):
    c = 16
    x = rng.standard_normal((4, c, 8, 8), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(c)
    bn.weight.data = torch.from_numpy(rng.standard_normal(c, dtype=np.float32))
    bn.bias.data = torch.from_numpy(rng.standard_normal(c, dtype=np.float32))
    bn.running_mean.data = torch.from_numpy(rng.standard_normal(c, dtype=np.float32))
    bn.running_var.data = torch.from_numpy(np.abs(rng.standard_normal(c, dtype=np.float32)) + 0.5)
    bn.eval()
    with torch.no_grad():
        ref = bn(torch.from_numpy(x)).numpy()
    params = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }
    out, _ = ops.batch_norm(jnp.asarray(_nhwc(x)), params, train=False)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-4, atol=1e-5)


def test_batch_norm_train_matches_torch(rng):
    c = 8
    x = rng.standard_normal((4, c, 6, 6), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(c)
    bn.train()
    ref = bn(torch.from_numpy(x)).detach().numpy()
    params = {
        "scale": jnp.ones(c), "bias": jnp.zeros(c),
        "mean": jnp.zeros(c), "var": jnp.ones(c),
    }
    out, new_stats = ops.batch_norm(jnp.asarray(_nhwc(x)), params, train=True)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]), bn.running_mean.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_stats["var"]), bn.running_var.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_gelu_is_exact_erf():
    x = jnp.linspace(-3, 3, 101)
    ref = torch.nn.GELU()(torch.from_numpy(np.asarray(x))).numpy()
    np.testing.assert_allclose(np.asarray(ops.gelu(x)), ref, rtol=1e-6, atol=1e-6)


def test_leaky_relu_matches_torch():
    x = jnp.linspace(-3, 3, 101)
    ref = F.leaky_relu(torch.from_numpy(np.asarray(x))).numpy()
    np.testing.assert_allclose(np.asarray(ops.leaky_relu(x)), ref, rtol=1e-6, atol=1e-6)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((4, 10), dtype=np.float32)
    w = rng.standard_normal((5, 10), dtype=np.float32)  # torch (out,in)
    b = rng.standard_normal(5, dtype=np.float32)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    out = ops.linear(jnp.asarray(x), jnp.asarray(w.T), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


class TestFastGelu:
    def test_bf16_exhaustive_vs_exact(self):
        """Both rational-erf GELU tiers over EVERY finite bf16 input in
        [-300, 300], vs the exactly rounded erf GELU:
          * hp tier — within 1 bf16 ulp (2^-7 relative) or 2e-5 absolute in
            the deep negative tail; 98%+ of inputs are bit-equal.
          * default tier — within 1 ulp or 3e-4 absolute (the documented
            deg-3/2 fit error, ~15x below bf16 rounding of O(1) values)."""
        import os

        from scipy.special import erf

        from genconvit_tpu.ops.act import gelu_fast

        xb = jnp.asarray(np.arange(65536, dtype=np.uint16)).view(jnp.bfloat16)
        x = np.asarray(xb.astype(jnp.float32))
        m = np.isfinite(x) & (np.abs(x) < 300)
        x = x[m]
        exact = 0.5 * x.astype(np.float64) * (1 + erf(x / np.sqrt(2)))
        exact_b = np.asarray(jnp.asarray(exact.astype(np.float32))
                             .astype(jnp.bfloat16).astype(jnp.float32))
        for tier, abs_floor, min_biteq in (("hp", 2e-5, 0.98), ("", 3e-4, 0.90)):
            os.environ["GENCONVIT_GELU"] = tier
            try:
                got_b = np.asarray(
                    gelu_fast(jnp.asarray(x).astype(jnp.bfloat16))
                    .astype(jnp.float32))
            finally:
                os.environ.pop("GENCONVIT_GELU", None)
            diff = np.abs(exact_b - got_b)
            bound = np.maximum(np.abs(exact_b) * 2.0 ** -7, abs_floor)
            assert (diff <= bound).all(), f"tier={tier or 'default'}"
            assert (diff == 0).mean() > min_biteq, f"tier={tier or 'default'}"

    def test_f32_keeps_exact_erf(self):
        """f32 gelu must stay the exact erf form (torch-oracle comparisons)."""
        from genconvit_tpu.ops.act import gelu

        x = jnp.linspace(-6, 6, 1001, dtype=jnp.float32)
        ref = jax.nn.gelu(x, approximate=False)
        np.testing.assert_array_equal(np.asarray(gelu(x)), np.asarray(ref))

    def test_folded_block_matches_standard(self, rng):
        """LN-folded inference block vs the standard graph: tight in f32,
        within one bf16 ulp in bf16."""
        from genconvit_tpu.models.convnext import (_block_xla,
                                                   _block_xla_folded,
                                                   init_convnext)

        p = dict(init_convnext(jax.random.PRNGKey(0))["stages"][0]["blocks"][0])
        p["gamma"] = jnp.full((96,), 0.3, jnp.float32)  # realistic magnitude
        for dt, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 4e-2)):
            x = jnp.asarray(rng.standard_normal((2, 28, 28, 96)), dt)
            pc = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, p)
            a = np.asarray(_block_xla(pc, x), np.float32)
            b = np.asarray(_block_xla_folded(pc, x), np.float32)
            assert np.abs(a - b).max() <= tol


class TestResize:
    def test_area_matches_cv2_downscale_float(self, rng):
        import cv2
        img = rng.random((57, 91, 3), dtype=np.float32)
        ref = cv2.resize(img, (24, 16), interpolation=cv2.INTER_AREA)
        out = ops.resize_area(jnp.asarray(img[None]), (16, 24))[0]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_area_matches_cv2_downscale_uint8(self, rng):
        import cv2
        img = (rng.random((300, 260, 3)) * 255).astype(np.uint8)
        ref = cv2.resize(img, (224, 224), interpolation=cv2.INTER_AREA).astype(np.float32)
        out = np.asarray(ops.resize_area(jnp.asarray(img[None]), (224, 224))[0])
        # cv2 uses fixed-point accumulation on uint8; allow ~1 LSB
        assert np.abs(out - ref).max() <= 1.0

    def test_bilinear_torch_upscale(self, rng):
        # torchvision Resize(antialias=True) on tensors == F.interpolate(
        # mode='bilinear', align_corners=False, antialias=True)
        img = rng.random((1, 3, 112, 112), dtype=np.float32)
        ref = F.interpolate(torch.from_numpy(img), (224, 224), mode="bilinear",
                            align_corners=False, antialias=True).numpy()
        out = ops.resize_bilinear_torch(jnp.asarray(_nhwc(img)), (224, 224))
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-4, atol=1e-4)

    def test_bilinear_torch_downscale_antialias(self, rng):
        img = rng.random((1, 3, 224, 224), dtype=np.float32)
        ref = F.interpolate(torch.from_numpy(img), (96, 96), mode="bilinear",
                            align_corners=False, antialias=True).numpy()
        out = ops.resize_bilinear_torch(jnp.asarray(_nhwc(img)), (96, 96))
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref), rtol=1e-3, atol=1e-4)


class TestCropResize:
    def test_device_crop_resize_matches_cv2(self, rng):
        """Per-face weight-matrix crop+resize on device vs host cv2 crop +
        INTER_AREA (the reference's face-crop op, model/pred_func.py:82-84)."""
        import cv2

        from genconvit_tpu.ops.resize import crop_resize_batch, crop_resize_weights

        frames = (rng.random((2, 120, 160, 3)) * 255).astype(np.uint8)
        boxes = [(10, 150, 110, 30), (0, 160, 120, 0)]  # (t, r, b, l)
        out = 48
        wh = np.stack([crop_resize_weights(120, t, b, out) for (t, r, b, l) in boxes])
        ww = np.stack([crop_resize_weights(160, l, r, out) for (t, r, b, l) in boxes])
        dev = np.asarray(crop_resize_batch(jnp.asarray(frames),
                                           jnp.asarray(wh), jnp.asarray(ww)))
        for i, (t, r, b, l) in enumerate(boxes):
            ref = cv2.resize(frames[i, t:b, l:r], (out, out),
                             interpolation=cv2.INTER_AREA).astype(np.float32)
            assert np.abs(dev[i] - ref).max() <= 1.0  # cv2 fixed-point LSB

    def test_degenerate_box_gives_zeros(self):
        from genconvit_tpu.ops.resize import crop_resize_weights

        w = crop_resize_weights(100, 50, 50, 16)  # empty span
        assert w.sum() == 0.0

    def test_upscale_crop_matches_cv2_bilinear_fallback(self, rng):
        """A face smaller than the model size: cv2.resize INTER_AREA silently
        falls back to bilinear on upscale — the device weights must too."""
        import cv2

        from genconvit_tpu.ops.resize import (crop_resize_batch,
                                              crop_resize_weights_pair)

        frames = (rng.random((3, 120, 160, 3)) * 255).astype(np.uint8)
        out = 64
        boxes = [(10, 60, 58, 12),   # 48x48 crop -> upscale both axes
                 (0, 40, 30, 0),     # 30x40 -> strong upscale
                 (20, 150, 100, 30)]  # 80x120: h upscales, w downscales
        wh = np.stack([crop_resize_weights_pair(120, 160, bx, out)[0]
                       for bx in boxes])
        ww = np.stack([crop_resize_weights_pair(120, 160, bx, out)[1]
                       for bx in boxes])
        dev = np.asarray(crop_resize_batch(jnp.asarray(frames),
                                           jnp.asarray(wh), jnp.asarray(ww)))
        for i, (t, r, b, l) in enumerate(boxes):
            ref = cv2.resize(frames[i, t:b, l:r], (out, out),
                             interpolation=cv2.INTER_AREA).astype(np.float32)
            assert np.abs(dev[i] - ref).max() <= 1.0  # cv2 fixed-point LSB
