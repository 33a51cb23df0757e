"""Training loop tests on synthetic ImageFolder data (64x64 for speed)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genconvit_tpu.config import Config
from genconvit_tpu.data.folder import load_data, scan_image_folder
from genconvit_tpu.train.loop import make_train_step, make_eval_step, train_model
from genconvit_tpu.train.optim import make_optimizer, set_lr, step_lr
from genconvit_tpu.models.genconvit import init_genconvit


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("imgfolder")
    rng = np.random.default_rng(0)
    for split, n in [("train", 8), ("valid", 4), ("test", 4)]:
        for cls in ["fake", "real"]:
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                img = rng.integers(0, 255, (64, 64, 3), np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return str(root)


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.batch_size = 4
    return cfg


def test_alphabetical_labels_fake_is_zero(data_dir):
    _, labels, classes = scan_image_folder(os.path.join(data_dir, "train"))
    assert classes == ["fake", "real"]  # load-bearing order (quirk B2)


def test_folder_batches(data_dir):
    datasets, sizes = load_data(data_dir, batch_size=4, img_size=64)
    assert sizes == {"train": 16, "valid": 8, "test": 8}
    imgs, labels = next(datasets["train"].batches(4, shuffle=True, epoch=0))
    assert imgs.shape == (4, 64, 64, 3) and imgs.dtype == np.uint8
    assert labels.shape == (4,)


def test_step_lr_matches_torch_schedule():
    lr = step_lr(1e-4, 15, 0.1)
    assert lr(0) == pytest.approx(1e-4)
    assert lr(14) == pytest.approx(1e-4)
    assert lr(15) == pytest.approx(1e-5)
    assert lr(30) == pytest.approx(1e-6)


@pytest.mark.parametrize("net", ["ed", "vae"])
def test_train_step_reduces_loss(small_cfg, net, rng):
    params = init_genconvit(jax.random.PRNGKey(0), small_cfg, net)
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(params)
    step = make_train_step(net, tx, donate=False)
    imgs = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    labels = np.array([0, 1, 0, 1], np.int32)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(5):
        key, k = jax.random.split(key)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels), k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_vae_bn_stats_update(small_cfg, rng):
    params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
    tx = make_optimizer(1e-4, 0.0)
    opt_state = tx.init(params)
    step = make_train_step("vae", tx, donate=False)
    before = np.asarray(params["vae"]["encoder"]["bns"][0]["mean"]).copy()
    imgs = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    labels = np.array([0, 1, 0, 1], np.int32)
    params, *_ = step(params, opt_state, jnp.asarray(imgs), jnp.asarray(labels),
                      jax.random.PRNGKey(1))
    after = np.asarray(params["vae"]["encoder"]["bns"][0]["mean"])
    assert np.abs(after - before).max() > 0  # running stats moved


def test_mixed_precision_step_keeps_f32_masters(small_cfg, rng):
    """dtype=bf16 trains with an in-graph bf16 cast (true mixed precision:
    without it the f32 masters promote the whole graph back to f32) while
    the master tree — weights, Adam state, BN running stats — stays f32."""
    params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(params)
    step = make_train_step("vae", tx, dtype=jnp.bfloat16, donate=False)
    imgs = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    labels = np.array([0, 1, 0, 1], np.int32)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    kernels = [params["vae"]["encoder"]["mu"]["kernel"],
               params["vae"]["encoder"]["convs"][0]["kernel"],
               params["vae"]["encoder"]["bns"][0]["mean"]]
    assert all(k.dtype == jnp.float32 for k in kernels)
    # eval step under the same contract stays finite
    ev = make_eval_step("vae", dtype=jnp.bfloat16)
    l2, a2, _ = ev(params, jnp.asarray(imgs), jnp.asarray(labels),
                   jax.random.PRNGKey(2))
    assert np.isfinite(float(l2))


def test_decay_mask_excludes_bn_stats(small_cfg):
    from genconvit_tpu.train.optim import _decay_mask

    params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
    mask = _decay_mask(params)
    assert mask["vae"]["encoder"]["bns"][0]["mean"] is False
    assert mask["vae"]["encoder"]["bns"][0]["var"] is False
    assert mask["vae"]["encoder"]["bns"][0]["scale"] is True
    assert mask["vae"]["encoder"]["convs"][0]["kernel"] is True


def test_train_model_end_to_end_with_resume(data_dir, small_cfg, tmp_path):
    wdir = str(tmp_path / "weights")
    summary = train_model(data_dir, "ed", 1, batch_size=4, config=small_cfg,
                          weight_dir=wdir, test_model=True)
    assert os.path.isfile(summary["checkpoint"])
    assert "test_accuracy" in summary
    # resume
    summary2 = train_model(data_dir, "ed", 1, batch_size=4, config=small_cfg,
                           weight_dir=wdir, pretrained=summary["checkpoint"])
    assert os.path.isfile(summary2["checkpoint"])


def test_train_model_data_parallel_8dev(data_dir, small_cfg, tmp_path):
    """Data-parallel training over the virtual 8-CPU mesh."""
    summary = train_model(data_dir, "ed", 1, batch_size=8, config=small_cfg,
                          weight_dir=str(tmp_path / "w"), data_parallel=True)
    assert os.path.isfile(summary["checkpoint"])
    assert np.isfinite(summary["history"]["train_loss"][-1])
