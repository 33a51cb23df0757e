"""Checkpoint I/O: msgpack single-file, orbax directory, torch .pth converter
entry, opt-state round trip."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genconvit_tpu.config import Config
from genconvit_tpu.core.checkpoint import (
    load_checkpoint, load_checkpoint_orbax, load_params, resolve_weight,
    restore_opt_state, save_checkpoint, save_checkpoint_orbax)
from genconvit_tpu.models.genconvit import init_genconvit
from genconvit_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def small_params():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    return init_genconvit(jax.random.PRNGKey(0), cfg, "ed")


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_msgpack_roundtrip_with_opt_state(small_params, tmp_path):
    tx = make_optimizer(1e-4, 1e-4)
    opt = tx.init(small_params)
    path = str(tmp_path / "ck.gcv")
    save_checkpoint(path, small_params, epoch=3, min_loss=0.5, opt_state=opt)
    payload = load_checkpoint(path)
    assert payload["epoch"] == 3
    assert payload["min_loss"] == 0.5
    _trees_equal(payload["params"], small_params)
    restored = restore_opt_state(tx.init(payload["params"]), payload["opt_state"])
    _trees_equal(jax.tree_util.tree_leaves(restored),
                 jax.tree_util.tree_leaves(opt))


def test_orbax_roundtrip(small_params, tmp_path):
    d = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(d, small_params, epoch=2, min_loss=1.25)
    payload = load_checkpoint_orbax(d)
    assert payload["epoch"] == 2
    assert payload["min_loss"] == 1.25
    _trees_equal(payload["params"], small_params)


def test_load_params_native(small_params, tmp_path):
    path = str(tmp_path / "w.gcv")
    save_checkpoint(path, small_params, epoch=1)
    params, meta = load_params(path)
    assert meta["source"] == "native"
    _trees_equal(params, small_params)


def test_load_params_native_unwraps_trained_branch(tmp_path):
    """train_model saves {"ed": tree} / {"vae": tree}; the engine loads one
    branch via load_params(..., which=branch) and must get the INNER tree
    (double-nesting here made trained .gcv checkpoints unloadable by the
    Predictor)."""
    import numpy as np

    ed_tree = {"backbone": {"w": np.ones((2, 2), np.float32)}}
    path = str(tmp_path / "genconvit_ed_best.gcv")
    save_checkpoint(path, {"ed": ed_tree}, epoch=3)
    params, meta = load_params(path, which="ed")
    assert set(params) == {"backbone"}
    # joint checkpoints unwrap per branch too
    path2 = str(tmp_path / "joint.gcv")
    save_checkpoint(path2, {"ed": ed_tree, "vae": {"z": np.zeros(2)}}, epoch=1)
    p_ed, _ = load_params(path2, which="ed")
    p_vae, _ = load_params(path2, which="vae")
    assert set(p_ed) == {"backbone"} and set(p_vae) == {"z"}
    # a tree that is NOT branch-nested passes through unchanged
    path3 = str(tmp_path / "bare.gcv")
    save_checkpoint(path3, ed_tree, epoch=1)
    p_bare, _ = load_params(path3, which="ed")
    assert set(p_bare) == {"backbone"}


def test_resolve_weight_extension_order(tmp_path):
    (tmp_path / "m.gcv").write_bytes(b"x")
    (tmp_path / "m.pth").write_bytes(b"x")
    assert resolve_weight(str(tmp_path), "m").endswith(".gcv")
    os.remove(tmp_path / "m.gcv")
    assert resolve_weight(str(tmp_path), "m").endswith(".pth")
    assert resolve_weight(str(tmp_path), "missing") is None
