"""Multi-chip logic on the 8-device virtual CPU mesh: sharded train step
(DP+TP), sharded eval matching unsharded results, graft entry dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genconvit_tpu.config import Config
from genconvit_tpu.infer.engine import Predictor
from genconvit_tpu.models.genconvit import init_genconvit
from genconvit_tpu.parallel.eval_shard import (
    predict_long_video, predict_sharded, shard_file_list)
from genconvit_tpu.parallel.mesh import (
    make_mesh, param_shardings, shard_batch, shard_params)
from genconvit_tpu.train.loop import make_train_step
from genconvit_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    return cfg


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_tp_specs_target_fat_matmuls(small_cfg):
    mesh = make_mesh(data=4, model=2)
    params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "genconvit")
    sh = param_shardings(params, mesh, tensor_parallel=True)
    mu = sh["vae"]["encoder"]["mu"]["kernel"].spec
    assert mu == jax.sharding.PartitionSpec(None, "model")
    fc1 = sh["ed"]["backbone"]["stages"][0]["blocks"][0]["mlp"]["fc1"]["kernel"].spec
    assert fc1 == jax.sharding.PartitionSpec(None, "model")
    fc2 = sh["ed"]["backbone"]["stages"][0]["blocks"][0]["mlp"]["fc2"]["kernel"].spec
    assert fc2 == jax.sharding.PartitionSpec("model", None)
    # conv kernels stay replicated
    stem = sh["ed"]["backbone"]["stem"]["conv"]["kernel"].spec
    assert stem == jax.sharding.PartitionSpec()


def test_sharded_train_step_dp_tp(small_cfg):
    mesh = make_mesh(data=4, model=2)
    params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "ed")
    tx = make_optimizer(1e-4, 1e-4)
    params = shard_params(params, mesh, tensor_parallel=True)
    opt_state = tx.init(params)
    step = make_train_step("ed", tx, donate=False)
    rng = np.random.default_rng(0)
    images = shard_batch(rng.integers(0, 255, (8, 64, 64, 3), np.uint8), mesh)
    labels = shard_batch(np.arange(8, dtype=np.int32) % 2, mesh)
    params, opt_state, loss, acc = step(params, opt_state, images, labels,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_sharded_eval_matches_unsharded(small_cfg, rng):
    p = Predictor(small_cfg, net="ed", face_backend="fullframe")
    faces = (rng.random((5, 3, 64, 64, 3)) * 255).astype(np.uint8)  # V=5 pads to 8
    masks = np.ones((5, 3), np.float32)
    mesh = make_mesh(data=8, model=1)
    ys, vals = predict_sharded(p, faces, masks, mesh)
    ys_ref, vals_ref = p.predict_videos_batched(faces, masks)
    np.testing.assert_array_equal(ys, ys_ref)
    np.testing.assert_allclose(vals, vals_ref, rtol=1e-4, atol=1e-5)


def test_sharded_eval_uses_shard_map_for_dp(small_cfg, rng):
    """DP-only meshes must route through the shard_map forward (the path
    that keeps the Pallas kernel backbone usable on TPU meshes); TP meshes
    keep GSPMD auto-sharding."""
    p = Predictor(small_cfg, net="ed", face_backend="fullframe")
    faces = (rng.random((2, 3, 64, 64, 3)) * 255).astype(np.uint8)
    masks = np.ones((2, 3), np.float32)
    predict_sharded(p, faces, masks, make_mesh(data=8, model=1))
    assert len(getattr(p, "_shard_map_cache", {})) == 1
    predict_sharded(p, faces, masks, make_mesh(data=4, model=2),
                    tensor_parallel=True)
    assert len(p._shard_map_cache) == 1  # TP path did not add an entry


def test_sharded_params_cached_across_calls(small_cfg, rng):
    """The full param tree must be resharded ONCE per mesh, not per call —
    the VAE latent heads are ~630M elements in production."""
    from genconvit_tpu.parallel.eval_shard import sharded_params

    p = Predictor(small_cfg, net="ed", face_backend="fullframe")
    mesh = make_mesh(data=8, model=1)
    a = sharded_params(p, mesh, False)
    b = sharded_params(p, mesh, False)
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert all(la is lb for la, lb in zip(leaves_a, leaves_b))
    faces = (rng.random((2, 3, 64, 64, 3)) * 255).astype(np.uint8)
    masks = np.ones((2, 3), np.float32)
    predict_sharded(p, faces, masks, mesh)
    predict_sharded(p, faces, masks, mesh)
    assert len(p._sharded_params_cache) == 1


def test_long_video_frame_sharded_matches_unsharded(small_cfg, rng):
    """SURVEY §5 sequence axis: ONE video's frames sharded over 'data',
    masked psum-mean == the unsharded max_prediction_value aggregation.
    deterministic_vae pins the VAE draw so parity is exact-path."""
    p = Predictor(small_cfg, net="ed", face_backend="fullframe",
                  deterministic_vae=True)
    frames = (rng.random((21, 64, 64, 3)) * 255).astype(np.uint8)  # pads to 24
    mask = np.ones((21,), np.float32)
    mask[-2:] = 0.0  # ragged tail must not move the mean
    mesh = make_mesh(data=8, model=1)
    p._rng = jax.random.PRNGKey(3)
    p._video_counter = 0
    y, v = predict_long_video(p, frames, mask, mesh)
    p._rng = jax.random.PRNGKey(3)
    p._video_counter = 0
    fn = p._forward_fn(21, batched=True)
    y_u, v_u = fn(p.params, frames[None], mask[None], p._next_rng())
    assert y == int(np.asarray(y_u)[0])
    np.testing.assert_allclose(v, float(np.asarray(v_u)[0]),
                               rtol=1e-5, atol=1e-6)


def test_long_video_mask_actually_masks(small_cfg, rng):
    """Zero-mask rows (pad or dropped frames) must not affect the verdict:
    scoring F frames with a zeroed tail == scoring the F-2 prefix."""
    p = Predictor(small_cfg, net="ed", face_backend="fullframe",
                  deterministic_vae=True)
    frames = (rng.random((18, 64, 64, 3)) * 255).astype(np.uint8)
    mesh = make_mesh(data=8, model=1)
    mask = np.ones((18,), np.float32)
    mask[16:] = 0.0
    y_a, v_a = predict_long_video(p, frames, mask, mesh)
    y_b, v_b = predict_long_video(p, frames[:16], None, mesh)
    assert y_a == y_b
    np.testing.assert_allclose(v_a, v_b, rtol=1e-6, atol=1e-7)


def test_shard_file_list_partitions():
    paths = [f"v{i}.mp4" for i in range(10)]
    shards = [shard_file_list(paths, pi, 4) for pi in range(4)]
    assert sorted(sum(shards, [])) == sorted(paths)
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles_small():
    """entry() returns a jittable fn; compile-check on tiny stand-in shapes
    to keep CPU test time bounded (the driver checks the real 224 shapes)."""
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    jax.eval_shape(fn, *example_args)  # traces + shape-checks without running
