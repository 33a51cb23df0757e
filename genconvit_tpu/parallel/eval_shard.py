"""Sharded dataset evaluation.

The reference evaluates datasets serially in one process (ref
prediction.py:22-47 per-video loop) — the only "cluster" behavior to
reproduce is embarrassingly-parallel video scoring (SURVEY.md §2.4). Here the
video list shards across mesh 'data' chips: hosts decode/detect locally, each
chip scores its shard of the fixed-shape face batch under one jitted call,
results gather back to the host. Multi-host runs shard the *file list* per
process (shard_file_list) before this per-host batching.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from genconvit_tpu.infer.engine import Predictor
from genconvit_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params


def shard_file_list(paths: Sequence[str], process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> List[str]:
    """Round-robin split of the video list across hosts (multi-host entry:
    jax.distributed.initialize sets process_index/count)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(paths) if i % pc == pi]


def sharded_params(predictor: Predictor, mesh, tensor_parallel: bool):
    """Predictor params resharded for `mesh`, cached on the predictor.

    Without the cache every predict_sharded call re-device_puts the full
    param tree (the VAE latent heads alone are ~630M elements) — pathological
    in a real sharded-eval loop. Keyed by (mesh devices, axes, tp flag)."""
    key = (tuple(d.id for d in mesh.devices.flat),
           tuple(mesh.shape.items()), tensor_parallel)
    cache = getattr(predictor, "_sharded_params_cache", None)
    if cache is None:
        cache = predictor._sharded_params_cache = {}
    if key not in cache:
        cache[key] = shard_params(predictor.params, mesh, tensor_parallel)
    return cache[key]


def _shard_map_forward(predictor: Predictor, mesh, num_frames: int):
    """Data-parallel forward via shard_map: each 'data' shard traces with
    LOCAL shapes, so the Pallas kernel backbone (opaque to XLA
    auto-sharding) stays usable — single-chip and sharded eval run the same
    fast path. Per-shard rngs are folded from the axis index (each shard's
    eval-time VAE sampling draw is independent, matching the per-video iid
    semantics of the unsharded path). Cached per (mesh, frames, kernel
    plan) — the plan is in the key for the same reason _forward_fn keys its
    cache on it (engine.py): a caller that mutates predictor.kernel_plan
    between sharded calls must get a fresh trace, not the stale variant."""
    key = ("shard_map", tuple(d.id for d in mesh.devices.flat), num_frames,
           predictor.kernel_plan)
    cache = getattr(predictor, "_shard_map_cache", None)
    if cache is None:
        cache = predictor._shard_map_cache = {}
    if key not in cache:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        # kernel_scope=True: a DISTINCT jit from the single-chip paths — the
        # scope is a trace-time ContextVar, so it must be in the forward-fn
        # cache key or the two sharding regimes would alias each other's
        # traced backbone at matching local shapes
        fn = predictor._forward_fn(num_frames, batched=True, kernel_scope=True)

        def local_fwd(params, fb, mk, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return fn(params, fb, mk, rng)

        cache[key] = jax.jit(shard_map(
            local_fwd, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=(P("data"), P("data")), check_rep=False))
    return cache[key]


def _long_video_forward(predictor: Predictor, mesh, num_frames: int):
    """shard_map forward for ONE video with the FRAME axis sharded over
    'data' (the sequence-parallel analog, SURVEY §5): each chip scores its
    F/n frame slice, the masked frame mean becomes two `lax.psum`s over
    'data' (`aggregate.masked_prob_sums` -> psum -> `finish_aggregate`) —
    the distributed form of the reference's mean over frames (ref
    model/pred_func.py:123-131). Per-shard rngs fold from the axis index
    (VAE eval-time sampling stays iid across shards); deterministic_vae
    predictors get exact parity with the unsharded forward."""
    key = ("long_video", tuple(d.id for d in mesh.devices.flat), num_frames,
           predictor.kernel_plan, predictor.deterministic_vae)
    cache = getattr(predictor, "_shard_map_cache", None)
    if cache is None:
        cache = predictor._shard_map_cache = {}
    if key not in cache:
        import jax.numpy as jnp
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from genconvit_tpu.data.preprocess import normalize_batch
        from genconvit_tpu.infer.aggregate import (
            finish_aggregate, masked_prob_sums)
        from genconvit_tpu.models.convnext import kernel_backbone_scope
        from genconvit_tpu.models.genconvit import genconvit_apply
        from genconvit_tpu.ops.kernel_plan import plan_scope

        net, dtype, plan = predictor.net, predictor.dtype, predictor.kernel_plan
        sample = not predictor.deterministic_vae

        def local_fwd(params, frames_u8, mask, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            x = normalize_batch(frames_u8, dtype)
            with plan_scope(plan), kernel_backbone_scope():
                logits, _ = genconvit_apply(params, x, net=net, rng=rng,
                                            sample=sample)
            full_mask = (jnp.concatenate([mask, mask])
                         if net == "genconvit" else mask)
            part, cnt = masked_prob_sums(logits, full_mask)
            return finish_aggregate(jax.lax.psum(part, "data"),
                                    jax.lax.psum(cnt, "data"))

        cache[key] = jax.jit(shard_map(
            local_fwd, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=(P(), P()), check_rep=False))
    return cache[key]


def predict_long_video(
    predictor: Predictor,
    frames_u8: np.ndarray,          # [F, S, S, 3] uint8
    mask: Optional[np.ndarray] = None,  # [F] float32 validity (None = all)
    mesh=None,
) -> Tuple[int, float]:
    """Score ONE long video with its FRAME axis sharded across mesh 'data'.

    The latency-oriented dual of predict_sharded (which shards the video
    axis): a single F-frame video — e.g. full-coverage scoring at F=120+ —
    splits F across chips, each chip runs the backbone on F/n frames, and
    the verdict mean reduces with a psum. F pads up to a multiple of the
    data-axis size with zero-mask rows (dropped from the mean by
    construction, same masking as the ragged-faces path)."""
    mesh = mesh or make_mesh()
    ndata = mesh.shape["data"]
    f = frames_u8.shape[0]
    if mask is None:
        mask = np.ones((f,), np.float32)
    pad = (-f) % ndata
    if pad:
        frames_u8 = np.concatenate(
            [frames_u8,
             np.zeros((pad,) + frames_u8.shape[1:], frames_u8.dtype)])
        mask = np.concatenate([mask, np.zeros((pad,), np.float32)])
    params = sharded_params(predictor, mesh, False)
    fn = _long_video_forward(predictor, mesh, frames_u8.shape[0])
    sh = batch_sharding(mesh)
    fb = jax.device_put(np.ascontiguousarray(frames_u8), sh)
    mk = jax.device_put(np.asarray(mask, np.float32), sh)
    with mesh:
        y, y_val = fn(params, fb, mk, predictor._next_rng())
    return int(y), float(y_val)


def predict_sharded(
    predictor: Predictor,
    faces_batch: np.ndarray,   # [V, F, S, S, 3] uint8
    masks: np.ndarray,         # [V, F] float32
    mesh=None,
    tensor_parallel: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Score V videos with the video axis sharded across mesh 'data'.

    V is padded up to a multiple of the data-axis size (padded rows carry
    zero masks and are dropped from the result). Data-parallel-only meshes
    run through shard_map (keeps the Pallas kernel backbone usable on TPU);
    tensor_parallel=True uses GSPMD auto-sharding with the TP
    PartitionSpecs (plain-graph backbone)."""
    mesh = mesh or make_mesh()
    ndata = mesh.shape["data"]
    v = faces_batch.shape[0]
    pad = (-v) % ndata
    if pad:
        faces_batch = np.concatenate(
            [faces_batch, np.zeros((pad,) + faces_batch.shape[1:], faces_batch.dtype)])
        masks = np.concatenate([masks, np.zeros((pad,) + masks.shape[1:], masks.dtype)])

    params = sharded_params(predictor, mesh, tensor_parallel)
    sh = batch_sharding(mesh)
    fb = jax.device_put(faces_batch, sh)
    mk = jax.device_put(masks, sh)
    if not tensor_parallel and mesh.shape.get("model", 1) == 1:
        fn = _shard_map_forward(predictor, mesh, faces_batch.shape[1])
        with mesh:
            y, y_val = fn(params, fb, mk, predictor._next_rng())
    else:
        fn = predictor._forward_fn(faces_batch.shape[1], batched=True)
        y, y_val = fn(params, fb, mk, predictor._next_rng())
    return np.asarray(y)[:v], np.asarray(y_val)[:v]
