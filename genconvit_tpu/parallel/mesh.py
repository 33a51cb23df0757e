"""Device mesh + sharding rules (GSPMD).

The reference is single-process/single-device (SURVEY.md §2.4); here data
parallelism and optional tensor parallelism are first-class:

  * mesh axes ('data', 'model') over any chip count; batches shard on 'data',
    gradients all-reduce over 'data' automatically under jit;
  * TP PartitionSpecs target the fat matmuls: the VAE's mu/var heads
    (25088x12544 each — the largest parameter blocks in the model), the
    ConvNeXt MLP pairs (fc1 col-sharded, fc2 row-sharded), and the branch
    heads. XLA inserts the all-gathers/reduce-scatters over ICI.

No NCCL/MPI analog exists or is needed — collectives are compiled into the
program from sharding annotations (the scaling-book recipe).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / video) axis across 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


# --------------------------------------------------------------- TP rules


def _tp_spec_for_path(path: Tuple, leaf) -> P:
    """PartitionSpec for one param leaf under tensor parallelism."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    ndim = getattr(leaf, "ndim", 0)
    # VAE latent heads: col-shard the huge (25088, 12544) matmuls. The
    # engine's load-time folds rename them (mu -> mu_hwc -> mu_hwc_q with a
    # wq/scale pair — models/vae.py permute_latent_heads_hwc /
    # quantize_latent_heads_int8), so match by prefix and treat the int8
    # weight like a kernel; both layouts are column-sharded the same way.
    head = any(isinstance(k, str) and k.startswith(("mu", "var"))
               for k in keys)
    if head and ("kernel" in keys or "wq" in keys) and ndim == 2:
        return P(None, MODEL_AXIS)
    if head and ("bias" in keys or "scale" in keys) and ndim == 1:
        return P(MODEL_AXIS)
    # ConvNeXt / Swin MLPs: fc1 col-sharded, fc2 row-sharded (Megatron pattern)
    if "mlp" in keys and "fc1" in keys and "kernel" in keys and ndim == 2:
        return P(None, MODEL_AXIS)
    if "mlp" in keys and "fc1" in keys and "bias" in keys:
        return P(MODEL_AXIS)
    if "mlp" in keys and "fc2" in keys and "kernel" in keys and ndim == 2:
        return P(MODEL_AXIS, None)
    # branch heads: fc col-sharded, fc2 row-sharded
    if keys[-2:] == ["fc", "kernel"] and ndim == 2:
        return P(None, MODEL_AXIS)
    if keys[-2:] == ["fc", "bias"]:
        return P(MODEL_AXIS)
    if keys[-2:] == ["fc2", "kernel"] and ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """Tree of NamedShardings for a param tree (replicated, or TP rules)."""
    if not tensor_parallel or MODEL_AXIS not in mesh.axis_names or \
            mesh.shape[MODEL_AXIS] == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_spec_for_path(path, leaf)),
        params)


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """device_put the tree with its shardings; jit propagates them and GSPMD
    inserts the collectives."""
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.device_put(params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
