"""Param-pytree utilities."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# Dead parameter groups (never in the forward graph — SURVEY.md §8 B9/Q1),
# present in converted reference checkpoints. Pruned before device upload.
DEAD_KEYS_BRANCH = ("embedder", "hybrid_proj", "fc3")
DEAD_KEYS_VAE_ENCODER = ("fc1", "fc2")


def live_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Drop checkpoint-only parameter groups from an ed/vae/ensemble tree."""

    def prune_branch(branch: Dict[str, Any]) -> Dict[str, Any]:
        out = {k: v for k, v in branch.items() if k not in DEAD_KEYS_BRANCH}
        if "encoder" in out and isinstance(out["encoder"], dict):
            out["encoder"] = {
                k: v for k, v in out["encoder"].items()
                if k not in DEAD_KEYS_VAE_ENCODER
            }
        return out

    if "ed" in params or "vae" in params:
        return {k: prune_branch(v) if k in ("ed", "vae") else v
                for k, v in params.items()}
    return prune_branch(params)


def cast_floats(tree: Any, dtype) -> Any:
    """Cast floating-point leaves (e.g. fp32 -> bf16 for inference uploads)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def param_count(tree: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def tree_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))
