"""Native checkpoint I/O.

Single-file msgpack checkpoints with the same logical contents as the
reference's torch saves ({'epoch','state_dict','optimizer','min_loss'} —
ref train.py:110-121, dataset/loader.py:125-141), plus a converter entry so
the published reference .pth files load transparently.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from genconvit_tpu.core.convert import convert_checkpoint

FORMAT = "genconvit_tpu.ckpt.v1"


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, *, epoch: int = 0,
                    min_loss: float = 0.0, opt_state: Any = None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    payload = {
        "format": FORMAT,
        "epoch": int(epoch),
        "min_loss": float(min_loss),
        "params": _to_numpy(params),
        # optax states are namedtuple pytrees; flatten to a plain state dict
        # (restored with restore_opt_state against a freshly built tx.init)
        "opt_state": (_to_numpy(serialization.to_state_dict(opt_state))
                      if opt_state is not None else None),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("format") != FORMAT:
        raise ValueError(f"not a genconvit_tpu checkpoint: {path}")
    return payload


def save_checkpoint_orbax(dir_path: str, params: Any, *, epoch: int = 0,
                          min_loss: float = 0.0, opt_state: Any = None) -> None:
    """Orbax-backed directory checkpoint — the multi-host/async-friendly
    backend for pod-scale training (the msgpack format stays the single-file
    default; both hold the same logical contents)."""
    import orbax.checkpoint as ocp

    payload = {
        "params": _to_numpy(params),
        "opt_state": (_to_numpy(serialization.to_state_dict(opt_state))
                      if opt_state is not None else {}),
        "meta": {"format": FORMAT, "epoch": epoch, "min_loss": min_loss},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(dir_path), payload, force=True)


def load_checkpoint_orbax(dir_path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(dir_path))
    meta = payload.get("meta", {})
    return {
        "format": meta.get("format", FORMAT),
        "epoch": int(meta.get("epoch", 0)),
        "min_loss": float(meta.get("min_loss", 0.0)),
        "params": payload["params"],
        "opt_state": payload.get("opt_state") or None,
        "extra": {},
    }


def restore_opt_state(template_opt_state: Any, saved_state_dict: Any) -> Any:
    """Rehydrate an optimizer state from its serialized state dict, using a
    freshly initialized opt_state as the structure template."""
    return serialization.from_state_dict(template_opt_state, saved_state_dict)


def load_params(path: str, which: Optional[str] = None) -> Tuple[Any, Dict[str, Any]]:
    """Load params from either a native checkpoint or a reference torch .pth
    (auto-converted). Returns (params, meta)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        params = convert_checkpoint(path, which=which)
        return params, {"source": "torch", "path": path}
    payload = load_checkpoint(path)
    params = payload["params"]
    if (which and isinstance(params, dict) and which in params
            and set(params) <= {"ed", "vae"}):
        # train_model saves the full tree nested under its branch key(s)
        # ({"ed": ...} / {"vae": ...} / both for joint training); the engine
        # asks for one branch — unwrap so a trained .gcv drops into the
        # same slot a converted reference .pth does.
        params = params[which]
    return params, {"source": "native", "path": path,
                    "epoch": payload.get("epoch"),
                    "min_loss": payload.get("min_loss")}


def resolve_weight(weight_dir: str, name: str) -> Optional[str]:
    """Find a weight file by basename, trying native then torch extensions
    (the reference resolves 'weight/{name}.pth' — model/genconvit.py:16)."""
    for ext in ("", ".gcv", ".msgpack", ".pth", ".pt"):
        p = os.path.join(weight_dir, name + ext)
        if os.path.isfile(p):
            return p
    return None
