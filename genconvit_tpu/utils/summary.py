"""Model summaries (equivalent of the fork's get_model_summary,
ref pred_func_updated.py:332-341)."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax

from genconvit_tpu.core.pytree import param_count, tree_bytes


def model_summary(params: Any, max_depth: int = 2) -> str:
    """Per-subtree parameter counts, torchsummary-flavored."""
    lines: List[str] = []

    def walk(tree: Any, path: Tuple[str, ...]):
        if len(path) >= max_depth or not isinstance(tree, (dict, list)):
            n = param_count(tree)
            mb = tree_bytes(tree) / 1e6
            lines.append(f"  {'/'.join(path) or '(root)':40s} {n:>12,}  {mb:8.1f} MB")
            return
        items = tree.items() if isinstance(tree, dict) else enumerate(tree)
        for k, v in items:
            walk(v, path + (str(k),))

    walk(params, ())
    total = param_count(params)
    lines.append(f"  {'TOTAL':40s} {total:>12,}  {tree_bytes(params) / 1e6:8.1f} MB")
    return "\n".join(lines)
