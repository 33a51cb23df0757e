"""Offline metric derivation from result JSONs.

Equivalent of the reference's result_all.py (ref result_all.py:18-57): labels
FAKE->1 from pred_label/correct_label, ROC-AUC over video['pred'] treated as
P(fake) (it is a pseudo-probability — SURVEY.md §8 B3), F1 at the 0.5
threshold, and real/fake/total accuracies. These formulas reproduce the
BASELINE.md aggregates from the reference's shipped result files.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_result(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def result_vectors(result: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(y_true, y_pred, scores) with FAKE == 1. Rows whose correct_label is
    not REAL/FAKE (e.g. 'unknown' from videos without ground truth, such as
    DFDC directories missing metadata.json) are excluded — counting them as
    REAL would pollute accuracy/F1/AUC. The excluded count is surfaced by
    result_metrics as n_excluded."""
    video = result["video"]
    keep = [i for i, c in enumerate(video["correct_label"])
            if c in ("REAL", "FAKE")]
    y_true = np.array([1 if video["correct_label"][i] == "FAKE" else 0
                       for i in keep])
    y_pred = np.array([1 if video["pred_label"][i] == "FAKE" else 0
                       for i in keep])
    scores = np.array([video["pred"][i] for i in keep], dtype=np.float64)
    return y_true, y_pred, scores


def result_metrics(result: Dict[str, Any]) -> Dict[str, float]:
    from sklearn.metrics import f1_score, roc_auc_score

    y_true, y_pred, scores = result_vectors(result)
    n = len(y_true)
    n_total = len(result["video"]["correct_label"])
    real_mask = y_true == 0
    fake_mask = y_true == 1
    out: Dict[str, float] = {
        "n": int(n),
        "n_excluded": int(n_total - n),
        "n_real": int(real_mask.sum()),
        "n_fake": int(fake_mask.sum()),
        "accuracy": float((y_true == y_pred).mean()) if n else float("nan"),
        "real_accuracy": float((y_pred[real_mask] == 0).mean())
        if real_mask.any() else float("nan"),
        "fake_accuracy": float((y_pred[fake_mask] == 1).mean())
        if fake_mask.any() else float("nan"),
    }
    if real_mask.any() and fake_mask.any():
        out["roc_auc"] = float(roc_auc_score(y_true, scores))
        out["f1"] = float(f1_score(y_true, (scores >= 0.5).astype(int)))
    return out


def roc_points(result: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray, float]:
    from sklearn.metrics import roc_auc_score, roc_curve

    y_true, _, scores = result_vectors(result)
    fpr, tpr, _ = roc_curve(y_true, scores)
    return fpr, tpr, float(roc_auc_score(y_true, scores))


def summarize(paths: List[str]) -> Dict[str, Dict[str, float]]:
    return {p: result_metrics(load_result(p)) for p in paths}
