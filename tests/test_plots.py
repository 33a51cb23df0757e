"""Plot/report artifact generation over synthetic result fixtures."""

import json
import os


def _fixture(tmp_path, name, n=20):
    import numpy as np

    rng = np.random.default_rng(hash(name) % 2**32)
    labels = ["FAKE" if i % 2 else "REAL" for i in range(n)]
    preds = [float(np.clip(rng.normal(0.8 if l == "FAKE" else 0.2, 0.15), 0, 1))
             for l in labels]
    result = {"video": {
        "name": [f"v{i}.mp4" for i in range(n)],
        "pred": preds,
        "klass": ["x"] * n,
        "pred_label": ["FAKE" if p >= 0.5 else "REAL" for p in preds],
        "correct_label": labels,
    }}
    p = str(tmp_path / f"{name}.json")
    with open(p, "w") as f:
        json.dump(result, f)
    return p


def test_plot_roc_and_comparison(tmp_path):
    from genconvit_tpu.evalx.plots import plot_metrics_comparison, plot_roc

    a = _fixture(tmp_path, "run_a")
    b = _fixture(tmp_path, "run_b")
    roc = plot_roc([a, b], str(tmp_path / "roc.png"))
    assert os.path.getsize(roc) > 1000
    artifacts = plot_metrics_comparison([a, b], str(tmp_path / "cmp"))
    for key in ("bar_chart", "confusion", "csv", "report"):
        assert os.path.isfile(artifacts[key])
    csv = open(artifacts["csv"]).read()
    assert "run_a" in csv and "roc_auc" in csv
