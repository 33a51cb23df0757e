"""Golden-fixture test: our metric derivation over the reference's shipped
per-video prediction files must reproduce the BASELINE.md aggregates
(recomputed with the reference's own method, ref result_all.py:18-57)."""

import os

import pytest

from genconvit_tpu.evalx.metrics import load_result, result_metrics

REF_RESULT_DIR = "/root/reference/result"

GOLDEN = {
    # file -> (accuracy, real_acc, fake_acc, roc_auc, f1)  [BASELINE.md §recomputed]
    "data_april14_Celeb-DF.json": (0.9095, 0.8305, 0.9882, 0.9814, 0.9162),
    "data_april14_DFDC.json": (0.9850, 0.9870, 0.9845, 0.9994, 0.9907),
    "data_april11_DeepfakeTIMIT.json": (0.9703, 0.9635, 0.9844, 0.9970, 0.9553),
    "data_april14_FF++.json": (0.9705, 0.9559, 0.9852, 0.9960, 0.9709),
}


@pytest.mark.skipif(not os.path.isdir(REF_RESULT_DIR),
                    reason="reference result fixtures not mounted")
@pytest.mark.parametrize("fname,expected", GOLDEN.items())
def test_reference_golden_metrics(fname, expected):
    m = result_metrics(load_result(os.path.join(REF_RESULT_DIR, fname)))
    acc, racc, facc, auc, f1 = expected
    assert m["accuracy"] == pytest.approx(acc, abs=5e-4)
    assert m["real_accuracy"] == pytest.approx(racc, abs=5e-4)
    assert m["fake_accuracy"] == pytest.approx(facc, abs=5e-4)
    assert m["roc_auc"] == pytest.approx(auc, abs=5e-4)
    assert m["f1"] == pytest.approx(f1, abs=5e-4)


@pytest.mark.skipif(not os.path.isdir(REF_RESULT_DIR),
                    reason="reference result fixtures not mounted")
def test_mean_matches_paper_claims():
    accs, aucs = [], []
    for fname in GOLDEN:
        m = result_metrics(load_result(os.path.join(REF_RESULT_DIR, fname)))
        accs.append(m["accuracy"])
        aucs.append(m["roc_auc"])
    assert sum(accs) / 4 == pytest.approx(0.9588, abs=1e-3)  # README claims 95.8%
    assert sum(aucs) / 4 == pytest.approx(0.9935, abs=1e-3)  # README claims 99.3%
