#!/usr/bin/env bash
# A/B benchmark harness — equivalent of the reference's run_benchmark.sh:
# run prediction_v2 with both arch types over the same data, then compare.
# (arch v2 == original by design, SURVEY.md §8 B12 — the harness exists to
# keep the workflow; swap --net or --face-backend for real A/Bs.)
set -euo pipefail

DATA_DIR="${1:-sample_prediction_data}"
FRAMES="${2:-10}"
OUT_DIR="${3:-result/benchmark}"

mkdir -p "$OUT_DIR"

echo "== run 1: original =="
python prediction_v2.py --p "$DATA_DIR" --f "$FRAMES" --arch-type original \
    --result-dir "$OUT_DIR"

echo "== run 2: v2 =="
python prediction_v2.py --p "$DATA_DIR" --f "$FRAMES" --arch-type v2 \
    --result-dir "$OUT_DIR"

echo "== comparison =="
python plot_comparison.py "$OUT_DIR"/prediction_*.json --out-dir "$OUT_DIR"
