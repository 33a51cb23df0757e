#!/usr/bin/env python
"""Compare result JSONs across runs: bar charts, confusion matrices, CSV +
text summary — equivalent of the reference's plot_comparison.py
(ref plot_comparison.py:12-207).

Usage: python plot_comparison.py result/a.json result/b.json [--out-dir DIR]
"""

import argparse

from genconvit_tpu.evalx.plots import plot_metrics_comparison


def main():
    p = argparse.ArgumentParser("plot_comparison")
    p.add_argument("results", nargs="+", help="result JSON files")
    p.add_argument("--out-dir", default="result/comparison")
    args = p.parse_args()
    artifacts = plot_metrics_comparison(args.results, args.out_dir)
    for k, v in artifacts.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
