#!/usr/bin/env python
"""Aggregate corruption-benchmark results (reference
``tools/analysis_tools/robustness_eval.py``): given the json written by
``test_robustness.py --out``, print P (clean), mPC (mean performance under
corruption) and rPC (relative), plus the per-corruption table, optionally
restricted to the 15 benchmark corruptions."""
import argparse
import json

BENCHMARK_CORRUPTIONS = [
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("filename", help="json from test_robustness.py --out")
    p.add_argument("--aggregate", choices=["benchmark", "all"], default="benchmark")
    p.add_argument("--prints", nargs="*", default=["P", "mPC", "rPC"],
                   choices=["P", "mPC", "rPC"])
    args = p.parse_args()

    with open(args.filename) as f:
        res = json.load(f)
    table = res["per_corruption"]
    if args.aggregate == "benchmark":
        table = {k: v for k, v in table.items() if k in BENCHMARK_CORRUPTIONS}
    clean = res["clean_mAP"]
    mpc = sum(table.values()) / max(len(table), 1)
    print(f"corruptions aggregated: {sorted(table)}")
    for k in sorted(table):
        print(f"  {k:<20s} {table[k]:.4f}")
    if "P" in args.prints:
        print(f"Performance on Clean Data [P] (bbox mAP): {clean:.4f}")
    if "mPC" in args.prints:
        print(f"Mean Performance under Corruption [mPC] (bbox mAP): {mpc:.4f}")
    if "rPC" in args.prints:
        print(f"Relative Performance under Corruption [rPC]: {mpc / max(clean, 1e-9):.2%}")


if __name__ == "__main__":
    main()
