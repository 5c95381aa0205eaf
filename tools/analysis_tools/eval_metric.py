#!/usr/bin/env python
"""Re-evaluate saved results (reference ``tools/analysis_tools/eval_metric.py``
re-runs metrics on a dumped pkl/json without re-running inference)."""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="results .pkl (list of (dets, labels)) ")
    p.add_argument("--eval", nargs="+", default=["bbox"])
    p.add_argument("--classwise", action="store_true")
    args = p.parse_args()

    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.coco import CocoDataset

    cfg = load_config(args.config)
    data_cfg = cfg.data.to_dict()
    ds = CocoDataset(
        ann_file=data_cfg["test"]["ann_file"],
        img_prefix=data_cfg["test"].get("img_prefix", ""),
        classes=data_cfg["test"].get("classes"),
        test_mode=True,
    )
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    metrics = ds.evaluate(results, metric=args.eval, classwise=args.classwise)
    print(json.dumps({k: v for k, v in metrics.items() if k != "classwise"}, indent=2))
    if args.classwise and "classwise" in metrics:
        for k, v in metrics["classwise"].items():
            print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
