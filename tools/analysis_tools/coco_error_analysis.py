#!/usr/bin/env python
"""Per-class precision breakdown at different IoU strictness (reference
``tools/analysis_tools/coco_error_analysis.py`` simplified: reports AP at
0.5/0.75/0.5:0.95 per class plus background-error proxies)."""
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
    p.add_argument("results")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.core.evaluation.coco_eval import (
        IOU_THRS,
        CocoStyleEval,
    )
    from boosting_rcnn_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    ds = build_dataset(cfg.data.to_dict()["test"], test_mode=True)
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    gts = [
        dict(bboxes=d["bboxes"], labels=d["labels"],
             bboxes_ignore=d["bboxes_ignore"])
        for d in ds.data_infos
    ]
    ev = CocoStyleEval(gts, results, num_classes=len(ds.CLASSES))
    ev.accumulate()
    report = {}
    for ki, name in enumerate(ds.CLASSES):
        p_all = ev.precision[:, :, ki, 0]
        valid = p_all > -1
        ap = float(p_all[valid].mean()) if valid.any() else float("nan")
        ap50 = float(p_all[0][p_all[0] > -1].mean()) if (p_all[0] > -1).any() else float("nan")
        ap75_idx = int(np.argmin(np.abs(IOU_THRS - 0.75)))
        row = p_all[ap75_idx]
        ap75 = float(row[row > -1].mean()) if (row > -1).any() else float("nan")
        report[name] = dict(AP=ap, AP50=ap50, AP75=ap75,
                            loc_error=round(ap50 - ap, 4))
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
