#!/usr/bin/env python
"""Visualize the best/worst predictions by per-image mAP (reference
``tools/analysis_tools/analyze_results.py``)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="pickled per-image results")
    p.add_argument("out_dir")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import cv2

    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.core.evaluation.mean_ap import eval_map
    from boosting_rcnn_tpu.core.visualization import draw_detections
    from boosting_rcnn_tpu.data.builder import build_dataset
    from boosting_rcnn_tpu.data.pipeline import load_image

    cfg = load_config(args.config)
    ds = build_dataset(cfg.data.to_dict()["test"], test_mode=True)
    with open(args.results, "rb") as f:
        results = pickle.load(f)

    scores = []
    for i, d in enumerate(ds.data_infos):
        ann = dict(bboxes=d["bboxes"], labels=d["labels"],
                   bboxes_ignore=d["bboxes_ignore"])
        m, _ = eval_map([results[i][:2]], [ann], num_classes=len(ds.CLASSES))
        scores.append(m)
    order = np.argsort(scores)
    os.makedirs(args.out_dir, exist_ok=True)
    for tag, idxs in (("worst", order[: args.topk]), ("best", order[::-1][: args.topk])):
        for i in idxs:
            img = load_image(ds.img_path(int(i)))
            dets, labels = results[int(i)][:2]
            keep = dets[:, 4] >= args.score_thr
            img = draw_detections(img, dets[keep], labels[keep], ds.CLASSES)
            out = os.path.join(args.out_dir, f"{tag}_{scores[int(i)]:.3f}_{i}.jpg")
            cv2.imwrite(out, img)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
