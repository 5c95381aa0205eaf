#!/usr/bin/env python
"""Anchor optimization via k-means / differential evolution over gt box
shapes (reference ``tools/analysis_tools/optimize_anchors.py``)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def kmeans_anchors(whs: np.ndarray, n: int, iters: int = 100, seed: int = 0):
    """K-means over (w, h) with IoU distance (YOLO-style)."""
    rs = np.random.RandomState(seed)
    centers = whs[rs.choice(len(whs), n, replace=False)].copy()

    def iou(wh, c):
        inter = np.minimum(wh[:, None, 0], c[None, :, 0]) * np.minimum(
            wh[:, None, 1], c[None, :, 1]
        )
        union = wh[:, None, 0] * wh[:, None, 1] + c[None, :, 0] * c[None, :, 1] - inter
        return inter / np.maximum(union, 1e-10)

    for _ in range(iters):
        assign = np.argmax(iou(whs, centers), axis=1)
        new = np.array(
            [
                np.median(whs[assign == k], axis=0)
                if (assign == k).any()
                else centers[k]
                for k in range(n)
            ]
        )
        if np.allclose(new, centers):
            break
        centers = new
    order = np.argsort(centers[:, 0] * centers[:, 1])
    mean_iou = float(np.max(iou(whs, centers), axis=1).mean())
    return centers[order], mean_iou


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--n-anchors", type=int, default=9)
    p.add_argument("--input-size", type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    ds = build_dataset(cfg.data.to_dict()["train"])
    whs = []
    for d in ds.data_infos:
        b = d["bboxes"]
        if len(b):
            scale = min(
                args.input_size[1] / d["width"], args.input_size[0] / d["height"]
            )
            wh = (b[:, 2:] - b[:, :2]) * scale
            whs.append(wh)
    whs = np.concatenate(whs)
    centers, mean_iou = kmeans_anchors(whs, args.n_anchors)
    print(f"optimized anchors (w, h) for input {args.input_size}, "
          f"mean best-IoU {mean_iou:.4f}:")
    for w, h in centers:
        print(f"  ({w:.1f}, {h:.1f})")


if __name__ == "__main__":
    main()
