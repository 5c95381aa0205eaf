#!/usr/bin/env python
"""Visualize dataset samples after the pipeline (reference
``tools/misc/browse_dataset.py``); writes annotated images to an output dir."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--output-dir", default="browse_out")
    p.add_argument("--num", type=int, default=10)
    args = p.parse_args()

    import cv2

    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.core.visualization import draw_detections
    from boosting_rcnn_tpu.data.coco import CocoDataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    cfg = load_config(args.config)
    data_cfg = cfg.data.to_dict()
    ds = CocoDataset(
        ann_file=data_cfg["train"]["ann_file"],
        img_prefix=data_cfg["train"].get("img_prefix", ""),
        classes=data_cfg["train"].get("classes"),
    )
    pipeline = data_cfg["train"].get("pipeline", {})
    loader = DetDataLoader(
        ds, batch_size=1, canvas=tuple(pipeline.get("canvas", (800, 1344))),
        train=True,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    mean = np.array([123.675, 116.28, 103.53])
    std = np.array([58.395, 57.12, 57.375])
    for i, batch in enumerate(loader.epoch_iter(0)):
        if i >= args.num:
            break
        img = (batch["images"][0] * std + mean).clip(0, 255).astype(np.uint8)
        img = img[..., ::-1].copy()  # RGB -> BGR for cv2
        boxes = batch["gt_bboxes"][0][batch["gt_mask"][0]]
        labels = batch["gt_labels"][0][batch["gt_mask"][0]]
        img = draw_detections(img, boxes, labels, class_names=ds.CLASSES)
        out = os.path.join(args.output_dir, f"sample_{i}.jpg")
        cv2.imwrite(out, img)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
