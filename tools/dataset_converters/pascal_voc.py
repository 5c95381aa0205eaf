#!/usr/bin/env python
"""Convert Pascal VOC XML annotations to a COCO-style json.

Reference: ``tools/dataset_converters/pascal_voc.py`` (mmdet converts VOC to
its pickle middle format; here the target is COCO json, which every loader
in this framework consumes directly).

Usage:
    python tools/dataset_converters/pascal_voc.py <VOCdevkit/VOC2007> \
        <ImageSets/Main/trainval.txt> <out.json> [--classes a,b,...]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from boosting_rcnn_tpu.data.voc import VOC_CLASSES, VOCDataset


def voc_to_coco(voc_root: str, ann_file: str, classes=None) -> dict:
    ds = VOCDataset(
        ann_file=ann_file, img_prefix=voc_root, classes=classes,
        test_mode=True,
    )
    images, annotations = [], []
    categories = [
        {"id": i + 1, "name": c} for i, c in enumerate(ds.CLASSES)
    ]
    ann_id = 1
    for idx, info in enumerate(ds.data_infos):
        img_id = idx + 1
        images.append(
            {
                "id": img_id,
                "file_name": info["filename"],
                "width": info["width"],
                "height": info["height"],
            }
        )
        for box, lab in zip(info["bboxes"], info["labels"]):
            x1, y1, x2, y2 = [float(v) for v in box]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": int(lab) + 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        for box in info["bboxes_ignore"]:
            x1, y1, x2, y2 = [float(v) for v in box]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 1,  # difficult -> ignore region
                }
            )
            ann_id += 1
    return {
        "images": images,
        "annotations": annotations,
        "categories": categories,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("voc_root")
    ap.add_argument("ann_file")
    ap.add_argument("out")
    ap.add_argument("--classes", default=None)
    args = ap.parse_args()
    classes = args.classes.split(",") if args.classes else None
    coco = voc_to_coco(args.voc_root, args.ann_file, classes)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    print(
        f"wrote {args.out}: {len(coco['images'])} images, "
        f"{len(coco['annotations'])} annotations"
    )


if __name__ == "__main__":
    main()
