"""Convert Cityscapes gtFine annotations to COCO-format json (reference
``tools/dataset_converters/cityscapes.py``, without the cityscapesscripts
dependency: instance polygons are read straight from the *_polygons.json
files).

Usage:
    python tools/dataset_converters/cityscapes.py CITYSCAPES_ROOT \
        --out-dir annotations
"""
from __future__ import annotations

import argparse
import glob
import json
import os

THING_CLASSES = {
    "person": 24, "rider": 25, "car": 26, "truck": 27, "bus": 28,
    "train": 31, "motorcycle": 32, "bicycle": 33,
}


def polygon_bbox(poly):
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x1, y1 = min(xs), min(ys)
    return [x1, y1, max(xs) - x1, max(ys) - y1]


def polygon_area(poly):
    a = 0.0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2.0


def convert_split(root: str, split: str, out_file: str):
    ann_files = sorted(glob.glob(
        os.path.join(root, "gtFine", split, "*", "*_polygons.json")))
    images, annotations = [], []
    cats = [
        dict(id=i + 1, name=n) for i, n in enumerate(THING_CLASSES)
    ]
    name2id = {n: i + 1 for i, n in enumerate(THING_CLASSES)}
    ann_id = 1
    for img_id, af in enumerate(ann_files, start=1):
        with open(af) as f:
            data = json.load(f)
        stem = os.path.basename(af).replace("_gtFine_polygons.json", "")
        city = os.path.basename(os.path.dirname(af))
        images.append(dict(
            id=img_id,
            file_name=os.path.join(
                city, f"{stem}_leftImg8bit.png"),
            width=data["imgWidth"],
            height=data["imgHeight"],
        ))
        for obj in data.get("objects", []):
            label = obj["label"]
            crowd = 0
            if label.endswith("group"):
                label = label[: -len("group")]
                crowd = 1
            if label not in name2id:
                continue
            poly = obj["polygon"]
            if len(poly) < 3:
                continue
            annotations.append(dict(
                id=ann_id,
                image_id=img_id,
                category_id=name2id[label],
                bbox=polygon_bbox(poly),
                area=polygon_area(poly),
                iscrowd=crowd,
                segmentation=[[c for p in poly for c in p]],
            ))
            ann_id += 1
    with open(out_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)
    print(f"{split}: {len(images)} images, {len(annotations)} anns "
          f"-> {out_file}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--out-dir", default="annotations")
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        convert_split(
            args.root, split,
            os.path.join(args.out_dir,
                         f"instancesonly_filtered_gtFine_{split}.json"))


if __name__ == "__main__":
    main()
