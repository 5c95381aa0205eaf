#!/usr/bin/env python
"""Build an annotation-less COCO json from a directory of images (for
inference on unlabeled data).

Reference: ``tools/dataset_converters/images2coco.py``.

Usage:
    python tools/dataset_converters/images2coco.py <img_dir> <classes.txt> \
        <out.json> [--exts jpg,png]
"""
import argparse
import json
import os


def _image_size(path: str):
    try:
        import cv2

        img = cv2.imread(path)
        if img is not None:
            return int(img.shape[1]), int(img.shape[0])
    except Exception:
        pass
    # minimal header sniffing fallbacks (jpeg/png) to avoid a hard cv2 dep
    with open(path, "rb") as f:
        head = f.read(32)
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        import struct

        w, h = struct.unpack(">II", head[16:24])
        return int(w), int(h)
    raise RuntimeError(f"cannot determine image size of {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_dir")
    ap.add_argument("classes", help="txt file with one class name per line")
    ap.add_argument("out")
    ap.add_argument("--exts", default="jpg,jpeg,png,bmp")
    args = ap.parse_args()

    with open(args.classes) as f:
        names = [line.strip() for line in f if line.strip()]
    exts = tuple("." + e.lower().lstrip(".") for e in args.exts.split(","))
    files = sorted(
        fn
        for fn in os.listdir(args.img_dir)
        if fn.lower().endswith(exts)
    )
    images = []
    for i, fn in enumerate(files):
        w, h = _image_size(os.path.join(args.img_dir, fn))
        images.append(
            {"id": i + 1, "file_name": fn, "width": w, "height": h}
        )
    out = {
        "images": images,
        "annotations": [],
        "categories": [
            {"id": i + 1, "name": n} for i, n in enumerate(names)
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(images)} images, {len(names)} categories")


if __name__ == "__main__":
    main()
