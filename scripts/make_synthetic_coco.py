"""Deterministic synthetic COCO dataset of drawn shapes (VERDICT r2 item 4).

Four visually-distinct classes — red circle, green square, blue triangle,
yellow ellipse — on a dark noisy background.  Easy enough that a tiny
from-scratch detector reaches high AP in a few hundred steps, which turns
"losses decrease" into "this framework trains detectors"
(scripts/e2e_ap_check.py runs train -> checkpoint -> eval on it).
"""
from __future__ import annotations

import json
import os

import numpy as np

# class names reuse the flagship UTDAC list so the shipping config's
# data.classes filter passes through unchanged; shapes map 1:1
# (echinus=circle, holothurian=square, scallop=triangle, starfish=ellipse)
CLASSES = ("echinus", "holothurian", "scallop", "starfish")
IMG_H, IMG_W = 160, 200


def _ngon(cx, cy, a, b, n=24):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + a * np.cos(t), cy + b * np.sin(t)], axis=1)


def _draw_shape(img, cls, cx, cy, s, rng):
    """Draw one shape; returns (x1, y1, x2, y2, polygon (P, 2))."""
    import cv2

    colors = [(40, 40, 230), (40, 220, 40), (230, 60, 40), (40, 220, 230)]
    color = tuple(int(c + rng.randint(-20, 20)) for c in colors[cls])
    if cls == 0:
        cv2.circle(img, (cx, cy), s // 2, color, -1)
        poly = _ngon(cx, cy, s / 2, s / 2)
        return cx - s // 2, cy - s // 2, cx + s // 2, cy + s // 2, poly
    if cls == 1:
        cv2.rectangle(img, (cx - s // 2, cy - s // 2),
                      (cx + s // 2, cy + s // 2), color, -1)
        poly = np.array(
            [[cx - s / 2, cy - s / 2], [cx + s / 2, cy - s / 2],
             [cx + s / 2, cy + s / 2], [cx - s / 2, cy + s / 2]], np.float64)
        return cx - s // 2, cy - s // 2, cx + s // 2, cy + s // 2, poly
    if cls == 2:
        pts = np.array(
            [[cx, cy - s // 2], [cx - s // 2, cy + s // 2],
             [cx + s // 2, cy + s // 2]], np.int32)
        cv2.fillPoly(img, [pts], color)
        return (cx - s // 2, cy - s // 2, cx + s // 2, cy + s // 2,
                pts.astype(np.float64))
    cv2.ellipse(img, (cx, cy), (s // 2, s // 3), 0, 0, 360, color, -1)
    poly = _ngon(cx, cy, s / 2, s / 3)
    return cx - s // 2, cy - s // 3, cx + s // 2, cy + s // 3, poly


def generate(out_dir: str, n_train: int = 200, n_val: int = 50,
             seed: int = 0) -> None:
    import cv2

    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(out_dir, split)
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        ann_id = 1
        for i in range(n):
            img = rng.randint(0, 40, (IMG_H, IMG_W, 3)).astype(np.uint8)
            k = rng.randint(1, 4)
            placed = []
            for _ in range(k):
                cls = int(rng.randint(0, 4))
                s = int(rng.randint(26, 60))
                cx = int(rng.randint(s // 2 + 2, IMG_W - s // 2 - 2))
                cy = int(rng.randint(s // 2 + 2, IMG_H - s // 2 - 2))
                # keep shapes apart so boxes are unambiguous
                if any(abs(cx - px) < (s + ps) // 2 + 4
                       and abs(cy - py) < (s + ps) // 2 + 4
                       for px, py, ps in placed):
                    continue
                placed.append((cx, cy, s))
                x1, y1, x2, y2, poly = _draw_shape(img, cls, cx, cy, s, rng)
                x1, y1 = max(x1, 0), max(y1, 0)
                x2, y2 = min(x2, IMG_W), min(y2, IMG_H)
                poly[:, 0] = poly[:, 0].clip(0, IMG_W)
                poly[:, 1] = poly[:, 1].clip(0, IMG_H)
                # shoelace polygon area (COCO-style segm area)
                px, py = poly[:, 0], poly[:, 1]
                seg_area = 0.5 * abs(float(
                    np.dot(px, np.roll(py, -1)) - np.dot(py, np.roll(px, -1))
                ))
                annotations.append(dict(
                    id=ann_id, image_id=i + 1, category_id=cls + 1,
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    segmentation=[np.round(poly, 2).reshape(-1).tolist()],
                    area=seg_area, iscrowd=0,
                ))
                ann_id += 1
            fn = f"{split}_{i:04d}.jpg"
            cv2.imwrite(os.path.join(img_dir, fn), img)
            images.append(dict(id=i + 1, file_name=fn,
                               width=IMG_W, height=IMG_H))
        coco = dict(
            images=images,
            annotations=annotations,
            categories=[
                dict(id=c + 1, name=name) for c, name in enumerate(CLASSES)
            ],
        )
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(coco, f)
        print(f"{split}: {len(images)} images, {len(annotations)} anns")


if __name__ == "__main__":
    import sys

    generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_coco")
