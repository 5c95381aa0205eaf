"""AutoAugment for detection (reference
``mmdet/datasets/pipelines/auto_augment.py:47``): box-aware geometric ops
(Rotate / Shear / Translate), color ops (Color / Brightness / Contrast /
Equalize), and the policy chooser that applies one randomly selected
sub-policy per sample.  Host-side numpy/cv2, applied before the fused
resize/flip/normalize/pad stage like Mosaic/MixUp."""
from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_MAX_LEVEL = 10


def level_to_value(level: float, max_value: float) -> float:
    return level / _MAX_LEVEL * max_value


def _warp_boxes(boxes: np.ndarray, m: np.ndarray, w: int, h: int,
                min_size: float = 2.0):
    """Affine-warp xyxy boxes: transform the 4 corners, take extents, clip;
    returns (boxes, keep mask)."""
    if len(boxes) == 0:
        return boxes, np.zeros((0,), bool)
    corners = np.stack(
        [
            boxes[:, [0, 1]], boxes[:, [2, 1]],
            boxes[:, [0, 3]], boxes[:, [2, 3]],
        ],
        axis=1,
    )  # (N, 4, 2)
    ones = np.ones((*corners.shape[:2], 1))
    pts = np.concatenate([corners, ones], axis=-1) @ m.T  # (N, 4, 2)
    x1 = pts[..., 0].min(1).clip(0, w)
    y1 = pts[..., 1].min(1).clip(0, h)
    x2 = pts[..., 0].max(1).clip(0, w)
    y2 = pts[..., 1].max(1).clip(0, h)
    out = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    keep = ((x2 - x1) >= min_size) & ((y2 - y1) >= min_size)
    return out, keep


def _affine(img, boxes, labels, m, fill=(128, 128, 128)):
    h, w = img.shape[:2]
    if cv2 is not None:
        img = cv2.warpAffine(img, m, (w, h), borderValue=fill)
    boxes, keep = _warp_boxes(boxes, m, w, h)
    return img, boxes[keep], labels[keep]


def rotate(img, boxes, labels, angle: float, fill=(128, 128, 128)):
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    return _affine(img, boxes, labels, m, fill)


def shear(img, boxes, labels, magnitude: float, axis: str = "x",
          fill=(128, 128, 128)):
    if axis == "x":
        m = np.asarray([[1, magnitude, 0], [0, 1, 0]], np.float64)
    else:
        m = np.asarray([[1, 0, 0], [magnitude, 1, 0]], np.float64)
    return _affine(img, boxes, labels, m, fill)


def translate(img, boxes, labels, offset: float, axis: str = "x",
              fill=(128, 128, 128)):
    if axis == "x":
        m = np.asarray([[1, 0, offset], [0, 1, 0]], np.float64)
    else:
        m = np.asarray([[1, 0, 0], [0, 1, offset]], np.float64)
    return _affine(img, boxes, labels, m, fill)


def equalize(img, boxes, labels):
    if cv2 is None:
        return img, boxes, labels
    chans = [cv2.equalizeHist(img[..., c]) for c in range(img.shape[-1])]
    return np.stack(chans, -1), boxes, labels


def color_op(img, boxes, labels, factor: float, kind: str = "color"):
    x = img.astype(np.float32)
    if kind == "color":  # blend with grayscale
        gray = x.mean(-1, keepdims=True)
        x = gray + factor * (x - gray)
    elif kind == "brightness":
        x = x * factor
    elif kind == "contrast":
        mean = x.mean()
        x = mean + factor * (x - mean)
    return x.clip(0, 255).astype(img.dtype), boxes, labels


# mmdet's published detection policies (auto_augment.py docstring v0-style)
def default_policies() -> List[List[Dict]]:
    return [
        [dict(op="translate", axis="x", level=6, prob=0.6),
         dict(op="contrast", level=6, prob=0.4)],
        [dict(op="rotate", level=8, prob=0.6),
         dict(op="color", level=4, prob=0.6)],
        [dict(op="shear", axis="y", level=6, prob=0.6),
         dict(op="equalize", level=0, prob=0.6)],
        [dict(op="shear", axis="x", level=4, prob=0.4),
         dict(op="translate", axis="y", level=8, prob=0.6)],
        [dict(op="rotate", level=6, prob=0.4),
         dict(op="brightness", level=6, prob=0.4)],
    ]


def apply_policy(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.RandomState,
    policies: Optional[List[List[Dict]]] = None,
):
    """Pick ONE sub-policy at random and apply its ops in order (each with
    its own probability and a random sign on geometric magnitudes)."""
    policies = policies or default_policies()
    sub = policies[rng.randint(len(policies))]
    h, w = img.shape[:2]
    for op in sub:
        if rng.rand() > op.get("prob", 1.0):
            continue
        name = op["op"]
        lvl = op.get("level", 5)
        sign = -1.0 if rng.rand() < 0.5 else 1.0
        if name == "rotate":
            img, boxes, labels = rotate(
                img, boxes, labels, sign * level_to_value(lvl, 30.0)
            )
        elif name == "shear":
            img, boxes, labels = shear(
                img, boxes, labels, sign * level_to_value(lvl, 0.3),
                axis=op.get("axis", "x"),
            )
        elif name == "translate":
            frac = level_to_value(lvl, 0.1)
            off = sign * frac * (w if op.get("axis", "x") == "x" else h)
            img, boxes, labels = translate(
                img, boxes, labels, off, axis=op.get("axis", "x")
            )
        elif name == "equalize":
            img, boxes, labels = equalize(img, boxes, labels)
        elif name in ("color", "brightness", "contrast"):
            img, boxes, labels = color_op(
                img, boxes, labels,
                1.0 + sign * level_to_value(lvl, 0.9), kind=name,
            )
    return img, boxes, labels
