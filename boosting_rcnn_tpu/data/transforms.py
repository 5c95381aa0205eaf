"""Extended train-time augmentations (host side, numpy/cv2).

Reference surface: ``mmdet/datasets/pipelines/transforms.py`` —
``PhotoMetricDistortion``, ``Expand``, ``MinIoURandomCrop``, ``RandomCrop``,
``CutOut``, ``Mosaic``/``MixUp`` (YOLOX-style).  These run before the fused
resize/normalize/pad stage, on uint8 BGR images + float boxes.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def photo_metric_distortion(
    img: np.ndarray,
    rng: np.random.RandomState,
    brightness_delta: int = 32,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: int = 18,
) -> np.ndarray:
    """Random brightness/contrast/saturation/hue (uint8 BGR in/out)."""
    img = img.astype(np.float32)
    if rng.randint(2):
        img += rng.uniform(-brightness_delta, brightness_delta)
    mode = rng.randint(2)
    if mode == 1 and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    if cv2 is not None:
        hsv = cv2.cvtColor(img.clip(0, 255).astype(np.uint8), cv2.COLOR_BGR2HSV).astype(
            np.float32
        )
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*saturation_range)
        if rng.randint(2):
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) % 180
        img = cv2.cvtColor(
            hsv.clip(0, 255).astype(np.uint8), cv2.COLOR_HSV2BGR
        ).astype(np.float32)
    if mode == 0 and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    return img.clip(0, 255).astype(np.uint8)


def expand(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.RandomState,
    mean: Sequence[float] = (123.675, 116.28, 103.53),
    ratio_range: Tuple[float, float] = (1, 4),
    prob: float = 0.5,
):
    """Place the image on a larger mean-filled canvas (SSD-style zoom-out)."""
    if rng.rand() > prob:
        return img, boxes
    h, w = img.shape[:2]
    ratio = rng.uniform(*ratio_range)
    nh, nw = int(h * ratio), int(w * ratio)
    top = rng.randint(0, nh - h + 1)
    left = rng.randint(0, nw - w + 1)
    out = np.empty((nh, nw, 3), img.dtype)
    out[...] = np.asarray(mean[::-1], img.dtype)  # BGR mean fill
    out[top : top + h, left : left + w] = img
    b = boxes.copy()
    if len(b):
        b[:, [0, 2]] += left
        b[:, [1, 3]] += top
    return out, b


def min_iou_random_crop(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.RandomState,
    min_ious: Sequence[float] = (0.1, 0.3, 0.5, 0.7, 0.9),
    min_crop_size: float = 0.3,
    max_tries: int = 50,
):
    """SSD-style IoU-constrained random crop."""
    h, w = img.shape[:2]
    modes = (1, *min_ious, 0)
    while True:
        mode = modes[rng.randint(len(modes))]
        if mode == 1:
            return img, boxes, labels
        for _ in range(max_tries):
            nw = rng.uniform(min_crop_size * w, w)
            nh = rng.uniform(min_crop_size * h, h)
            if nh / nw < 0.5 or nh / nw > 2:
                continue
            left = rng.uniform(0, w - nw)
            top = rng.uniform(0, h - nh)
            patch = np.array([left, top, left + nw, top + nh])
            if len(boxes):
                lt = np.maximum(boxes[:, :2], patch[:2])
                rb = np.minimum(boxes[:, 2:], patch[2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[:, 0] * wh[:, 1]
                area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                ious = inter / np.maximum(area, 1e-6)
                if mode > 0 and ious.min() < mode:
                    continue
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = (
                    (centers[:, 0] > patch[0])
                    & (centers[:, 1] > patch[1])
                    & (centers[:, 0] < patch[2])
                    & (centers[:, 1] < patch[3])
                )
                if not keep.any():
                    continue
                nb = boxes[keep].copy()
                nb[:, :2] = np.maximum(nb[:, :2], patch[:2]) - patch[:2]
                nb[:, 2:] = np.minimum(nb[:, 2:], patch[2:]) - patch[:2]
                nl = labels[keep]
            else:
                nb, nl = boxes, labels
            x1, y1, x2, y2 = patch.astype(int)
            return img[y1:y2, x1:x2], nb, nl


def random_crop(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.RandomState,
    crop_size: Tuple[int, int],
):
    """Plain random crop keeping boxes whose center survives."""
    h, w = img.shape[:2]
    ch, cw = min(crop_size[0], h), min(crop_size[1], w)
    top = rng.randint(0, h - ch + 1)
    left = rng.randint(0, w - cw + 1)
    img = img[top : top + ch, left : left + cw]
    if len(boxes):
        b = boxes.copy()
        b[:, [0, 2]] -= left
        b[:, [1, 3]] -= top
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, cw)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, ch)
        keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        return img, b[keep], labels[keep]
    return img, boxes, labels


def large_scale_jitter(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    segs,
    rng: np.random.RandomState,
    canvas: Tuple[int, int],
    ratio_range: Tuple[float, float] = (0.1, 2.0),
):
    """LSJ (reference ``configs/common/lsj_100e_coco_instance.py``:
    ``Resize(img_scale=canvas, ratio_range, keep_ratio)`` +
    ``RandomCrop(canvas)``).  Polygon segmentations are scaled/shifted with
    the boxes so the box-relative mask rasterisation stays consistent; RLE
    (crowd) entries are dropped (cannot be cheaply re-framed).

    Returns ``(img, boxes, labels, segs)`` with the image no larger than
    ``canvas``.
    """
    import cv2

    h0, w0 = img.shape[:2]
    r = rng.uniform(*ratio_range)
    f = min(canvas[0] * r / max(h0, 1), canvas[1] * r / max(w0, 1))
    nh = max(int(h0 * f + 0.5), 1)
    nw = max(int(w0 * f + 0.5), 1)
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    boxes = boxes.astype(np.float32).copy()
    if len(boxes):
        boxes *= f
    if segs is not None:
        segs = [
            None if (s is None or isinstance(s, dict))
            else [np.asarray(p, np.float32) * f for p in s]
            for s in segs
        ]

    top = rng.randint(0, max(nh - canvas[0], 0) + 1)
    left = rng.randint(0, max(nw - canvas[1], 0) + 1)
    ch, cw = min(canvas[0], nh), min(canvas[1], nw)
    img = img[top:top + ch, left:left + cw]
    if len(boxes):
        b = boxes
        b[:, [0, 2]] -= left
        b[:, [1, 3]] -= top
        cx = (b[:, 0] + b[:, 2]) / 2
        cy = (b[:, 1] + b[:, 3]) / 2
        keep = (cx >= 0) & (cx < cw) & (cy >= 0) & (cy < ch)
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, cw)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, ch)
        boxes, labels = b[keep], labels[keep]
        if segs is not None:
            segs = [
                None if s is None
                else [p - np.tile([left, top], p.shape[0] // 2
                                  ).astype(np.float32) for p in s]
                for s, k in zip(segs, keep) if k
            ]
    return img, boxes, labels, segs


def cutout(
    img: np.ndarray,
    rng: np.random.RandomState,
    n_holes: Tuple[int, int] = (1, 3),
    cutout_ratio: Tuple[float, float] = (0.05, 0.2),
    fill: Sequence[float] = (0, 0, 0),
):
    h, w = img.shape[:2]
    img = img.copy()
    for _ in range(rng.randint(n_holes[0], n_holes[1] + 1)):
        rw = int(w * rng.uniform(*cutout_ratio))
        rh = int(h * rng.uniform(*cutout_ratio))
        x = rng.randint(0, max(w - rw, 1))
        y = rng.randint(0, max(h - rh, 1))
        img[y : y + rh, x : x + rw] = np.asarray(fill, img.dtype)
    return img


def mosaic(
    imgs: List[np.ndarray],
    boxes: List[np.ndarray],
    labels: List[np.ndarray],
    rng: np.random.RandomState,
    out_size: Tuple[int, int] = (640, 640),
    center_ratio: Tuple[float, float] = (0.5, 1.5),
    pad_val: int = 114,
):
    """4-image mosaic (reference ``transforms.py:1948``)."""
    assert len(imgs) == 4
    oh, ow = out_size
    canvas = np.full((oh * 2, ow * 2, 3), pad_val, np.uint8)
    cx = int(rng.uniform(*center_ratio) * ow)
    cy = int(rng.uniform(*center_ratio) * oh)
    out_boxes, out_labels = [], []
    placements = [
        (max(cx - 0, 0), max(cy - 0, 0), "tl"),
    ]
    corners = ["tl", "tr", "bl", "br"]
    for img, b, l, corner in zip(imgs, boxes, labels, corners):
        h, w = img.shape[:2]
        scale = min(2 * oh / h, 2 * ow / w, 1.0)
        nw, nh = int(w * scale), int(h * scale)
        if cv2 is not None and (nw, nh) != (w, h):
            img = cv2.resize(img, (nw, nh))
        if corner == "tl":
            x1, y1 = max(cx - nw, 0), max(cy - nh, 0)
            x2, y2 = cx, cy
        elif corner == "tr":
            x1, y1 = cx, max(cy - nh, 0)
            x2, y2 = min(cx + nw, 2 * ow), cy
        elif corner == "bl":
            x1, y1 = max(cx - nw, 0), cy
            x2, y2 = cx, min(cy + nh, 2 * oh)
        else:
            x1, y1 = cx, cy
            x2, y2 = min(cx + nw, 2 * ow), min(cy + nh, 2 * oh)
        pw, ph = x2 - x1, y2 - y1
        if pw <= 0 or ph <= 0:
            continue
        canvas[y1:y2, x1:x2] = img[:ph, :pw] if corner in ("br",) else img[
            nh - ph :, nw - pw :
        ] if corner == "tl" else img[nh - ph :, :pw] if corner == "bl" else img[
            :ph, nw - pw :
        ]
        if len(b):
            bb = b * scale
            if corner == "tl":
                off = (x2 - nw, y2 - nh)
            elif corner == "tr":
                off = (x1, y2 - nh)
            elif corner == "bl":
                off = (x2 - nw, y1)
            else:
                off = (x1, y1)
            bb = bb + np.array([off[0], off[1], off[0], off[1]])
            bb[:, [0, 2]] = bb[:, [0, 2]].clip(0, 2 * ow)
            bb[:, [1, 3]] = bb[:, [1, 3]].clip(0, 2 * oh)
            keep = (bb[:, 2] > bb[:, 0]) & (bb[:, 3] > bb[:, 1])
            out_boxes.append(bb[keep])
            out_labels.append(l[keep])
    ob = np.concatenate(out_boxes) if out_boxes else np.zeros((0, 4), np.float32)
    ol = np.concatenate(out_labels) if out_labels else np.zeros((0,), np.int64)
    return canvas, ob.astype(np.float32), ol


def mixup(
    img1, boxes1, labels1, img2, boxes2, labels2, rng, ratio: float = 0.5
):
    """Two-image mixup (reference ``transforms.py:2197`` simplified)."""
    h = max(img1.shape[0], img2.shape[0])
    w = max(img1.shape[1], img2.shape[1])
    out = np.zeros((h, w, 3), np.float32)
    out[: img1.shape[0], : img1.shape[1]] += img1.astype(np.float32) * ratio
    out[: img2.shape[0], : img2.shape[1]] += img2.astype(np.float32) * (1 - ratio)
    boxes = np.concatenate([boxes1, boxes2]).astype(np.float32)
    labels = np.concatenate([labels1, labels2])
    return out.clip(0, 255).astype(np.uint8), boxes, labels


# --- corruption benchmark transforms (reference tools/analysis_tools/
# test_robustness.py uses imagecorruptions; a self-contained subset) ---


def corrupt(img: np.ndarray, corruption: str, severity: int = 1,
            rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Apply a named corruption at severity 1..5 (subset of the benchmark:
    gaussian_noise, shot_noise, impulse_noise, defocus_blur, motion_blur,
    brightness, contrast, pixelate, jpeg_compression)."""
    rng = rng or np.random.RandomState(0)
    x = img.astype(np.float32) / 255.0
    s = severity
    if corruption == "gaussian_noise":
        c = [0.04, 0.06, 0.08, 0.09, 0.10][s - 1]
        x = x + rng.normal(size=x.shape) * c
    elif corruption == "shot_noise":
        c = [500, 250, 100, 75, 50][s - 1]
        x = rng.poisson(x * c) / c
    elif corruption == "impulse_noise":
        c = [0.01, 0.02, 0.03, 0.05, 0.07][s - 1]
        m = rng.rand(*x.shape[:2]) < c
        x[m] = rng.rand(int(m.sum()), 3)
    elif corruption == "defocus_blur" and cv2 is not None:
        c = [3, 4, 6, 8, 10][s - 1]
        x = cv2.blur(x, (c, c))
    elif corruption == "motion_blur" and cv2 is not None:
        c = [10, 15, 15, 15, 20][s - 1]
        k = np.zeros((c, c), np.float32)
        k[c // 2] = 1.0 / c
        x = cv2.filter2D(x, -1, k)
    elif corruption == "brightness":
        c = [0.1, 0.2, 0.3, 0.4, 0.5][s - 1]
        x = x + c
    elif corruption == "contrast":
        c = [0.4, 0.3, 0.2, 0.1, 0.05][s - 1]
        x = (x - x.mean()) * c + x.mean()
    elif corruption == "pixelate" and cv2 is not None:
        c = [0.6, 0.5, 0.4, 0.3, 0.25][s - 1]
        h, w = x.shape[:2]
        small = cv2.resize(x, (max(int(w * c), 1), max(int(h * c), 1)),
                           interpolation=cv2.INTER_AREA)
        x = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    elif corruption == "jpeg_compression" and cv2 is not None:
        c = [80, 65, 58, 50, 40][s - 1]
        ok, enc = cv2.imencode(".jpg", (x * 255).clip(0, 255).astype(np.uint8),
                               [int(cv2.IMWRITE_JPEG_QUALITY), c])
        x = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255.0
    return (x.clip(0, 1) * 255).astype(np.uint8)


CORRUPTIONS = (
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "motion_blur", "brightness", "contrast", "pixelate", "jpeg_compression",
)


def albu_transform(img, bboxes, labels, segs, transforms, rng,
                   min_visibility: float = 0.0):
    """Albu chain (reference ``pipelines/transforms.py:1321``): the
    third-party ``albumentations`` package is not vendored — the subset the
    reference config zoo requests is implemented natively in
    ``data/albu.py`` (unknown transform types raise there)."""
    from .albu import apply_albu

    return apply_albu(img, bboxes, labels, segs, transforms, rng,
                      min_visibility=min_visibility)


def instaboost_transform(img, bboxes, labels, segs, rng, **kwargs):
    """InstaBoost (reference ``pipelines/instaboost.py``): the
    ``instaboostfast`` package is not vendored — the matting-free variant
    the shipped configs run is implemented natively in
    ``data/instaboost.py``."""
    from .instaboost import instaboost

    return instaboost(img, bboxes, labels, segs, rng, **kwargs)
