"""Instance mask utilities (host side).

Replaces the reference's ``BitmapMasks``/``PolygonMasks`` structures
(``mmdet/core/mask/structures.py``) with a TPU-friendly representation:
each gt instance carries a fixed-size binary crop rasterised **relative to
its own box** (the TF-TPU Mask R-CNN trick).  Box-relative crops are
scale-invariant, so resize needs no re-rasterisation and flips are a
left-right mirror — and the on-device mask target becomes a pure bilinear
resample (no dynamic shapes).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

MASK_CROP_SIZE = 112


def polygons_to_box_crop(
    polygons: Sequence[np.ndarray],
    box: np.ndarray,  # (4,) xyxy in the same coords as the polygons
    size: int = MASK_CROP_SIZE,
) -> np.ndarray:
    """Rasterise instance polygons into a (size, size) crop of ``box``."""
    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    out = np.zeros((size, size), np.uint8)
    pts = []
    for poly in polygons:
        p = np.asarray(poly, np.float64).reshape(-1, 2).copy()
        p[:, 0] = (p[:, 0] - x1) / w * size
        p[:, 1] = (p[:, 1] - y1) / h * size
        pts.append(np.round(p).astype(np.int32))
    if pts and cv2 is not None:
        cv2.fillPoly(out, pts, 1)
    return out


def rle_to_box_crop(rle, box, img_h, img_w, size: int = MASK_CROP_SIZE):
    """COCO uncompressed RLE -> box crop (rare; crowd anns are ignore-only)."""
    if isinstance(rle, dict) and isinstance(rle.get("counts"), list):
        counts = rle["counts"]
        h, w = rle["size"]
        flat = np.zeros(h * w, np.uint8)
        pos, val = 0, 0
        for c in counts:
            flat[pos : pos + c] = val
            pos += c
            val = 1 - val
        full = flat.reshape(w, h).T
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        x2, y2 = max(x2, x1 + 1), max(y2, y1 + 1)
        crop = full[y1:y2, x1:x2]
        if cv2 is not None and crop.size:
            return cv2.resize(crop, (size, size), interpolation=cv2.INTER_NEAREST)
    return np.zeros((size, size), np.uint8)


def paste_mask(
    mask28: np.ndarray,  # (m, m) float prob
    box: np.ndarray,  # (4,) xyxy in output image coords
    img_h: int,
    img_w: int,
    thr: float = 0.5,
) -> np.ndarray:
    """Paste a predicted RoI mask into the full image (reference
    ``FCNMaskHead.get_seg_masks`` behaviour, host side)."""
    x1, y1, x2, y2 = box
    x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
    x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
    x1i, y1i = max(x1i, 0), max(y1i, 0)
    x2i, y2i = min(max(x2i, x1i + 1), img_w), min(max(y2i, y1i + 1), img_h)
    out = np.zeros((img_h, img_w), np.uint8)
    if x2i <= x1i or y2i <= y1i or cv2 is None:
        return out
    resized = cv2.resize(
        mask28.astype(np.float32), (x2i - x1i, y2i - y1i),
        interpolation=cv2.INTER_LINEAR,
    )
    out[y1i:y2i, x1i:x2i] = (resized > thr).astype(np.uint8)
    return out


def polygons_to_bitmap(segmentation, h: int, w: int) -> np.ndarray:
    """COCO segmentation (polygon list or uncompressed RLE) -> (h, w) uint8."""
    out = np.zeros((h, w), np.uint8)
    if segmentation is None or cv2 is None:
        return out
    if isinstance(segmentation, dict):
        counts = segmentation.get("counts")
        if isinstance(counts, list):
            sh, sw = segmentation["size"]
            flat = np.zeros(sh * sw, np.uint8)
            pos, val = 0, 0
            for c in counts:
                flat[pos : pos + c] = val
                pos += c
                val = 1 - val
            return flat.reshape(sw, sh).T[:h, :w]
        return out
    pts = [
        np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
        for p in segmentation
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(out, pts, 1)
    return out


def crop_mask_iou(
    boxes1: np.ndarray,  # (N, 4)
    crops1: List[np.ndarray],  # N box-relative prob/binary crops
    boxes2: np.ndarray,  # (M, 4)
    bitmaps2: List[np.ndarray],  # M full-image bitmaps
    iscrowd: np.ndarray,  # (M,)
    img_h: int,
    img_w: int,
    thr: float = 0.5,
) -> np.ndarray:
    """(N, M) mask IoU with det masks given as box crops and gts as full
    bitmaps; pastes each det once then compares."""
    n, m = len(boxes1), len(bitmaps2)
    if n == 0 or m == 0:
        return np.zeros((n, m))
    det_full = [
        # full-image det masks (SOLO native output) pass straight through;
        # box-relative crops (R-CNN families) get pasted
        crops1[i]
        if crops1[i].shape == (img_h, img_w)
        else paste_mask(crops1[i], boxes1[i], img_h, img_w, thr)
        for i in range(n)
    ]
    a1 = np.array([d.sum() for d in det_full], np.float64)
    a2 = np.array([g.sum() for g in bitmaps2], np.float64)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            inter = np.logical_and(det_full[i], bitmaps2[j]).sum()
            union = a1[i] if iscrowd[j] else a1[i] + a2[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def full_masks_to_bitmaps(
    masks: np.ndarray,  # (K, oh, ow) prob/binary at 1/stride padded canvas
    img_shape,  # (nh, nw) valid (unpadded) region in canvas coords
    ori_shape,  # (H0, W0) original image size
    stride: int = 4,
    thr: float = 0.5,
) -> List[np.ndarray]:
    """SOLO eval adapter: native 1/stride-canvas masks -> original-image
    binary bitmaps (reference ``solo_head.py:854`` ``get_results``:
    interpolate to the padded canvas, crop to ``img_shape``, interpolate to
    ``ori_shape``, threshold)."""
    import cv2

    nh = int(round(float(img_shape[0])))
    nw = int(round(float(img_shape[1])))
    h0, w0 = int(ori_shape[0]), int(ori_shape[1])
    out = []
    for m in np.asarray(masks, np.float32):
        full = cv2.resize(
            m, (m.shape[1] * stride, m.shape[0] * stride),
            interpolation=cv2.INTER_LINEAR,
        )
        crop = full[:nh, :nw]
        r = cv2.resize(crop, (w0, h0), interpolation=cv2.INTER_LINEAR)
        out.append((r > thr).astype(np.uint8))
    return out


def mask_iou_matrix(masks1: List[np.ndarray], masks2: List[np.ndarray]) -> np.ndarray:
    """(N, M) IoU between binary bitmap lists."""
    n, m = len(masks1), len(masks2)
    out = np.zeros((n, m))
    a1 = [m_.sum() for m_ in masks1]
    a2 = [m_.sum() for m_ in masks2]
    for i in range(n):
        for j in range(m):
            inter = np.logical_and(masks1[i], masks2[j]).sum()
            union = a1[i] + a2[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out
