"""Native InstaBoost (reference ``datasets/pipelines/instaboost.py``, the
paper "InstaBoost: Boosting Instance Segmentation Via Probability Map
Guided Copy-Pasting").

The reference delegates to the third-party ``instaboostfast`` package,
absent in this environment.  This module implements the matting-free
variant the shipped configs actually run (every ``configs/instaboost``
file sets ``hflag=False`` — no heatmap-guided placement): each instance
is cut out via its mask, the hole is inpainted (cv2 TELEA), and the
instance is pasted back under a small random jitter affine

    translate ~ U(-w/dx, w/dx) x U(-h/dy, h/dy),
    scale ~ U(*scale), rotate ~ U(*theta) degrees,

with optional per-instance color jitter (``color_prob``) and optional
horizontal flip (the 'horizontal' action).  Boxes follow the warped mask
extent; polygon segmentations are transformed point-exactly.

Documented deviation: the pip package restores background from the COCO
appearance statistics it ships; cv2 inpainting is used here instead — the
geometric/paste semantics and all config knobs are honored.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from .mask_utils import polygons_to_bitmap


def _affine_about(cx, cy, angle_deg, scale, tx, ty):
    m = cv2.getRotationMatrix2D((float(cx), float(cy)), float(angle_deg),
                                float(scale))
    m[0, 2] += tx
    m[1, 2] += ty
    return m


def _color_jitter(patch, rng):
    alpha = rng.uniform(0.8, 1.2)
    beta = rng.uniform(-16, 16)
    return np.clip(patch.astype(np.float32) * alpha + beta, 0, 255).astype(
        patch.dtype)


def instaboost(
    img: np.ndarray,
    bboxes: np.ndarray,  # (N, 4) xyxy
    labels: np.ndarray,
    segs: Optional[list],  # per-instance polygons / RLE dict / None
    rng: np.random.RandomState,
    action_candidate: Sequence[str] = ("normal", "horizontal", "skip"),
    action_prob: Sequence[float] = (1, 0, 0),
    scale: Tuple[float, float] = (0.8, 1.2),
    dx: float = 15,
    dy: float = 15,
    theta: Tuple[float, float] = (-1, 1),
    color_prob: float = 0.5,
    hflag: bool = False,
    aug_ratio: float = 0.5,
):
    """Jitter-paste each instance with probability ``aug_ratio`` (whole-
    image gate, as the reference op).  Returns (img, bboxes, segs);
    labels are never reordered."""
    del hflag  # heatmap placement: all shipped configs disable it
    if cv2 is None or segs is None or not len(bboxes):
        return img, bboxes, segs
    if rng.rand() >= aug_ratio:
        return img, bboxes, segs
    h, w = img.shape[:2]
    out = img.copy()
    new_boxes = bboxes.astype(np.float32).copy()
    new_segs = list(segs)
    probs = np.asarray(action_prob, np.float64)
    probs = probs / max(probs.sum(), 1e-12)
    for i in range(len(bboxes)):
        seg = segs[i]
        if seg is None or isinstance(seg, dict):  # crowd RLE: leave as-is
            continue
        action = action_candidate[int(rng.choice(len(probs), p=probs))]
        if action == "skip":
            continue
        x1, y1, x2, y2 = bboxes[i]
        bw, bh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        mask = polygons_to_bitmap(seg, h, w).astype(np.uint8)
        if mask.sum() < 4:
            continue
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        tx = rng.uniform(-bw / dx, bw / dx)
        ty = rng.uniform(-bh / dy, bh / dy)
        sc = rng.uniform(*scale)
        ang = rng.uniform(*theta)
        m = _affine_about(cx, cy, ang, sc, tx, ty)
        flip = action in ("horizontal", "vertical")
        if flip:
            # reflect about the instance's own vertical/horizontal axis,
            # folded into the same affine: F = T(c) R T(-c)
            fx, fy = (-1.0, 1.0) if action == "horizontal" else (1.0, -1.0)
            f = np.array([[fx, 0, cx - fx * cx], [0, fy, cy - fy * cy]],
                         np.float64)
            m3 = np.vstack([m, [0, 0, 1]]) @ np.vstack([f, [0, 0, 1]])
            m = m3[:2]
        # cut: inpaint the hole left by the instance
        patch = out.copy()
        inpainted = cv2.inpaint(
            out, cv2.dilate(mask, np.ones((3, 3), np.uint8)),
            3, cv2.INPAINT_TELEA)
        # paste: warp the instance pixels + mask, composite over inpainting
        wmask = cv2.warpAffine(mask, m, (w, h), flags=cv2.INTER_NEAREST)
        wpatch = cv2.warpAffine(patch, m, (w, h), flags=cv2.INTER_LINEAR)
        if rng.rand() < color_prob:
            wpatch = _color_jitter(wpatch, rng)
        sel = wmask.astype(bool)
        if not sel.any():  # jittered fully out of frame: keep original
            continue
        out = np.where(sel[..., None], wpatch, inpainted)
        # polygons follow the affine exactly
        pts_m = m
        new_segs[i] = [
            (np.asarray(p, np.float64).reshape(-1, 2) @ pts_m[:, :2].T
             + pts_m[:, 2]).reshape(-1)
            for p in seg
        ]
        ys, xs = np.nonzero(wmask)
        new_boxes[i] = [max(xs.min(), 0), max(ys.min(), 0),
                        min(xs.max() + 1, w), min(ys.max() + 1, h)]
    return np.ascontiguousarray(out), new_boxes, new_segs
