"""Additional box coders (reference ``mmdet/core/bbox/coder/``).

DeltaXYWH lives in ``box_ops`` (the hot path); here: TBLR (FSAF),
distance (FCOS/GFL), and the YOLO cell coder.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

__all__ = [
    "tblr2bboxes",
    "bboxes2tblr",
    "distance2bbox",
    "bbox2distance",
    "yolo_decode",
    "yolo_encode",
]


def bboxes2tblr(priors, gts, normalizer=4.0, normalize_by_wh=True):
    """Encode gt boxes as (top, bottom, left, right) distances from prior
    centers (reference ``tblr_bbox_coder.py``)."""
    px = (priors[..., 0] + priors[..., 2]) * 0.5
    py = (priors[..., 1] + priors[..., 3]) * 0.5
    t = py - gts[..., 1]
    b = gts[..., 3] - py
    l = px - gts[..., 0]
    r = gts[..., 2] - px
    out = jnp.stack([t, b, l, r], axis=-1)
    if normalize_by_wh:
        w = (priors[..., 2] - priors[..., 0])[..., None]
        h = (priors[..., 3] - priors[..., 1])[..., None]
        wh = jnp.concatenate([h.repeat(2, -1), w.repeat(2, -1)], axis=-1)
        out = out / jnp.maximum(wh, 1e-6)
    return out / normalizer


def tblr2bboxes(priors, tblr, normalizer=4.0, normalize_by_wh=True, max_shape=None):
    tblr = tblr * normalizer
    if normalize_by_wh:
        w = (priors[..., 2] - priors[..., 0])[..., None]
        h = (priors[..., 3] - priors[..., 1])[..., None]
        wh = jnp.concatenate([h.repeat(2, -1), w.repeat(2, -1)], axis=-1)
        tblr = tblr * wh
    px = (priors[..., 0] + priors[..., 2]) * 0.5
    py = (priors[..., 1] + priors[..., 3]) * 0.5
    t, b, l, r = tblr[..., 0], tblr[..., 1], tblr[..., 2], tblr[..., 3]
    boxes = jnp.stack([px - l, py - t, px + r, py + b], axis=-1)
    if max_shape is not None:
        from .box_ops import clip_boxes

        boxes = clip_boxes(boxes, max_shape)
    return boxes


def distance2bbox(points, distance, max_shape=None):
    """(cx, cy) points + (l, t, r, b) distances -> xyxy (reference
    ``core/bbox/transforms.py`` ``distance2bbox``)."""
    boxes = jnp.stack(
        [
            points[..., 0] - distance[..., 0],
            points[..., 1] - distance[..., 1],
            points[..., 0] + distance[..., 2],
            points[..., 1] + distance[..., 3],
        ],
        axis=-1,
    )
    if max_shape is not None:
        from .box_ops import clip_boxes

        boxes = clip_boxes(boxes, max_shape)
    return boxes


def bbox2distance(points, bbox, max_dis: Optional[float] = None, eps: float = 0.1):
    l = points[..., 0] - bbox[..., 0]
    t = points[..., 1] - bbox[..., 1]
    r = bbox[..., 2] - points[..., 0]
    b = bbox[..., 3] - points[..., 1]
    out = jnp.stack([l, t, r, b], axis=-1)
    if max_dis is not None:
        out = jnp.clip(out, 0, max_dis - eps)
    return out


def yolo_decode(anchors, pred, stride):
    """YOLO cell coder (reference ``yolo_bbox_coder.py``): xy via sigmoid
    offsets inside the cell, wh via exp against the anchor."""
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    import jax

    cx = ax + (jax.nn.sigmoid(pred[..., 0]) - 0.5) * stride
    cy = ay + (jax.nn.sigmoid(pred[..., 1]) - 0.5) * stride
    w = aw * jnp.exp(pred[..., 2])
    h = ah * jnp.exp(pred[..., 3])
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def yolo_encode(anchors, gts, stride, eps=1e-6):
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    gx = (gts[..., 0] + gts[..., 2]) * 0.5
    gy = (gts[..., 1] + gts[..., 3]) * 0.5
    gw = gts[..., 2] - gts[..., 0]
    gh = gts[..., 3] - gts[..., 1]
    tx = jnp.clip((gx - ax) / stride + 0.5, eps, 1 - eps)
    ty = jnp.clip((gy - ay) / stride + 0.5, eps, 1 - eps)
    tw = jnp.log(jnp.maximum(gw, eps) / jnp.maximum(aw, eps))
    th = jnp.log(jnp.maximum(gh, eps) / jnp.maximum(ah, eps))
    # xy targets are pre-sigmoid probabilities: invert
    tx = jnp.log(tx / (1 - tx))
    ty = jnp.log(ty / (1 - ty))
    return jnp.stack([tx, ty, tw, th], axis=-1)
