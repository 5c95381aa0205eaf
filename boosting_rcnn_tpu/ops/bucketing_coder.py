"""Bucketing bbox coder for SABL (reference
``mmdet/core/bbox/coder/bucketing_bbox_coder.py``: side-aware boundary
localization).

Each box side is localized in two steps: classify which of
``ceil(num_buckets/2)`` bucket centerlines (inside the ``scale_factor``-
rescaled proposal) is nearest to the GT edge, then regress a fine offset
from that bucket in bucket-width units.  All targets/decodes are pure
fixed-shape array math (topk + one_hot replace the reference's python
loops over k).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["bbox2bucket", "bucket2bbox", "bbox_rescale"]


def bbox_rescale(boxes: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = (boxes[..., 2] - boxes[..., 0]) * scale_factor
    h = (boxes[..., 3] - boxes[..., 1]) * scale_factor
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def _buckets(proposals, num_buckets, scale_factor):
    p = bbox_rescale(proposals, scale_factor)
    side = (num_buckets + 1) // 2
    bw = (p[:, 2] - p[:, 0]) / num_buckets
    bh = (p[:, 3] - p[:, 1]) / num_buckets
    steps = 0.5 + jnp.arange(side, dtype=proposals.dtype)
    l = p[:, 0:1] + steps[None] * bw[:, None]
    r = p[:, 2:3] - steps[None] * bw[:, None]
    t = p[:, 1:2] + steps[None] * bh[:, None]
    d = p[:, 3:4] - steps[None] * bh[:, None]
    return bw, bh, l, r, t, d


def bbox2bucket(
    proposals: jnp.ndarray,  # (N, 4)
    gt: jnp.ndarray,  # (N, 4)
    num_buckets: int,
    scale_factor: float,
    offset_topk: int = 2,
    offset_upperbound: float = 1.0,
    cls_ignore_neighbor: bool = True,
):
    """-> (offsets (N, 4*side), offset_weights, bucket_labels (one-hot),
    cls_weights); exact ``bbox2bucket:146`` semantics."""
    bw, bh, lb, rb, tb, db = _buckets(proposals, num_buckets, scale_factor)
    side = lb.shape[1]

    offs = [
        (lb - gt[:, 0:1]) / bw[:, None],
        (rb - gt[:, 2:3]) / bw[:, None],
        (tb - gt[:, 1:2]) / bh[:, None],
        (db - gt[:, 3:4]) / bh[:, None],
    ]

    def weights_and_label(o):
        topv, topi = jax.lax.top_k(-jnp.abs(o), offset_topk)
        topv = -topv
        w = jnp.zeros_like(o)
        for k in range(offset_topk):
            val = (jnp.float32(1.0) if k == 0
                   else (topv[:, k] < offset_upperbound).astype(o.dtype))
            w = w + jax.nn.one_hot(topi[:, k], side, dtype=o.dtype) * (
                val if k == 0 else val[:, None])
        label = jax.nn.one_hot(topi[:, 0], side, dtype=o.dtype)
        return w, label

    ws, labels = zip(*[weights_and_label(o) for o in offs])
    offsets = jnp.concatenate(offs, axis=-1)
    offset_weights = jnp.concatenate(ws, axis=-1)
    bucket_labels = jnp.concatenate(labels, axis=-1)
    cls_w = jnp.concatenate(
        [(jnp.abs(o) < 1).astype(o.dtype) for o in offs], axis=-1)
    if cls_ignore_neighbor:
        cls_w = (~((cls_w == 1) & (bucket_labels == 0))).astype(offsets.dtype)
    else:
        cls_w = jnp.ones_like(cls_w)
    return offsets, offset_weights, bucket_labels, cls_w


def bucket2bbox(
    proposals: jnp.ndarray,  # (N, 4)
    cls_preds: jnp.ndarray,  # (N, 4*side)
    offset_preds: jnp.ndarray,  # (N, 4*side)
    num_buckets: int,
    scale_factor: float = 1.0,
    max_shape: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (boxes (N, 4), loc_confidence (N,)); ``bucket2bbox:268``."""
    n = proposals.shape[0]
    side = (num_buckets + 1) // 2
    scores = jax.nn.softmax(
        cls_preds.reshape(n, 4, side).astype(jnp.float32), axis=-1)
    top2, lab2 = jax.lax.top_k(scores, 2)  # (N, 4, 2)
    best = lab2[..., 0]  # (N, 4)

    bw, bh, *_ = _buckets(proposals, num_buckets, scale_factor)
    p = bbox_rescale(proposals, scale_factor)
    steps = 0.5 + best.astype(proposals.dtype)
    l_b = p[:, 0] + steps[:, 0] * bw
    r_b = p[:, 2] - steps[:, 1] * bw
    t_b = p[:, 1] + steps[:, 2] * bh
    d_b = p[:, 3] - steps[:, 3] * bh

    offs = offset_preds.reshape(n, 4, side)
    sel = jnp.take_along_axis(offs, best[..., None], axis=-1)[..., 0]
    x1 = l_b - sel[:, 0] * bw
    x2 = r_b - sel[:, 1] * bw
    y1 = t_b - sel[:, 2] * bh
    y2 = d_b - sel[:, 3] * bh
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    # bucketing-guided rescoring: add runner-up prob if it's a neighbor
    conf = top2[..., 0] + top2[..., 1] * (
        jnp.abs(lab2[..., 0] - lab2[..., 1]) == 1)
    return boxes, conf.mean(axis=-1)
