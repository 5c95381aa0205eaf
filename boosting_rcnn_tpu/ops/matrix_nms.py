"""Matrix NMS for masks (SOLO family).

Reference ``mmdet/core/post_processing/matrix_nms.py``: soft suppression —
each mask's score is decayed by the worst same-class higher-ranked overlap
(gaussian or linear kernel), compensated by how suppressed the suppressor
itself is.  TPU-native: fixed-size padded inputs with a validity mask; the
pairwise mask-intersection matrix is one ``(N, HW) x (HW, N)`` MXU matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def mask_matrix_nms(
    masks: jnp.ndarray,  # (N, H, W) binary (float or bool)
    labels: jnp.ndarray,  # (N,)
    scores: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    kernel: str = "gaussian",
    sigma: float = 2.0,
    filter_thr: float = -1.0,
    max_num: int = -1,
):
    """Returns (scores, labels, masks, valid, order) with decayed scores,
    sorted descending; ``max_num > 0`` truncates to that many rows."""
    n = masks.shape[0]
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    scores = scores[order]
    labels = labels[order]
    masks = masks[order].astype(jnp.float32)
    valid = valid[order]

    flat = masks.reshape(n, -1)
    area = jnp.sum(flat, axis=1)
    inter = jnp.dot(flat, flat.T, preferred_element_type=jnp.float32)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)
    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    same = (labels[:, None] == labels[None, :]) & triu
    same = same & valid[:, None] & valid[None, :]
    iou_m = jnp.where(same, iou, 0.0)

    # max IoU that ever suppressed each suppressor (column max over rows)
    compensate = jnp.max(iou_m, axis=0)  # (N,)
    if kernel == "gaussian":
        decay = jnp.exp(-sigma * iou_m**2) / jnp.exp(
            -sigma * compensate[:, None] ** 2
        )
    elif kernel == "linear":
        decay = (1.0 - iou_m) / jnp.maximum(1.0 - compensate[:, None], 1e-6)
    else:
        raise ValueError(kernel)
    # only same-class higher-ranked pairs participate in the min
    decay = jnp.where(same, decay, 1.0)
    coeff = jnp.min(decay, axis=0)
    scores = jnp.where(valid, scores * coeff, NEG_INF)
    if filter_thr > 0:
        valid = valid & (scores >= filter_thr)
        scores = jnp.where(valid, scores, NEG_INF)
    # re-sort by decayed score
    order2 = jnp.argsort(-scores)
    out = (
        scores[order2],
        labels[order2],
        masks[order2],
        valid[order2],
        order[order2],
    )
    if max_num > 0 and max_num < n:
        out = tuple(x[:max_num] for x in out)
    return out
