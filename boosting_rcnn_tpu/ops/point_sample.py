"""Point sampling ops (PointRend).

TPU-native equivalents of mmcv ``point_sample`` /
``rel_roi_point_to_rel_img_point`` (reference call sites
``mmdet/models/roi_heads/mask_heads/mask_point_head.py:7`` and
``point_rend_roi_head.py``).  mmcv's point_sample wraps
``F.grid_sample(align_corners=False)``: a normalized coordinate p in
[0, 1] maps to pixel coordinate ``p * size - 0.5``; sampling is bilinear
with edge clamping.  Pure gathers — differentiable, fuses under XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (H, W, C) at ``points`` (P, 2) normalized (x, y) in
    [0, 1]; returns (P, C).  align_corners=False grid_sample semantics with
    border padding."""
    h, w = feat.shape[0], feat.shape[1]
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    def g(yy, xx):
        yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return feat[yi, xi]

    return (
        g(y0, x0) * ((1 - wy1) * (1 - wx1))[:, None]
        + g(y0, x0 + 1) * ((1 - wy1) * wx1)[:, None]
        + g(y0 + 1, x0) * (wy1 * (1 - wx1))[:, None]
        + g(y0 + 1, x0 + 1) * (wy1 * wx1)[:, None]
    )


def rel_roi_point_to_rel_img_point(
    roi: jnp.ndarray,  # (4,) xyxy in image coords
    rel_points: jnp.ndarray,  # (P, 2) normalized (x, y) within the roi
    img_hw,  # (2,) or tuple (H, W) of the feature's image-space extent
) -> jnp.ndarray:
    """RoI-relative normalized points -> image-relative normalized points
    (mmcv ``rel_roi_point_to_rel_img_point``)."""
    x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
    ax = x1 + rel_points[:, 0] * (x2 - x1)
    ay = y1 + rel_points[:, 1] * (y2 - y1)
    hh = jnp.asarray(img_hw[0], ax.dtype)
    ww = jnp.asarray(img_hw[1], ax.dtype)
    return jnp.stack([ax / ww, ay / hh], axis=-1)
