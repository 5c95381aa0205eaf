"""Deformable RoI pooling (mmcv ``deform_roi_pool`` — the reference's
``DeformRoIPoolPack`` / ``ModulatedDeformRoIPoolPack`` RoI layers,
``configs/dcn/faster_rcnn_r50_fpn_dpool_1x_coco.py`` and the mdpool
variant).

Semantics (mmcv ``deform_roi_pool_cuda_kernel.cuh``): average-pooled
RoIAlign bins whose sample points are shifted by a learned per-bin offset,
scaled by the roi size and ``gamma=0.1``:

    y = roi_y1 + bin_h * (ph + (iy + .5) / n) + offset_y * roi_h * gamma

with align=False-style coordinates (no half-pixel shift on the roi, same
as mmcv's RoIAlign aligned=True convention used by the pack: rois are
scaled by ``spatial_scale`` directly).  Out-of-feature samples read zeros.

TPU form: all sample positions for all rois are computed as one fixed
(R, S, S, n, n, 2) tensor and gathered with one flat one-hot-free take;
the 4-tap bilinear mix is elementwise.  No scatter, no dynamic shapes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """feat (H, W, C); xs/ys (...,) feature-space coords -> (..., C).
    Zero padding outside [0, H/W-1] (mmcv: empty when y <= -1 or >= H)."""
    h, w, c = feat.shape
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    out = None
    flat = feat.reshape(h * w, c)
    for dy in (0.0, 1.0):
        for dx in (0.0, 1.0):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (1.0 - jnp.abs(xs - xi)) * (1.0 - jnp.abs(ys - yi))
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h) & inside
            idx = (jnp.clip(yi, 0, h - 1) * w
                   + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            v = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                idx.shape + (c,))
            term = v * (wgt * ok.astype(wgt.dtype))[..., None]
            out = term if out is None else out + term
    return out


def deform_roi_pool(
    feat: jnp.ndarray,  # (H, W, C) one level
    rois: jnp.ndarray,  # (R, 4) image-space xyxy
    offsets: Optional[jnp.ndarray],  # (R, S, S, 2) normalized or None
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    gamma: float = 0.1,
) -> jnp.ndarray:
    """-> (R, S, S, C) average-pooled deformable bins."""
    s = out_size
    n = max(sampling_ratio, 1)
    r = rois.shape[0]
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    roi_w = jnp.maximum(rois[:, 2] * spatial_scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * spatial_scale - y1, 1.0)
    bin_w = roi_w / s  # (R,)
    bin_h = roi_h / s

    ph = jnp.arange(s, dtype=jnp.float32)
    iy = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    # (R, S, n): y = y1 + bin_h * (ph + iy)
    ys = (y1[:, None, None]
          + bin_h[:, None, None] * (ph[None, :, None] + iy[None, None, :]))
    xs = (x1[:, None, None]
          + bin_w[:, None, None] * (ph[None, :, None] + iy[None, None, :]))
    # broadcast to (R, S, S, n, n)
    ys_full = jnp.broadcast_to(ys[:, :, None, :, None], (r, s, s, n, n))
    xs_full = jnp.broadcast_to(xs[:, None, :, None, :], (r, s, s, n, n))
    if offsets is not None:
        # offsets are (dx, dy) normalized; scaled by roi size * gamma
        dx = offsets[..., 0] * gamma * roi_w[:, None, None]
        dy = offsets[..., 1] * gamma * roi_h[:, None, None]
        xs_full = xs_full + dx[..., None, None]
        ys_full = ys_full + dy[..., None, None]
    sampled = _bilinear_gather(feat, xs_full, ys_full)  # (R,S,S,n,n,C)
    return sampled.mean(axis=(3, 4))


def multilevel_deform_roi_pool(
    feats,  # tuple of (H_l, W_l, C) maps
    rois: jnp.ndarray,  # (R, 4)
    roi_valid: jnp.ndarray,  # (R,)
    strides,  # per-level strides, e.g. (4, 8, 16, 32)
    offsets: Optional[jnp.ndarray] = None,
    out_size: int = 7,
    sampling_ratio: int = 2,
    gamma: float = 0.1,
    finest_scale: int = 56,
) -> jnp.ndarray:
    """FPN-routed deformable pooling: each roi is assigned one level by the
    SingleRoIExtractor rule (``floor(log2(sqrt(area) / finest_scale + 1e-6))``)
    and pooled from it.  Every level pools all rois; a route mask selects —
    R*S*S*n*n gathers per level, trivial at proposal counts."""
    areas = jnp.maximum(rois[:, 2] - rois[:, 0], 0.0) * jnp.maximum(
        rois[:, 3] - rois[:, 1], 0.0)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(areas) / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)
    out = None
    for li, (f, st) in enumerate(zip(feats, strides)):
        pooled = deform_roi_pool(
            f, rois, offsets, out_size=out_size,
            spatial_scale=1.0 / st, sampling_ratio=sampling_ratio,
            gamma=gamma,
        )
        sel = ((lvl == li) & roi_valid).astype(pooled.dtype)
        term = pooled * sel[:, None, None, None]
        out = term if out is None else out + term
    return out
