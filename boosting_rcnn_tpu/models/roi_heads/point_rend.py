"""PointRend (reference ``mmdet/models/detectors/point_rend.py`` +
``roi_heads/point_rend_roi_head.py`` + ``mask_heads/coarse_mask_head.py`` /
``mask_point_head.py``).

Mask R-CNN whose mask branch predicts a coarse low-res mask (FC head) and
refines it at adaptively selected points: a shared MLP consumes the
fine-grained FPN-P2 feature at each point concatenated with the coarse
per-class logit.  Training samples ``num_points`` per RoI (importance-
biased toward uncertain logits, oversample-then-topk — fixed sizes, so the
whole selection jits); inference runs ``subdivision_steps`` of 2x bilinear
upsampling, re-predicting the ``subdivision_num_points`` most uncertain
points each step (scatter at static indices).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.point_sample import point_sample, rel_roi_point_to_rel_img_point


class CoarseMaskHead(nn.Module):
    """Reference ``CoarseMaskHead``: downsample conv (k=s=downsample_factor)
    then FCs, reshaped to a (side, side, C) coarse logit map."""

    num_classes: int = 80
    conv_channels: int = 256
    num_convs: int = 0
    num_fcs: int = 2
    fc_channels: int = 1024
    roi_feat_size: int = 14
    downsample_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (R, S, S, C) pooled -> (R, S/d, S/d, num_classes) logits."""
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        if self.downsample_factor > 1:
            d = self.downsample_factor
            x = nn.Conv(self.conv_channels, (d, d), strides=(d, d),
                        padding="VALID", dtype=self.dtype,
                        name="downsample_conv")(x)
            x = nn.relu(x)
        side = self.roi_feat_size // self.downsample_factor
        r = x.shape[0]
        x = x.reshape(r, -1)
        for i in range(self.num_fcs):
            x = nn.Dense(self.fc_channels, dtype=self.dtype,
                         name=f"fc_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(side * side * self.num_classes, dtype=self.dtype,
                     name="fc_logits")(x)
        return x.reshape(r, side, side, self.num_classes).astype(jnp.float32)


class MaskPointHead(nn.Module):
    """Reference ``MaskPointHead``: shared per-point MLP over
    concat(fine-grained feature, coarse per-class logits), coarse logits
    re-appended at every layer."""

    num_classes: int = 80
    num_fcs: int = 3
    fc_channels: int = 256
    coarse_pred_each_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray):
        """fine: (P, Cf); coarse: (P, num_classes) -> (P, num_classes)."""
        x = jnp.concatenate([fine, coarse.astype(fine.dtype)], axis=-1)
        for i in range(self.num_fcs):
            x = nn.Dense(self.fc_channels, dtype=self.dtype,
                         name=f"fc_{i}")(x)
            x = nn.relu(x)
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse.astype(x.dtype)], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="fc_logits")(x).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class PointRendCfg:
    num_points: int = 196
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 5
    subdivision_num_points: int = 784
    scale_factor: int = 2


def point_uncertainty(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """-|logit at the target class| (reference ``_get_uncertainty``);
    logits (R, P, C), labels (R,) -> (R, P)."""
    c = logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    sel = jnp.take_along_axis(
        logits, safe[:, None, None].repeat(logits.shape[1], 1), axis=-1
    )[..., 0]
    return -jnp.abs(sel)


def get_train_points(
    cfg: PointRendCfg,
    rng: jax.Array,
    coarse_logits: jnp.ndarray,  # (R, S, S, C)
    labels: jnp.ndarray,  # (R,)
):
    """Importance-biased point sampling (reference
    ``get_roi_rel_points_train``): oversample uniform points, keep the
    top-uncertain fraction by the *sampled* logits, fill with fresh
    uniforms.  Returns (R, num_points, 2) roi-relative (x, y)."""
    r = coarse_logits.shape[0]
    n_sampled = int(cfg.num_points * cfg.oversample_ratio)
    n_unc = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = cfg.num_points - n_unc
    k1, k2 = jax.random.split(rng)
    cand = jax.random.uniform(k1, (r, n_sampled, 2))
    logits = jax.vmap(point_sample)(coarse_logits, cand)  # (R, ns, C)
    unc = point_uncertainty(logits, labels)  # (R, ns)
    _, idx = jax.lax.top_k(unc, n_unc)
    top = jnp.take_along_axis(cand, idx[..., None].repeat(2, -1), axis=1)
    if n_rand > 0:
        rnd = jax.random.uniform(k2, (r, n_rand, 2))
        return jnp.concatenate([top, rnd], axis=1)
    return top


def subdivision_refine(
    cfg: PointRendCfg,
    coarse_label_logits: jnp.ndarray,  # (R, S, S) gt/pred-class channel
    point_fn,  # (points (R, P, 2) roi-relative) -> (R, P) label-class logits
):
    """Inference subdivision (reference ``_mask_point_forward_test``):
    repeat: 2x bilinear upsample; re-predict the top-``subdivision_num_
    points`` most uncertain grid cells via the point head; scatter.

    Works on the selected class channel (the only one the paste consumes),
    keeping the refined map (R, S*2^steps, S*2^steps) instead of carrying
    all C channels dense."""
    logits = coarse_label_logits
    for _ in range(cfg.subdivision_steps):
        r, s_h, s_w = logits.shape
        logits = jax.image.resize(
            logits,
            (r, s_h * cfg.scale_factor, s_w * cfg.scale_factor),
            method="bilinear",  # F.interpolate(align_corners=False)
        )
        r, hh, wwd = logits.shape
        n_grid = hh * wwd
        k = min(cfg.subdivision_num_points, n_grid)
        flat = logits.reshape(r, n_grid)
        unc = -jnp.abs(flat)  # (R, n_grid)
        _, idx = jax.lax.top_k(unc, k)  # (R, k)
        gy = (idx // wwd).astype(jnp.float32)
        gx = (idx % wwd).astype(jnp.float32)
        pts = jnp.stack([(gx + 0.5) / wwd, (gy + 0.5) / hh], axis=-1)
        new_logits = point_fn(pts)  # (R, k)
        flat = jax.vmap(lambda fl, ix, nl: fl.at[ix].set(nl))(
            flat, idx, new_logits
        )
        logits = flat.reshape(r, hh, wwd)
    return logits


def sample_gt_mask_at_points(
    crop: jnp.ndarray,  # (S, S) box-relative gt mask crop
    gt_box: jnp.ndarray,  # (4,) the box the crop is relative to
    roi: jnp.ndarray,  # (4,)
    rel_pts: jnp.ndarray,  # (P, 2) roi-relative normalized (x, y)
) -> jnp.ndarray:
    """Ground-truth point targets: roi-relative points -> image coords ->
    gt-box-relative crop coords, bilinear-sampled; binarized at 0.5."""
    ix = roi[0] + rel_pts[:, 0] * (roi[2] - roi[0])
    iy = roi[1] + rel_pts[:, 1] * (roi[3] - roi[1])
    gw = jnp.maximum(gt_box[2] - gt_box[0], 1e-3)
    gh = jnp.maximum(gt_box[3] - gt_box[1], 1e-3)
    nx = (ix - gt_box[0]) / gw
    ny = (iy - gt_box[1]) / gh
    vals = point_sample(
        crop.astype(jnp.float32)[..., None], jnp.stack([nx, ny], -1)
    )[..., 0]
    return (vals >= 0.5).astype(jnp.float32)
