"""YOLOX decoupled head + SimOTA assignment.

Spec: reference ``mmdet/models/dense_heads/yolox_head.py`` (per-level
decoupled cls/reg branches sharing a 1x1 reduce, point priors at strides
8/16/32, decode cxcywh = ((offset + grid) * stride, exp(wh) * stride),
IoU-aware cls targets ``onehot * matched_iou``, BCE obj on every prior,
squared-IoU box loss, all sums divided by the global positive count) and
``mmdet/core/bbox/assigners/sim_ota_assigner.py`` (candidates = priors
inside the gt box or its 2.5-stride center region; cost = BCE(sqrt(cls*obj),
onehot) + 3*(-log iou) + INF outside box-and-center; dynamic k per gt =
clamp(int(sum top-10 ious), 1); conflicts resolved by min cost).

TPU form: the whole assignment is a fixed-shape (N, G) tensor program — the
per-gt dynamic-k pick is a top-k over the cost column plus a rank < k mask,
and the reference's boolean-index compaction steps become masks.  One
deviation: priors with INF cost (outside box-and-center) are never matched,
whereas the reference can match them when dynamic-k exceeds the number of
finite candidates for a gt (it top-k's the padded column).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.box_ops import bbox_overlaps
from ...ops.nms import multiclass_nms_padded
from ..backbones.csp_darknet import CBS

INF_COST = 1e8


class YOLOXHeadConvs(nn.Module):
    """Per-level decoupled branches (reference builds one conv stack per
    level; no weight sharing across levels)."""

    num_classes: int = 80
    feat_channels: int = 128
    stacked_convs: int = 2
    num_levels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cls_out, reg_out, obj_out = [], [], []
        for lvl, x in enumerate(feats):
            # separate stacked towers straight off the neck features
            # (reference builds independent cls/reg conv stacks per level)
            c, r = x, x
            for i in range(self.stacked_convs):
                c = CBS(self.feat_channels, 3, dtype=self.dtype,
                        name=f"l{lvl}_cls{i}")(c)
                r = CBS(self.feat_channels, 3, dtype=self.dtype,
                        name=f"l{lvl}_reg{i}")(r)
            cls_out.append(
                nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        bias_init=nn.initializers.constant(-4.595),
                        name=f"l{lvl}_cls_pred")(c).astype(jnp.float32)
            )
            reg_out.append(
                nn.Conv(4, (1, 1), dtype=self.dtype,
                        name=f"l{lvl}_reg_pred")(r).astype(jnp.float32)
            )
            obj_out.append(
                nn.Conv(1, (1, 1), dtype=self.dtype,
                        bias_init=nn.initializers.constant(-4.595),
                        name=f"l{lvl}_obj_pred")(r).astype(jnp.float32)
            )
        return cls_out, reg_out, obj_out


@dataclasses.dataclass(frozen=True)
class YOLOXCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32)
    center_radius: float = 2.5
    candidate_topk: int = 10
    cls_cost_weight: float = 1.0
    iou_cost_weight: float = 3.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_obj_weight: float = 1.0


def yolox_points(featmap_sizes, strides):
    """Flat (N, 4) priors: (x, y, stride, stride) with offset 0 (grid
    corners; assignment adds the half-stride center offset)."""
    pts = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys, xs = np.mgrid[:h, :w].astype(np.float32) * s
        pts.append(
            np.stack([xs.ravel(), ys.ravel(),
                      np.full(h * w, s, np.float32),
                      np.full(h * w, s, np.float32)], -1)
        )
    return np.concatenate(pts, 0)


def yolox_decode(priors, reg):
    """cxcywh decode: xy = pred * stride + grid, wh = exp(pred) * stride."""
    xy = reg[..., :2] * priors[..., 2:] + priors[..., :2]
    wh = jnp.exp(jnp.clip(reg[..., 2:], -20.0, 8.0)) * priors[..., 2:]
    return jnp.concatenate(
        [xy - wh / 2, xy + wh / 2], -1
    )


def sim_ota_assign(cfg, scores, priors, decoded, gt_bboxes, gt_labels,
                   gt_mask, eps=1e-7):
    """Fixed-shape SimOTA for one image.

    scores: (N, C) sigmoid(cls)*sigmoid(obj); priors (N, 4) grid-corner
    (x, y, s, s); decoded (N, 4) xyxy.  Returns (pos (N,), matched_gt (N,)
    int [0, G), matched_iou (N,)).
    """
    n = priors.shape[0]
    g = gt_bboxes.shape[0]
    cx = priors[:, 0] + 0.5 * priors[:, 2]
    cy = priors[:, 1] + 0.5 * priors[:, 3]

    in_gt = (
        (cx[:, None] > gt_bboxes[None, :, 0])
        & (cy[:, None] > gt_bboxes[None, :, 1])
        & (cx[:, None] < gt_bboxes[None, :, 2])
        & (cy[:, None] < gt_bboxes[None, :, 3])
    )
    gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    r = cfg.center_radius
    in_ct = (
        (cx[:, None] > gcx[None] - r * priors[:, 2:3])
        & (cy[:, None] > gcy[None] - r * priors[:, 3:4])
        & (cx[:, None] < gcx[None] + r * priors[:, 2:3])
        & (cy[:, None] < gcy[None] + r * priors[:, 3:4])
    )
    in_gt = in_gt & gt_mask[None, :]
    in_ct = in_ct & gt_mask[None, :]
    candidate = in_gt & in_ct  # (N, G)

    ious = bbox_overlaps(decoded, gt_bboxes)  # (N, G)
    iou_cost = -jnp.log(ious + eps)

    p = jnp.sqrt(jnp.clip(scores, 1e-12, 1.0))
    # sum-over-classes BCE(sqrt score, onehot(gt label)) without the
    # (N, G, C) intermediate: neg-sum plus the label column's pos/neg swap
    log_p = jnp.log(jnp.clip(p, 1e-12, 1.0))
    log_1p = jnp.log(jnp.clip(1 - p, 1e-12, 1.0))
    neg_sum = -jnp.sum(log_1p, -1)  # (N,)
    lbl = jnp.clip(gt_labels, 0, scores.shape[1] - 1)
    cls_cost = neg_sum[:, None] + (-log_p[:, lbl]) - (-log_1p[:, lbl])

    cost = (
        cfg.cls_cost_weight * cls_cost
        + cfg.iou_cost_weight * iou_cost
        + jnp.where(candidate, 0.0, INF_COST)
    )

    # dynamic k per gt from the top-10 candidate ious
    k_cand = min(cfg.candidate_topk, n)
    masked_ious = jnp.where(candidate | in_gt | in_ct, ious, 0.0)
    topk_ious = jax.lax.top_k(masked_ious.T, k_cand)[0]  # (G, k)
    dyn_k = jnp.clip(jnp.sum(topk_ious, -1).astype(jnp.int32), 1, k_cand)

    # top-k lowest-cost priors per gt column, keep only ranks < dyn_k and
    # finite-cost picks
    neg_cost, idx = jax.lax.top_k(-cost.T, k_cand)  # (G, k)
    ranks = jnp.arange(k_cand)[None, :]
    take = (ranks < dyn_k[:, None]) & (-neg_cost < INF_COST / 2) & gt_mask[:, None]
    matching = jnp.zeros((g, n), bool).at[
        jnp.arange(g)[:, None], idx
    ].max(take)  # (G, N)
    matching = matching.T  # (N, G)

    # a prior matched to several gts keeps the min-cost one
    any_match = jnp.any(matching, -1)
    best_g = jnp.argmin(jnp.where(matching, cost, jnp.inf), -1)
    matched_iou = jnp.where(
        any_match, jnp.take_along_axis(ious, best_g[:, None], 1)[:, 0], 0.0
    )
    return any_match, best_g.astype(jnp.int32), matched_iou


def yolox_loss(cfg, cls, reg, obj, priors, gt_bboxes, gt_labels, gt_mask,
               axis_name=None, use_l1: bool = False):
    """cls (B, N, C); reg (B, N, 4); obj (B, N); priors (N, 4).

    ``use_l1``: adds the raw-regression L1 term for the final
    mosaic/mixup-free epochs (reference ``yolox_head.py:111`` — the flag
    the YOLOXModeSwitchHook flips)."""
    decoded = yolox_decode(priors[None], reg)  # (B, N, 4)
    scores = jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)[..., None]

    pos, best_g, matched_iou = jax.vmap(
        lambda s, d, gb, gl, gm: sim_ota_assign(cfg, s, priors, d, gb, gl, gm)
    )(scores, decoded, gt_bboxes, gt_labels, gt_mask)

    num_pos = jnp.sum(pos.astype(jnp.float32))
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_total = jnp.maximum(num_pos, 1.0)

    tgt_boxes = jnp.take_along_axis(gt_bboxes, best_g[..., None], 1)
    tgt_labels = jnp.take_along_axis(gt_labels, best_g, 1)
    posf = pos.astype(jnp.float32)

    # obj: BCE on every prior, target = matched
    loss_obj = jnp.sum(
        L.binary_cross_entropy_loss(obj, posf, reduction="none")
    ) / num_total
    # cls: BCE vs iou-scaled onehot, positives only
    onehot = jax.nn.one_hot(tgt_labels, cfg.num_classes) * matched_iou[..., None]
    loss_cls = jnp.sum(
        L.binary_cross_entropy_loss(cls, onehot, reduction="none")
        * posf[..., None]
    ) / num_total
    # bbox: squared-IoU loss on positives
    from ...ops.box_ops import bbox_overlaps_aligned

    iou = bbox_overlaps_aligned(
        decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4)
    )
    loss_bbox = jnp.sum((1.0 - iou**2) * posf.reshape(-1)) / num_total
    out = {
        "loss_cls": loss_cls * cfg.loss_cls_weight,
        "loss_bbox": loss_bbox * cfg.loss_bbox_weight,
        "loss_obj": loss_obj * cfg.loss_obj_weight,
    }
    if use_l1:
        # reference _get_l1_target (yolox_head.py:471): center offset in
        # stride units + log wh, L1 on raw reg predictions, positives only
        gt_c = (tgt_boxes[..., :2] + tgt_boxes[..., 2:]) * 0.5
        gt_wh = tgt_boxes[..., 2:] - tgt_boxes[..., :2]
        l1_t = jnp.concatenate(
            [
                (gt_c - priors[None, :, :2]) / priors[None, :, 2:],
                jnp.log(gt_wh / priors[None, :, 2:] + 1e-8),
            ],
            axis=-1,
        )
        out["loss_l1"] = jnp.sum(
            jnp.abs(reg - l1_t) * posf[..., None]
        ) / num_total
    return out


def yolox_get_bboxes(cfg, cls, reg, obj, priors, img_shape, scale_factor,
                     rescale=True, score_thr=0.01, nms_iou_thr=0.65,
                     max_per_img=100):
    """Single image decode + class-wise NMS (reference ``_bboxes_nms``)."""
    decoded = yolox_decode(priors, reg)
    scores = jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)[..., None]
    from ...ops.box_ops import clip_boxes

    decoded = clip_boxes(decoded, img_shape)
    if rescale:
        decoded = decoded / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        decoded, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
