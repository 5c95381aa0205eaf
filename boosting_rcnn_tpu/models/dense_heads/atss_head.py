"""ATSS head (spec: reference ``mmdet/models/dense_heads/atss_head.py``).

GN-normed cls/reg towers, 1 anchor per location (octave scale 8), ATSS
assignment (per-level top-k by center distance, mean+std IoU threshold),
GIoU box loss on decoded boxes weighted by centerness, BCE centerness
branch, score = sigmoid(cls) * sigmoid(centerness) at test.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import atss_assign
from ...ops.nms import multiclass_nms_padded
from ..layers import ConvModule, Scale


class ATSSConvs(nn.Module):
    num_classes: int = 80
    num_anchors: int = 1
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_tower = [
            ConvModule(self.feat_channels, 3, norm_cfg={"type": "GN", "num_groups": 32},
                       act="relu", dtype=self.dtype, name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            ConvModule(self.feat_channels, 3, norm_cfg={"type": "GN", "num_groups": 32},
                       act="relu", dtype=self.dtype, name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        conv_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595), dtype=self.dtype,
            name="atss_cls",
        )
        conv_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="atss_reg")
        conv_ctr = nn.Conv(self.num_anchors, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="atss_centerness")
        scales = [Scale(name=f"scale_{l}") for l in range(self.num_levels)]
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv in cls_tower:
                cf = conv(cf)
            for conv in reg_tower:
                rf = conv(rf)
            cls_out.append(conv_cls(cf))
            reg_out.append(scales[lvl](conv_reg(rf)).astype(jnp.float32))
            ctr_out.append(conv_ctr(rf))
        return cls_out, reg_out, ctr_out


@dataclasses.dataclass(frozen=True)
class ATSSCfg:
    num_classes: int = 80
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    topk: int = 9
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    loss_ctr_weight: float = 1.0


def _centerness_target(anchors, gts):
    """ATSS centerness: sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) of the
    anchor center w.r.t. its gt box (``atss_head.py`` ``centerness_target``)."""
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    l = acx - gts[:, 0]
    t = acy - gts[:, 1]
    r = gts[:, 2] - acx
    b = gts[:, 3] - acy
    lr_ratio = jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-6)
    tb_ratio = jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-6)
    return jnp.sqrt(jnp.clip(lr_ratio * tb_ratio, 0.0, 1.0))


def atss_loss(
    cfg: ATSSCfg,
    cls_logits: jnp.ndarray,  # (B, A, C)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    ctr_logits: jnp.ndarray,  # (B, A)
    anchors: jnp.ndarray,
    valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    axis_name: Optional[str] = None,
):
    b, a, c = cls_logits.shape

    def targets(v, gb, gl, gm):
        assign = atss_assign(
            anchors, v, tuple(num_level_anchors), gb, gm, gt_labels=gl,
            topk=cfg.topk,
        )
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0
        w = (pos | neg).astype(jnp.float32)
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        matched = box_ops.take_small_table(gb, safe)
        labels = jnp.where(pos, assign.labels, cfg.num_classes)
        return pos, w, matched, labels

    pos, w, matched_gt, labels = jax.vmap(targets)(valid, gt_bboxes, gt_labels, gt_mask)
    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.sum(posf)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_total = jnp.maximum(num_pos, 1.0)

    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    loss_cls = L.sigmoid_focal_loss(
        cls_logits.reshape(-1, c), onehot, weight=w.reshape(-1),
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_total,
    ) * cfg.loss_cls_weight

    anchors_b = jnp.broadcast_to(anchors, (b, a, 4)).reshape(-1, 4)
    decoded = box_ops.delta2bbox(
        anchors_b, bbox_preds.reshape(-1, 4), cfg.target_means, cfg.target_stds
    )
    gt_flat = matched_gt.reshape(-1, 4)
    safe_gt = jnp.where(posf[:, None] > 0, gt_flat, decoded)
    ctr_t = _centerness_target(anchors_b, safe_gt) * posf
    ctr_sum = jnp.sum(ctr_t)
    if axis_name is not None:
        ctr_sum = jax.lax.pmean(ctr_sum, axis_name)
    loss_bbox = L.giou_loss(
        decoded, safe_gt, weight=ctr_t, avg_factor=jnp.maximum(ctr_sum, 1e-6)
    ) * cfg.loss_bbox_weight
    loss_ctr = L.binary_cross_entropy_loss(
        ctr_logits.reshape(-1), ctr_t, weight=posf, avg_factor=num_total
    ) * cfg.loss_ctr_weight
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "loss_centerness": loss_ctr}


def atss_get_bboxes(
    cfg: ATSSCfg,
    cls_logits: jnp.ndarray,  # (A, C)
    bbox_preds: jnp.ndarray,
    ctr_logits: jnp.ndarray,  # (A,)
    anchors: jnp.ndarray,
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,
    rescale: bool,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_iou_thr: float = 0.6,
    max_per_img: int = 100,
    pre_nms_top_k: int = 2048,
):
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    ctr_all = jax.nn.sigmoid(ctr_logits.astype(jnp.float32))
    sel_scores, sel_boxes, sel_ctr = [], [], []
    start = 0
    for na in num_level_anchors:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, na)
        bp = jax.lax.dynamic_slice_in_dim(bbox_preds, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        ct = jax.lax.dynamic_slice_in_dim(ctr_all, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        # reference selects top-k by cls*centerness
        _, ti = jax.lax.top_k(jnp.max(s, axis=-1) * ct, k)
        boxes = box_ops.delta2bbox(
            an[ti], bp[ti], cfg.target_means, cfg.target_stds, max_shape=img_shape
        )
        sel_scores.append(s[ti])
        sel_boxes.append(boxes)
        sel_ctr.append(ct[ti])
        start += na
    scores = jnp.concatenate(sel_scores)
    boxes = jnp.concatenate(sel_boxes)
    ctr = jnp.concatenate(sel_ctr)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img, score_factors=ctr,
        pre_nms_top_k=pre_nms_top_k,
    )
