"""FCOS head (anchor-free single-stage).

Spec: reference ``mmdet/models/dense_heads/fcos_head.py``: per-level points,
distance (l, t, r, b) regression with per-level scale ranges, centerness
branch, GIoU/IoU loss on decoded boxes, focal cls loss; test score =
sigmoid(cls) * sigmoid(centerness).

TPU design: points for all levels live on one flat axis (like anchors);
per-point target assignment (inside-gt + scale-range + min-area tie-break)
is one fixed-shape computation vmapped over the batch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.nms import multiclass_nms_padded
from ..layers import ConvModule, Scale

INF = 1e8


class FCOSConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    # original FCOS: centerness branch on the cls tower; the improvements
    # recipe (``fcos_center-normbbox-centeronreg-giou`` configs) moves it
    # onto the reg tower (reference fcos_head.py ``centerness_on_reg``)
    centerness_on_reg: bool = False
    # normalize regression by stride: relu(scale*reg)*stride instead of
    # exp(scale*reg) (reference ``norm_on_bbox``; IoU losses are invariant
    # to the per-level uniform scaling, so losses match the reference's
    # stride-normalized formulation)
    norm_on_bbox: bool = False
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
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
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                           bias_init=nn.initializers.constant(-4.595),
                           dtype=self.dtype, name="fcos_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="fcos_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="fcos_centerness")
        scales = [Scale(name=f"scale_{l}") for l in range(self.num_levels)]
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for c in cls_tower:
                cf = c(cf)
            for c in reg_tower:
                rf = c(rf)
            cls_out.append(conv_cls(cf))
            raw = scales[lvl](conv_reg(rf)).astype(jnp.float32)
            if self.norm_on_bbox:
                # positive distances via relu, in stride units
                reg_out.append(nn.relu(raw) * float(self.strides[lvl]))
            else:
                # distances must be positive: exp(scale * reg)
                reg_out.append(jnp.exp(raw))
            ctr_out.append(conv_ctr(rf if self.centerness_on_reg else cf))
        return cls_out, reg_out, ctr_out


@dataclasses.dataclass(frozen=True)
class FCOSCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF)
    )
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    loss_ctr_weight: float = 1.0
    loss_bbox_type: str = "iou"  # 'iou' | 'giou' (the improvements recipe)


def fcos_points(featmap_sizes, strides):
    """Flat (P, 2) point centers + per-point stride + regress-range arrays
    (host-side constants)."""
    pts, strs, lo, hi = [], [], [], []
    return_ranges = FCOSCfg().regress_ranges
    for (h, w), s, rr in zip(featmap_sizes, strides, return_ranges):
        ys, xs = np.mgrid[0:h, 0:w]
        p = np.stack([(xs + 0.5) * s, (ys + 0.5) * s], -1).reshape(-1, 2)
        pts.append(p)
        strs.append(np.full(len(p), s, np.float32))
        lo.append(np.full(len(p), rr[0], np.float32))
        hi.append(np.full(len(p), rr[1], np.float32))
    return (
        np.concatenate(pts).astype(np.float32),
        np.concatenate(strs),
        np.concatenate(lo),
        np.concatenate(hi),
    )


def fcos_targets(
    cfg: FCOSCfg,
    points: jnp.ndarray,  # (P, 2)
    ranges_lo: jnp.ndarray,
    ranges_hi: jnp.ndarray,
    strides: jnp.ndarray,
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
):
    """Per-image targets: (labels (P,), ltrb targets (P, 4), pos mask)."""
    p = points.shape[0]
    g = gt_bboxes.shape[0]
    xs, ys = points[:, 0:1], points[:, 1:2]
    l = xs - gt_bboxes[None, :, 0]  # (P, G)... broadcasting
    l = xs - gt_bboxes[:, 0][None, :]
    t = ys - gt_bboxes[:, 1][None, :]
    r = gt_bboxes[:, 2][None, :] - xs
    b = gt_bboxes[:, 3][None, :] - ys
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # (P, G, 4)
    inside = jnp.min(ltrb, axis=-1) > 0
    if cfg.center_sampling:
        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
        radius = strides[:, None] * cfg.center_sample_radius
        inside_c = (
            (jnp.abs(xs - cx[None, :]) < radius)
            & (jnp.abs(ys - cy[None, :]) < radius)
        )
        inside = inside & inside_c
    max_d = jnp.max(ltrb, axis=-1)  # (P, G)
    in_range = (max_d >= ranges_lo[:, None]) & (max_d <= ranges_hi[:, None])
    areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * (gt_bboxes[:, 3] - gt_bboxes[:, 1])
    cand = inside & in_range & gt_mask[None, :]
    area_mat = jnp.where(cand, areas[None, :], INF)
    best_gt = jnp.argmin(area_mat, axis=1)  # min-area tie-break
    has = jnp.any(cand, axis=1)
    labels = jnp.where(has, gt_labels[best_gt], cfg.num_classes).astype(jnp.int32)
    tgt = jnp.take_along_axis(ltrb, best_gt[:, None, None].repeat(4, -1), axis=1)[:, 0]
    tgt = jnp.where(has[:, None], tgt, 0.0)
    return labels, tgt, has


def _centerness(ltrb):
    l, t, r, b = ltrb[..., 0], ltrb[..., 1], ltrb[..., 2], ltrb[..., 3]
    lr = jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-6)
    tb = jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-6)
    return jnp.sqrt(jnp.clip(lr * tb, 0.0, 1.0))


def fcos_loss(
    cfg: FCOSCfg,
    cls_logits: jnp.ndarray,  # (B, P, C)
    ltrb_preds: jnp.ndarray,  # (B, P, 4) positive distances
    ctr_logits: jnp.ndarray,  # (B, P)
    points: jnp.ndarray,
    ranges_lo: jnp.ndarray,
    ranges_hi: jnp.ndarray,
    strides: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
):
    b, p, c = cls_logits.shape
    labels, tgt, pos = jax.vmap(
        lambda gb, gl, gm: fcos_targets(
            cfg, points, ranges_lo, ranges_hi, strides, gb, gl, gm
        )
    )(gt_bboxes, gt_labels, gt_mask)
    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.sum(posf)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    loss_cls = L.sigmoid_focal_loss(
        cls_logits.reshape(-1, c), onehot,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_pos,
    ) * cfg.loss_cls_weight

    # decode both to boxes around the points for IoU loss
    pts = jnp.broadcast_to(points, (b, p, 2)).reshape(-1, 2)
    pred = ltrb_preds.reshape(-1, 4)
    tgt_f = tgt.reshape(-1, 4)
    pred_boxes = jnp.stack(
        [pts[:, 0] - pred[:, 0], pts[:, 1] - pred[:, 1],
         pts[:, 0] + pred[:, 2], pts[:, 1] + pred[:, 3]], -1,
    )
    tgt_boxes = jnp.stack(
        [pts[:, 0] - tgt_f[:, 0], pts[:, 1] - tgt_f[:, 1],
         pts[:, 0] + tgt_f[:, 2], pts[:, 1] + tgt_f[:, 3]], -1,
    )
    safe_t = jnp.where(posf[:, None] > 0, tgt_boxes, pred_boxes)
    ctr_t = _centerness(tgt_f) * posf
    ctr_sum = jnp.maximum(jnp.sum(ctr_t), 1e-6)
    if axis_name is not None:
        ctr_sum = jnp.maximum(jax.lax.pmean(jnp.sum(ctr_t), axis_name), 1e-6)
    box_fn = L.giou_loss if cfg.loss_bbox_type == "giou" else L.iou_loss
    loss_bbox = box_fn(
        pred_boxes, safe_t, weight=ctr_t, avg_factor=ctr_sum
    ) * cfg.loss_bbox_weight
    loss_ctr = L.binary_cross_entropy_loss(
        ctr_logits.reshape(-1), ctr_t, weight=posf, avg_factor=num_pos
    ) * cfg.loss_ctr_weight
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "loss_centerness": loss_ctr}


def fcos_get_bboxes(
    cfg: FCOSCfg,
    cls_logits: jnp.ndarray,  # (P, C)
    ltrb_preds: jnp.ndarray,  # (P, 4)
    ctr_logits: jnp.ndarray,  # (P,)
    points: jnp.ndarray,
    num_level_points: Sequence[int],
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,
    rescale: bool,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_iou_thr: float = 0.5,
    max_per_img: int = 100,
):
    from ...ops.box_ops import clip_boxes

    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    ctr_all = jax.nn.sigmoid(ctr_logits.astype(jnp.float32))
    sel_s, sel_b, sel_c = [], [], []
    start = 0
    for nlp in num_level_points:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, nlp)
        d = jax.lax.dynamic_slice_in_dim(ltrb_preds, start, nlp)
        pt = jax.lax.dynamic_slice_in_dim(points, start, nlp)
        ct = jax.lax.dynamic_slice_in_dim(ctr_all, start, nlp)
        k = min(nms_pre, nlp) if nms_pre > 0 else nlp
        _, ti = jax.lax.top_k(jnp.max(s, axis=-1) * ct, k)
        d, pt = d[ti], pt[ti]
        boxes = jnp.stack(
            [pt[:, 0] - d[:, 0], pt[:, 1] - d[:, 1],
             pt[:, 0] + d[:, 2], pt[:, 1] + d[:, 3]], -1,
        )
        boxes = clip_boxes(boxes, img_shape)
        sel_s.append(s[ti])
        sel_b.append(boxes)
        sel_c.append(ct[ti])
        start += nlp
    scores = jnp.concatenate(sel_s)
    boxes = jnp.concatenate(sel_b)
    ctr = jnp.concatenate(sel_c)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img, score_factors=ctr,
    )
