"""SABL RetinaNet head (reference
``mmdet/models/dense_heads/sabl_retina_head.py``: side-aware boundary
localization).

Square anchors (one per location, octave base 4) are classified with a
focal loss; localization is the two-step bucketing scheme of
``ops/bucketing_coder.py`` — per-side bucket classification (BCE, weight
1.5) plus fine offset regression (smooth-L1 beta 1/9, weight 1.5) on the
top-k nearest buckets.  Assignment is approx-max-IoU over the 9 approx
anchors per square (shared with Guided Anchoring).  Decode rescores cls by
the bucketing confidence (``bucket2bbox`` loc_confidence).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ...ops.assigners import assign_wrt_overlaps
from ...ops.box_ops import bbox_overlaps
from ...ops.bucketing_coder import bbox2bucket, bucket2bbox
from ...ops.nms import multiclass_nms_padded
from .guided_anchor_head import GACfg, approx_anchors, square_anchors


@dataclasses.dataclass(frozen=True)
class SABLCfg:
    num_classes: int = 80
    num_buckets: int = 14
    bucket_scale_factor: float = 3.0
    offset_topk: int = 2
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_cls_weight: float = 1.5
    loss_bbox_reg_weight: float = 1.5
    smooth_l1_beta: float = 1.0 / 9.0

    @property
    def side_num(self) -> int:
        return (self.num_buckets + 1) // 2

    def ga(self) -> GACfg:
        return GACfg(
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave,
            ratios=self.ratios, strides=self.strides,
        )


class SABLRetinaConvs(nn.Module):
    num_classes: int
    side_num: int
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        def tower(name):
            convs = [
                nn.Conv(self.feat_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"{name}_conv{i}")
                for i in range(self.stacked_convs)
            ]
            return convs

        cls_t = tower("cls")
        reg_t = tower("reg")
        head_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595), dtype=self.dtype,
            name="retina_cls")
        head_bcls = nn.Conv(self.side_num * 4, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="retina_bbox_cls")
        head_breg = nn.Conv(self.side_num * 4, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="retina_bbox_reg")
        cls_l, bcls_l, breg_l = [], [], []
        for f in feats:
            c, r = f, f
            for conv in cls_t:
                c = nn.relu(conv(c))
            for conv in reg_t:
                r = nn.relu(conv(r))
            cls_l.append(head_cls(c))
            bcls_l.append(head_bcls(r))
            breg_l.append(head_breg(r))
        return cls_l, bcls_l, breg_l


def sabl_loss(cfg: SABLCfg, cls, bcls, breg, squares, approxs,
              gt_bboxes, gt_labels, gt_mask, axis_name=None):
    """cls (B, A, C); bcls/breg (B, A, 4*side); squares (A, 4)."""
    b, a, c = cls.shape
    g = gt_bboxes.shape[1]

    def targets(gb, gl, gm):
        iou = bbox_overlaps(gb, approxs.reshape(-1, 4))
        iou = iou.reshape(g, a, -1).max(axis=-1)
        res = assign_wrt_overlaps(
            iou, squares, jnp.ones((a,), bool), gb, gm, gl,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
        )
        pos = res.gt_inds > 0
        neg = res.gt_inds == 0
        safe = jnp.clip(res.gt_inds - 1, 0, g - 1)
        from ...ops import box_ops as _bo
        matched_gt = _bo.take_small_table(gb, safe)
        labels = jnp.where(pos, res.labels, cfg.num_classes)
        offs, ow, blab, cw = bbox2bucket(
            squares, matched_gt, cfg.num_buckets, cfg.bucket_scale_factor,
            offset_topk=cfg.offset_topk,
        )
        posf = pos.astype(jnp.float32)
        return (labels, (pos | neg).astype(jnp.float32), posf,
                offs, ow * posf[:, None], blab, cw * posf[:, None])

    (labels, lw, posf, offs, ow, blab, cw) = jax.vmap(targets)(
        gt_bboxes, gt_labels, gt_mask)

    num_pos = jnp.sum(posf)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_total = jnp.maximum(num_pos, 1.0)

    onehot = jax.nn.one_hot(labels, c)
    fl = L.sigmoid_focal_loss(
        cls.astype(jnp.float32).reshape(-1, c),
        onehot.reshape(-1, c), gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha, reduction="none",
    )
    loss_cls = (fl.sum(-1) * lw.reshape(-1)).sum() / num_total

    side = cfg.side_num
    bce = L.binary_cross_entropy_loss(
        bcls.astype(jnp.float32).reshape(-1, 4 * side),
        blab.reshape(-1, 4 * side), reduction="none",
    )
    loss_bcls = (bce * cw.reshape(-1, 4 * side)).sum() / (
        num_total * 4 * side)

    diff = jnp.abs(breg.astype(jnp.float32).reshape(-1, 4 * side)
                   - offs.reshape(-1, 4 * side))
    beta = cfg.smooth_l1_beta
    sm = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                   diff - 0.5 * beta)
    loss_breg = (sm * ow.reshape(-1, 4 * side)).sum() / (
        num_total * 4 * cfg.offset_topk)
    return {
        "loss_cls": cfg.loss_cls_weight * loss_cls,
        "loss_bbox_cls": cfg.loss_bbox_cls_weight * loss_bcls,
        "loss_bbox_reg": cfg.loss_bbox_reg_weight * loss_breg,
    }


def sabl_get_bboxes(cfg: SABLCfg, cls, bcls, breg, squares, img_shape,
                    scale_factor, rescale=True, score_thr=0.05,
                    nms_iou_thr=0.5, max_per_img=100, nms_pre: int = 1000):
    """Single image decode (reference ``_get_bboxes_single``): per-level
    topk (approximated by a global static cap), bucket decode with
    confidence rescoring, multiclass NMS."""
    scores = jax.nn.sigmoid(cls.astype(jnp.float32))  # (A, C)
    boxes, conf = bucket2bbox(
        squares, bcls.astype(jnp.float32), breg.astype(jnp.float32),
        cfg.num_buckets, cfg.bucket_scale_factor, max_shape=img_shape,
    )
    scores = scores * conf[:, None]
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img, pre_nms_top_k=min(nms_pre * 2, 2048),
    )
