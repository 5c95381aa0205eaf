"""Cascade R-CNN RoI head (plain + probabilistic variants).

Spec re-derived from reference ``mmdet/models/roi_heads/cascade_roi_head.py``
and the fork's ``ProbCascadeRoIHead`` (``prob_roi_head.py:627-881``):

  * 3 stages with rising assigner IoU thresholds (0.5/0.6/0.7), tightening
    target stds, stage loss weights [1, 0.5, 0.25];
  * training: each stage reassigns + resamples on the previous stage's
    refined boxes (gt-added proposals filtered before refinement);
  * inference: every stage refines all proposals; class scores are averaged
    over stages; final boxes decoded from the last stage;
  * Prob variant: per-stage prior extraction like ProbRoIHead, and at test
    the stage-averaged scores are fused ``sqrt(cls * prior)`` fg /
    ``sqrt(cls * (1 - prior))`` bg (``prob_roi_head.py:810-813``).

TPU design: the stage loop is a static python unroll (3 jitted sub-graphs);
each stage keeps the fixed 512-RoI slot layout.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops import box_ops
from .bbox_head import BBoxHeadCfg, bbox_head_loss, bbox_targets
from .prob_roi_head import ProbRoICfg, RoISample, norm_loss, sample_rois


@dataclasses.dataclass(frozen=True)
class CascadeCfg:
    num_stages: int = 3
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    stage_pos_iou: Tuple[float, ...] = (0.5, 0.6, 0.7)
    # prob/boost options (ProbCascadeRoIHead)
    prob: bool = False
    boost: bool = False
    gamma: float = 0.1
    # HTC trains each stage's mask on boxes refined by that stage
    # (interleaved, ``htc_roi_head.py:296``); plain Cascade Mask R-CNN
    # (``cascade_roi_head.py``) trains it on the stage's own sampled rois
    interleaved: bool = True


def stage_head_cfg(base: BBoxHeadCfg, stage: int) -> BBoxHeadCfg:
    """Stage-specific coder stds (mmdet cascade convention)."""
    stds = [
        (0.1, 0.1, 0.2, 0.2),
        (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067),
    ][min(stage, 2)]
    return dataclasses.replace(base, target_stds=stds)


def refine_boxes(
    head_cfg: BBoxHeadCfg,
    rois: jnp.ndarray,  # (R, 4)
    cls_score: jnp.ndarray,  # (R, C+1)
    bbox_pred: jnp.ndarray,  # (R, 4K)
    img_shape: jnp.ndarray,
) -> jnp.ndarray:
    """``regress_by_class`` (reference ``bbox_head.py:461``): decode each RoI
    with the deltas of its argmax foreground class (or the single agnostic
    set)."""
    r = rois.shape[0]
    c = head_cfg.num_classes
    if head_cfg.reg_class_agnostic:
        pred4 = bbox_pred.reshape(r, 4)
    else:
        label = jnp.argmax(cls_score[:, :c], axis=-1)
        pred4 = jnp.take_along_axis(
            bbox_pred.reshape(r, c, 4), label[:, None, None].repeat(4, -1), axis=1
        )[:, 0]
    return box_ops.delta2bbox(
        rois, pred4, head_cfg.target_means, head_cfg.target_stds, max_shape=img_shape
    )


def cascade_train_stage(
    cas_cfg: CascadeCfg,
    roi_cfg: ProbRoICfg,
    head_cfg: BBoxHeadCfg,
    stage: int,
    rng: jax.Array,
    proposals: jnp.ndarray,  # (P, 4) single image
    prop_scores: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_labels: jnp.ndarray,
) -> RoISample:
    thr = cas_cfg.stage_pos_iou[stage]
    stage_roi_cfg = dataclasses.replace(
        roi_cfg,
        pos_iou_thr=thr,
        neg_iou_thr=thr,
        min_pos_iou=thr,
        add_gt_as_proposals=(roi_cfg.add_gt_as_proposals and stage == 0)
        or roi_cfg.add_gt_as_proposals,
    )
    return sample_rois(
        stage_roi_cfg, rng, proposals, prop_scores, prop_valid,
        gt_bboxes, gt_mask, gt_labels,
    )


def cascade_stage_loss(
    cas_cfg: CascadeCfg,
    head_cfg: BBoxHeadCfg,
    stage: int,
    cls_score: jnp.ndarray,  # (R_total, C+1) flattened over batch
    bbox_pred: jnp.ndarray,
    sample: RoISample,  # flattened
    seesaw_counts=None,  # per-stage cumulative class counts (Seesaw)
):
    hc = stage_head_cfg(head_cfg, stage)
    labels, label_w, bbox_t, bbox_w = bbox_targets(
        hc,
        sample.boxes,
        sample.is_pos,
        sample.valid,
        sample.matched_gt,
        jnp.where(sample.is_pos, sample.matched_label, hc.num_classes),
    )
    r_total = cls_score.shape[0]
    validf = sample.valid.astype(jnp.float32)
    raw = bbox_head_loss(
        hc, cls_score, bbox_pred, sample.boxes, labels, label_w, bbox_t,
        bbox_w, reduction_override="none", seesaw_counts=seesaw_counts,
    )
    if cas_cfg.boost:
        lw = (1.0 - sample.prior) ** cas_cfg.gamma * validf
        loss_cls = norm_loss(raw["loss_cls"] * validf, lw, float(r_total))
    else:
        loss_cls = jnp.sum(raw["loss_cls"] * validf) / jnp.maximum(
            jnp.sum(validf), 1.0
        )
    loss_bbox = jnp.sum(raw["loss_bbox"]) / float(r_total)
    w = cas_cfg.stage_loss_weights[stage]
    return {f"s{stage}.loss_cls": loss_cls * w, f"s{stage}.loss_bbox": loss_bbox * w}
