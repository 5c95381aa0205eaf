"""ProbRoIHead — prior-aware R-CNN head with boosting reweighting.

Spec (re-derived from ``mmdet/models/roi_heads/prob_roi_head.py:10-283``):

Training (``forward_train:23`` + ``_bbox_forward_train_boost:107``):
  * per image: MaxIoU assign (0.6/0.6/min 0.6, no low-quality) over the RPN
    proposals, RandomSampler(512, pos 0.25) with gt boxes *prepended* as
    candidates;
  * per sampled RoI a **prior** is extracted from the proposal score
    (column 4): positive -> score, negative -> 1 - score, gt-as-proposal -> 0
    (``:51-64``);
  * boosting: CE computed per-sample, then renormalised by
    ``norm_loss`` with weights ``(1 - prior)**gamma`` such that the weighted
    sum equals the unweighted sum (detached), averaged over all samples
    (``:117-154``); reg loss summed / #rois.

Inference (``simple_test_bboxes:206``): final score =
``sqrt(softmax(cls) * prior)`` (``:232-240``), then per-image decode +
multiclass NMS.

TPU design: fixed 512-RoI slots per image; the per-image python loop becomes
``vmap``; the RoIAlign + 2-FC forward runs once over the flattened
``(B*512, 7, 7, C)`` batch (big MXU matmuls).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops import box_ops
from ...ops.assigners import max_iou_assign
from ...ops.samplers import random_sample
from .bbox_head import BBoxHeadCfg, bbox_head_loss, bbox_targets

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class ProbRoICfg:
    alpha: float = 0.0
    gamma: float = 0.1
    boost: bool = False
    prob: bool = True
    quality: bool = False
    iou_gamma: float = 0.0
    reg_norm: str = "bbox_num"  # 'bbox_num' | 'mean'
    # rcnn train cfg
    num_samples: int = 512
    pos_fraction: float = 0.25
    neg_pos_ub: int = -1
    add_gt_as_proposals: bool = True
    pos_iou_thr: float = 0.6
    neg_iou_thr: float = 0.6
    min_pos_iou: float = 0.6
    match_low_quality: bool = False
    # PISA on the R-CNN stage (reference ``pisa_roi_head.py``): ISR-P
    # reweights positive cls samples by IoU-HLR, CARL adds a
    # classification-aware regression term
    isr: Optional[dict] = None  # dict(k=, bias=)
    carl: Optional[dict] = None  # dict(k=, bias=)


class RoISample(NamedTuple):
    """Fixed-shape per-image sampling output."""

    boxes: jnp.ndarray  # (R, 4)
    is_pos: jnp.ndarray  # (R,)
    valid: jnp.ndarray  # (R,)
    prior: jnp.ndarray  # (R,) extracted prior
    iou: jnp.ndarray  # (R,) |assigned max IoU| (quality variant)
    matched_gt: jnp.ndarray  # (R, 4)
    matched_label: jnp.ndarray  # (R,)
    gt_idx: jnp.ndarray  # (R,) 0-based matched gt index (pos slots)
    cand_idx: jnp.ndarray  # (R,) index into the gt-prepended candidate list
    is_gt: jnp.ndarray  # (R,) slot is a gt-added proposal


def sample_rois(
    cfg: ProbRoICfg,
    rng: jax.Array,
    proposals: jnp.ndarray,  # (P, 4)
    prop_scores: jnp.ndarray,  # (P,) prior column
    prop_valid: jnp.ndarray,  # (P,)
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,)
    gt_labels: jnp.ndarray,  # (G,)
) -> RoISample:
    """Assign + sample one image's RoIs with prior extraction."""
    g = gt_bboxes.shape[0]
    assign = max_iou_assign(
        proposals,
        prop_valid,
        gt_bboxes,
        gt_mask,
        gt_labels=gt_labels,
        pos_iou_thr=cfg.pos_iou_thr,
        neg_iou_thr=cfg.neg_iou_thr,
        min_pos_iou=cfg.min_pos_iou,
        match_low_quality=cfg.match_low_quality,
    )
    if cfg.add_gt_as_proposals:
        # Prepend gt candidates with self-assignment (the reference
        # sampler's ``add_gt_`` step).
        cand_boxes = jnp.concatenate([gt_bboxes, proposals], axis=0)
        cand_valid = jnp.concatenate([gt_mask, prop_valid])
        gt_self = jnp.where(gt_mask, jnp.arange(1, g + 1, dtype=jnp.int32), -1)
        cand_gt_inds = jnp.concatenate([gt_self, assign.gt_inds])
        cand_overlap = jnp.concatenate(
            [gt_mask.astype(jnp.float32), assign.max_overlaps]
        )
        cand_is_gt = jnp.concatenate(
            [jnp.ones((g,), bool), jnp.zeros_like(prop_valid)]
        )
        cand_score = jnp.concatenate([jnp.zeros((g,)), prop_scores])
    else:
        cand_boxes, cand_valid = proposals, prop_valid
        cand_gt_inds, cand_overlap = assign.gt_inds, assign.max_overlaps
        cand_is_gt = jnp.zeros_like(prop_valid)
        cand_score = prop_scores

    from ...ops.assigners import AssignResult

    res = random_sample(
        rng,
        AssignResult(cand_gt_inds, cand_overlap, jnp.zeros_like(cand_gt_inds)),
        cand_valid,
        num=cfg.num_samples,
        pos_fraction=cfg.pos_fraction,
        neg_pos_ub=cfg.neg_pos_ub,
    )
    boxes = cand_boxes[res.inds]
    score = cand_score[res.inds]
    is_gt = cand_is_gt[res.inds]
    overlap = cand_overlap[res.inds]

    # Prior extraction (``prob_roi_head.py:51-64``): gt-added -> 0,
    # positive -> score, negative -> 1 - score.
    prior = jnp.where(
        is_gt, 0.0, jnp.where(res.is_pos, score, 1.0 - score)
    )
    prior = jnp.where(res.valid, prior, 0.0)
    iou = jnp.where(res.is_pos, overlap, 1.0 - overlap)

    safe_gt = jnp.clip(res.gt_inds, 0, g - 1)
    matched_gt = gt_bboxes[safe_gt]
    matched_label = jnp.where(res.is_pos, gt_labels[safe_gt], -1).astype(jnp.int32)
    return RoISample(
        boxes, res.is_pos, res.valid, jax.lax.stop_gradient(prior),
        jax.lax.stop_gradient(iou), matched_gt, matched_label, safe_gt,
        res.inds.astype(jnp.int32), is_gt,
    )


def sample_rois_boost(
    cfg: ProbRoICfg,
    rng: jax.Array,
    proposals: jnp.ndarray,  # (P, 4)
    prop_cls_scores: jnp.ndarray,  # (P, C) multi-class RPN scores (cols 4:)
    prop_valid: jnp.ndarray,  # (P,)
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,)
    gt_labels: jnp.ndarray,  # (G,)
) -> RoISample:
    """BoostRoIHead sampling (reference ``prob_roi_head.py:286-334``):
    multi-class priors taken from proposal columns ``4:``.

    Per sampled RoI the reference builds a (C+1) prior row — class columns =
    the proposal's per-class scores, appended column = 0 for positives and
    ``max_c score_c`` for negatives, all-zero rows for gt-added proposals —
    which the boosting loss consumes at the target label.  Documented
    deviation: the reference's own train path crashes on a (R, C+1) x (R,)
    broadcast in ``norm_loss`` (no shipping config exercises it); this
    implementation realises the intended label-indexed semantics directly:
    pos -> score at the matched gt label, neg -> max over class scores,
    gt-added -> 0.
    """
    g = gt_bboxes.shape[0]
    c = prop_cls_scores.shape[1]
    scalar = jnp.max(prop_cls_scores, axis=1)  # only ranks sampling keys
    base = sample_rois(
        cfg, rng, proposals, scalar, prop_valid, gt_bboxes, gt_mask, gt_labels
    )
    # Gather each sampled slot's (C,) score row from the gt-prepended
    # candidate list (``base.cand_idx`` indexes that list), then extract the
    # multi-class prior.
    cand_rows = jnp.concatenate(
        [jnp.zeros((g, c), prop_cls_scores.dtype), prop_cls_scores], axis=0
    ) if cfg.add_gt_as_proposals else prop_cls_scores
    rows = cand_rows[base.cand_idx]  # (R, C)
    safe_lab = jnp.clip(base.matched_label, 0, c - 1)
    pos_prior = jnp.take_along_axis(rows, safe_lab[:, None], axis=1)[:, 0]
    neg_prior = jnp.max(rows, axis=1)
    prior = jnp.where(
        base.is_gt, 0.0, jnp.where(base.is_pos, pos_prior, neg_prior)
    )
    prior = jnp.where(base.valid, prior, 0.0)
    return base._replace(prior=jax.lax.stop_gradient(prior))


def boost_fuse_scores(
    cls_score: jnp.ndarray, prior_cls: jnp.ndarray
) -> jnp.ndarray:
    """BoostRoIHead test fusion (reference ``prob_roi_head.py:369-398``):
    multi-class proposal prior (R, C) gets an all-ones bg column appended,
    then ``sqrt(softmax(cls) * prior)`` elementwise."""
    p = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    ones = jnp.ones((prior_cls.shape[0], 1), p.dtype)
    prior = jnp.concatenate([prior_cls.astype(p.dtype), ones], axis=1)
    return jnp.sqrt(jnp.maximum(p * prior, 0.0))


def norm_loss(loss: jnp.ndarray, weights: jnp.ndarray, avg_factor) -> jnp.ndarray:
    """Boosting renormalisation (reference ``norm_loss:151``): rescale the
    weights so the weighted loss sum equals the unweighted sum (detached),
    then average."""
    denom = jnp.sum(weights * loss)
    scale = jnp.sum(loss) / jnp.where(denom == 0, 1.0, denom)
    new_w = jax.lax.stop_gradient(weights * scale)
    return jnp.sum(loss * new_w) / avg_factor


def prob_roi_loss(
    cfg: ProbRoICfg,
    head_cfg: BBoxHeadCfg,
    cls_score: jnp.ndarray,  # (R_total, C+1)
    bbox_pred: jnp.ndarray,  # (R_total, 4K)
    sample: RoISample,  # flattened over batch: each field (R_total, ...)
    seesaw_counts=None,  # (C+1,) cumulative class counts (Seesaw configs)
    beta_override=None,  # traced SmoothL1 beta (Dynamic R-CNN)
):
    """Boosting-reweighted R-CNN loss (``_bbox_forward_train_boost:107``)."""
    labels, label_w, bbox_t, bbox_w = bbox_targets(
        head_cfg,
        sample.boxes,
        sample.is_pos,
        sample.valid,
        sample.matched_gt,
        jnp.where(sample.is_pos, sample.matched_label, head_cfg.num_classes),
    )
    raw = bbox_head_loss(
        head_cfg, cls_score, bbox_pred, sample.boxes,
        labels, label_w, bbox_t, bbox_w, reduction_override="none",
        seesaw_counts=seesaw_counts, beta_override=beta_override,
    )
    validf = sample.valid.astype(jnp.float32)
    # The reference averages over the *actual* number of sampled rois
    # (``avg_factor=num_samples`` at ``prob_roi_head.py:137-154``); with
    # fixed 512-slot padding that is the valid count, not the slot count —
    # using the slot count silently down-scales the loss when
    # proposals + gt < 512 per image (small scenes, early training).
    n_valid = jnp.maximum(jnp.sum(validf), 1.0)

    extra = {}
    if not cfg.boost:
        cls_w = validf
        if cfg.isr is not None:
            # ISR-P (reference ``pisa_roi_head.py`` + ``isr_p:9``): IoU of
            # the CURRENT decoded predictions against the matched gts
            from ...ops import box_ops
            from ...ops.pisa import isr_p_weights

            c = head_cfg.num_classes
            r = bbox_pred.shape[0]
            if head_cfg.reg_class_agnostic:
                pred4 = bbox_pred.reshape(r, 4)
            else:
                safe_lab = jnp.clip(labels, 0, c - 1)
                pred4 = jnp.take_along_axis(
                    bbox_pred.reshape(r, c, 4),
                    safe_lab[:, None, None].repeat(4, -1), axis=1)[:, 0]
            dec = box_ops.delta2bbox(
                sample.boxes, jax.lax.stop_gradient(pred4),
                head_cfg.target_means, head_cfg.target_stds)
            cur_iou = box_ops.bbox_overlaps_aligned(dec, sample.matched_gt)
            pos = sample.is_pos & sample.valid
            cls_w = isr_p_weights(
                labels, sample.gt_idx, cur_iou, validf, pos,
                jax.lax.stop_gradient(raw["loss_cls"]),
                k=cfg.isr.get("k", 2.0), bias=cfg.isr.get("bias", 0.0),
            ) * validf
        if cfg.carl is not None:
            from ...ops.pisa import carl_loss

            extra["loss_carl"] = carl_loss(
                cls_score, labels, sample.is_pos & sample.valid,
                raw["loss_bbox"], k=cfg.carl.get("k", 1.0),
                bias=cfg.carl.get("bias", 0.2), avg_factor=n_valid,
            )
        loss_cls = jnp.sum(raw["loss_cls"] * cls_w) / n_valid
    else:
        if cfg.quality:
            probs = jax.lax.stop_gradient(jax.nn.softmax(cls_score, axis=-1))
            p_at_label = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
            lw = (
                jnp.abs(sample.iou - p_at_label) ** cfg.iou_gamma
                * (1.0 - sample.prior) ** cfg.gamma
            )
        else:
            lw = (1.0 - sample.prior) ** cfg.gamma
        if cfg.alpha != 0:
            lw = lw * cfg.alpha
        lw = lw * validf
        loss_cls = norm_loss(raw["loss_cls"] * validf, lw, n_valid)

    if cfg.reg_norm == "mean":
        loss_bbox = jnp.sum(raw["loss_bbox"]) / (
            jnp.maximum(jnp.sum(sample.is_pos.astype(jnp.float32)), 1.0) * 4.0
        )
    else:  # 'bbox_num': sum over pos elements / #sampled rois (``:144-147``)
        loss_bbox = jnp.sum(raw["loss_bbox"]) / n_valid
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, **extra}


def prob_fuse_scores(cls_score: jnp.ndarray, prior: jnp.ndarray) -> jnp.ndarray:
    """Probabilistic inference fusion (``simple_test_bboxes:232-240``):
    ``sqrt(softmax(cls) * prior)``."""
    p = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    return jnp.sqrt(jnp.maximum(p * prior[:, None], 0.0))


# ---------------------------------------------------------------------------
# DyProbRoIHead: boosting + Dynamic R-CNN (reference ``prob_roi_head.py:
# 473-623``).  The reference collects IoU/regression-error history lists and
# rewrites the assigner threshold & SmoothL1 beta every
# ``update_iter_interval`` python-side; here the same history lives in a
# fixed-size ring buffer carried through the jitted step, and the update is
# replayed exactly on every interval boundary (mean IoU / median beta,
# floor/cap at the initial values) — no host round-trip, no smoothing
# approximation.
# ---------------------------------------------------------------------------


class DynamicRCNNState(NamedTuple):
    iou_thr: jnp.ndarray  # () current assigner threshold
    beta: jnp.ndarray  # () current SmoothL1 beta
    iou_hist: jnp.ndarray  # (K,) interval ring buffer of batch IoU stats
    beta_hist: jnp.ndarray  # (K,) interval ring buffer of batch beta stats
    count: jnp.ndarray  # () int32 steps recorded


def dynamic_rcnn_init(initial_iou: float = 0.4, initial_beta: float = 1.0,
                      interval: int = 100):
    return DynamicRCNNState(
        jnp.asarray(initial_iou), jnp.asarray(initial_beta),
        jnp.zeros((interval,), jnp.float32),
        jnp.zeros((interval,), jnp.float32),
        jnp.asarray(0, jnp.int32),
    )


def dynamic_rcnn_batch_stats(
    max_overlaps: jnp.ndarray,  # (B, P) per-image assigner max IoU, ALL proposals
    prop_valid: jnp.ndarray,  # (B, P)
    bbox_targets: jnp.ndarray,  # (R_total, 4) encoded regression targets
    pos_valid: jnp.ndarray,  # (R_total,) positive & valid sample mask
    iou_topk: int = 75,
    beta_topk: int = 10,
):
    """The reference Dynamic R-CNN KI/KE statistics (``dynamic_roi_head.py``):

    * IoU statistic: per image, the ``iou_topk``-th largest ``max_overlaps``
      over all proposals, then mean over images.
    * beta statistic: the k-th *smallest* ``mean(|dx, dy|)`` of the encoded
      regression targets over positives, with ``k = min(beta_topk * B,
      num_pos)`` (torch ``kthvalue`` semantics).

    Returns ``(batch_iou, batch_beta)``; ``batch_beta`` is NaN when the batch
    has no positives (the reference simply skips the history append then).
    """
    b, p = max_overlaps.shape
    masked = jnp.where(prop_valid, max_overlaps, -1.0)
    k = min(iou_topk, p)
    per_img = jax.lax.top_k(masked, k)[0][:, -1]  # (B,)
    batch_iou = jnp.mean(per_img)

    mean_xy = jnp.mean(jnp.abs(bbox_targets[:, :2]), axis=-1)
    num_pos = jnp.sum(pos_valid.astype(jnp.int32))
    kb_cap = min(beta_topk * b, mean_xy.shape[0])
    vals = jnp.sort(jnp.where(pos_valid, mean_xy, jnp.inf))
    kb = jnp.clip(jnp.minimum(kb_cap, num_pos), 1, mean_xy.shape[0])
    batch_beta = jnp.where(num_pos > 0, vals[kb - 1], jnp.nan)
    return batch_iou, batch_beta


def dynamic_rcnn_update(
    state: DynamicRCNNState,
    batch_iou: jnp.ndarray,
    batch_beta: jnp.ndarray,
    initial_iou: float = 0.4,
    initial_beta: float = 1.0,
) -> DynamicRCNNState:
    """Record the batch statistics in the interval ring buffer; on every
    boundary (``count % K == 0`` after the append) replay the reference
    update exactly (``update_hyperparameters``: ``max(initial_iou,
    mean(iou_history))`` / ``min(initial_beta, median(beta_history))``,
    beta unchanged when the median degenerates below EPS=1e-15).  NaN
    statistics (no positives) are recorded as the current working values —
    upstream this cannot occur (add_gt_as_proposals guarantees positives)."""
    batch_iou = jnp.where(jnp.isnan(batch_iou), state.iou_thr, batch_iou)
    batch_beta = jnp.where(jnp.isnan(batch_beta), state.beta, batch_beta)
    k = state.iou_hist.shape[0]
    idx = jnp.mod(state.count, k)
    iou_hist = state.iou_hist.at[idx].set(batch_iou.astype(jnp.float32))
    beta_hist = state.beta_hist.at[idx].set(batch_beta.astype(jnp.float32))
    count = state.count + 1
    boundary = jnp.mod(count, k) == 0
    cand_iou = jnp.maximum(initial_iou, jnp.mean(iou_hist))
    med = jnp.median(beta_hist)
    cand_beta = jnp.where(med < 1e-15, state.beta,
                          jnp.minimum(initial_beta, med))
    return DynamicRCNNState(
        jnp.where(boundary, cand_iou, state.iou_thr),
        jnp.where(boundary, cand_beta, state.beta),
        iou_hist, beta_hist, count,
    )


def sample_rois_dynamic(
    cfg: ProbRoICfg,
    rng: jax.Array,
    proposals, prop_scores, prop_valid, gt_bboxes, gt_mask, gt_labels,
    iou_thr: jnp.ndarray,
):
    """``sample_rois`` with a traced (dynamic) assigner threshold."""
    import dataclasses as _dc

    # thresholds flow into jnp comparisons, so traced scalars are fine; the
    # dataclass just carries them.
    dyn_cfg = _dc.replace(cfg)
    object.__setattr__(dyn_cfg, "pos_iou_thr", iou_thr)
    object.__setattr__(dyn_cfg, "neg_iou_thr", iou_thr)
    object.__setattr__(dyn_cfg, "min_pos_iou", iou_thr)
    return sample_rois(
        dyn_cfg, rng, proposals, prop_scores, prop_valid,
        gt_bboxes, gt_mask, gt_labels,
    )
