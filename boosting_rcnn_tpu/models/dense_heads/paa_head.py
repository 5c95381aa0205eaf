"""PAA head (reference ``mmdet/models/dense_heads/paa_head.py:47``):
Probabilistic Anchor Assignment over the ATSS head architecture.

Pipeline per image: a loose MaxIoU first pass (thr 0.1) nominates candidate
positives; each gt's candidates are scored by their joint (focal cls +
decoded GIoU) loss, the per-level ``topk`` lowest-loss candidates feed a
2-component 1-D Gaussian mixture fit over the loss values, and the
low-loss component (up to its best-likelihood sample) keeps positive —
everything else reverts to background.  The centerness branch regresses the
realised IoU.  Test-time score voting refines boxes by likelihood-weighted
averaging of high-IoU candidates.

TPU design: the per-gt sklearn GMM loop becomes a vmapped fixed-iteration
EM over a (G, M) candidate-loss matrix (M = levels x topk), masked for
validity."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops import box_ops, losses as L
from ...ops.assigners import max_iou_assign

INF = 1e9


@dataclasses.dataclass(frozen=True)
class PAACfg:
    num_classes: int = 80
    topk: int = 9
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # 'focal' | 'qfl' (the paa_qfl config: quality focal with IoU targets)
    loss_cls_type: str = "focal"
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.3
    loss_iou_weight: float = 0.5
    first_pos_iou: float = 0.1
    gmm_iters: int = 10
    score_voting: bool = True


def gmm_em_1d(x: jnp.ndarray, valid: jnp.ndarray, iters: int):
    """Fixed-iteration 2-component 1-D EM (sklearn GaussianMixture
    semantics at convergence).  x: (M,) values; valid: (M,) mask.
    Returns (resp0 (M,), loglik (M,), means (2,))."""
    n = jnp.maximum(jnp.sum(valid), 1.0)
    xmin = jnp.min(jnp.where(valid, x, INF))
    xmax = jnp.max(jnp.where(valid, x, -INF))
    means = jnp.stack([xmin, xmax])
    var = jnp.ones((2,))
    w = jnp.asarray([0.5, 0.5])

    def step(state, _):
        means, var, w = state
        # E-step
        d = x[None, :] - means[:, None]  # (2, M)
        logp = (
            -0.5 * d * d / var[:, None]
            - 0.5 * jnp.log(2 * jnp.pi * var[:, None])
            + jnp.log(jnp.maximum(w[:, None], 1e-8))
        )
        logp = jnp.where(valid[None, :], logp, -INF)
        logZ = jax.nn.logsumexp(logp, axis=0)
        r = jnp.exp(logp - logZ[None, :])  # (2, M)
        r = jnp.where(valid[None, :], r, 0.0)
        # M-step
        nk = jnp.maximum(jnp.sum(r, axis=1), 1e-6)
        means = jnp.sum(r * x[None, :], axis=1) / nk
        var = jnp.maximum(
            jnp.sum(r * (x[None, :] - means[:, None]) ** 2, axis=1) / nk,
            1e-6,
        )
        w = nk / n
        return (means, var, w), None

    (means, var, w), _ = jax.lax.scan(step, (means, var, w), None,
                                      length=iters)
    d = x[None, :] - means[:, None]
    logp = (
        -0.5 * d * d / var[:, None]
        - 0.5 * jnp.log(2 * jnp.pi * var[:, None])
        + jnp.log(jnp.maximum(w[:, None], 1e-8))
    )
    loglik = jax.nn.logsumexp(logp, axis=0)
    resp0 = (logp[0] >= logp[1])  # assigned to the low-loss component
    # order components so 0 = lower mean
    swap = means[0] > means[1]
    resp0 = jnp.where(swap, ~resp0, resp0)
    return resp0, loglik, means


def paa_assign_targets(
    cfg: PAACfg,
    cls_logits: jnp.ndarray,  # (A, C) one image (stop-gradient input)
    bbox_preds: jnp.ndarray,  # (A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (A,)
    num_level_anchors: Tuple[int, ...],
    gt_bboxes, gt_mask, gt_labels,
):
    """Single-image PAA reassignment.  Returns (labels (A,), pos (A,),
    matched_gt (A, 4))."""
    a = anchors.shape[0]
    g = gt_bboxes.shape[0]
    assign = max_iou_assign(
        anchors, valid, gt_bboxes, gt_mask, gt_labels=gt_labels,
        pos_iou_thr=cfg.first_pos_iou, neg_iou_thr=cfg.first_pos_iou,
        min_pos_iou=0.0, match_low_quality=True,
    )
    cand = assign.gt_inds > 0  # (A,)
    safe_gt = jnp.clip(assign.gt_inds - 1, 0, g - 1)

    # joint candidate loss (reference get_pos_loss): focal CE at the gt
    # class + decoded GIoU
    labels_cand = jnp.where(cand, assign.labels, cfg.num_classes)
    onehot = jax.nn.one_hot(labels_cand, cfg.num_classes, dtype=jnp.float32)
    cls_l = L.sigmoid_focal_loss(
        cls_logits, onehot, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        reduction="none",
    ).sum(-1)
    decoded = box_ops.delta2bbox(
        anchors, bbox_preds, cfg.target_means, cfg.target_stds
    )
    matched = box_ops.take_small_table(gt_bboxes, safe_gt)
    safe_t = jnp.where(cand[:, None], matched, decoded)
    reg_l = L.giou_loss(decoded, safe_t, reduction="none")
    joint = jax.lax.stop_gradient(cls_l + reg_l)

    # per (gt, level) topk lowest-loss candidates
    nl = len(num_level_anchors)
    k = cfg.topk
    m = nl * k
    cand_of = cand[None, :] & (
        safe_gt[None, :] == jnp.arange(g)[:, None]
    ) & (assign.gt_inds[None, :] > 0)  # (G, A)
    gathered_loss = jnp.full((g, m), INF)
    gathered_idx = jnp.zeros((g, m), jnp.int32)
    gathered_valid = jnp.zeros((g, m), bool)
    start = 0
    for li, na in enumerate(num_level_anchors):
        lvl_loss = jax.lax.dynamic_slice_in_dim(
            jnp.where(cand_of, joint[None, :], INF), start, na, axis=1
        )  # (G, na)
        kk = min(k, na)
        neg_top, idx = jax.lax.top_k(-lvl_loss, kk)  # lowest loss
        vals = -neg_top
        ok = vals < INF / 2
        gathered_loss = jax.lax.dynamic_update_slice(
            gathered_loss, jnp.pad(vals, ((0, 0), (0, k - kk)),
                                   constant_values=INF),
            (0, li * k),
        )
        gathered_idx = jax.lax.dynamic_update_slice(
            gathered_idx,
            jnp.pad(idx + start, ((0, 0), (0, k - kk))).astype(jnp.int32),
            (0, li * k),
        )
        gathered_valid = jax.lax.dynamic_update_slice(
            gathered_valid, jnp.pad(ok, ((0, 0), (0, k - kk))), (0, li * k)
        )
        start += na

    def per_gt(losses_m, valid_m):
        n_ok = jnp.sum(valid_m)
        resp0, loglik, _ = gmm_em_1d(losses_m, valid_m, cfg.gmm_iters)
        # separation scheme 2: keep component-0 samples whose loss is <=
        # the loss of the best-likelihood component-0 sample
        ll0 = jnp.where(resp0 & valid_m, loglik, -INF)
        best = jnp.argmax(ll0)
        thr_loss = losses_m[best]
        keep = resp0 & valid_m & (losses_m <= thr_loss)
        # degenerate gt (<2 candidates): keep every candidate (reference
        # `continue` leaves the first-pass assignment)
        keep = jnp.where(n_ok < 2, valid_m, keep)
        return keep

    keep = jax.vmap(per_gt)(gathered_loss, gathered_valid)  # (G, M)
    keep = keep & gt_mask[:, None]

    # scatter back to the anchor axis
    pos = jnp.zeros((a,), bool)
    flat_idx = gathered_idx.reshape(-1)
    flat_keep = keep.reshape(-1)
    pos = pos.at[flat_idx].max(flat_keep)
    pos = pos & cand
    labels = jnp.where(pos, assign.labels, cfg.num_classes).astype(jnp.int32)
    return labels, pos, matched, assign.max_overlaps


def paa_loss(
    cfg: PAACfg,
    cls_logits: jnp.ndarray,  # (B, A, C)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    iou_logits: jnp.ndarray,  # (B, A)
    anchors: jnp.ndarray,
    valid: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, a, c = cls_logits.shape

    labels, pos, matched, _ = jax.vmap(
        lambda cl, bp, v, gb, gm, gl: paa_assign_targets(
            cfg, jax.lax.stop_gradient(cl), jax.lax.stop_gradient(bp),
            anchors, v, num_level_anchors, gb, gm, gl,
        )
    )(cls_logits, bbox_preds, valid, gt_bboxes, gt_mask, gt_labels)

    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.sum(posf)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    anchors_b = jnp.broadcast_to(anchors[None], (b, a, 4)).reshape(-1, 4)
    decoded = box_ops.delta2bbox(
        anchors_b, bbox_preds.reshape(-1, 4), cfg.target_means,
        cfg.target_stds,
    )
    gt_flat = matched.reshape(-1, 4)
    safe_t = jnp.where(posf[:, None] > 0, gt_flat, decoded)
    iou_t = box_ops.bbox_overlaps_aligned(
        jax.lax.stop_gradient(decoded), safe_t
    ) * posf

    if cfg.loss_cls_type == "qfl":
        # paa_qfl config: quality focal with the decoded-prediction IoU as
        # the soft target at positives (GFL formulation)
        loss_cls = cfg.loss_cls_weight * L.quality_focal_loss(
            cls_logits.reshape(-1, c), labels.reshape(-1),
            jax.lax.stop_gradient(iou_t),
            weight=valid.reshape(-1).astype(jnp.float32),
            beta=cfg.focal_gamma, avg_factor=num_pos,
        )
    else:
        onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
        loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
            cls_logits.reshape(-1, c), onehot,
            weight=valid.reshape(-1).astype(jnp.float32),
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            avg_factor=num_pos,
        )
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        decoded, jax.lax.stop_gradient(safe_t), weight=posf,
        avg_factor=num_pos,
    )
    loss_iou = cfg.loss_iou_weight * L.binary_cross_entropy_loss(
        iou_logits.reshape(-1), jax.lax.stop_gradient(iou_t), weight=posf,
        avg_factor=num_pos,
    )
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_iou": loss_iou}


def score_voting(
    dets: jnp.ndarray,  # (K, 5) post-NMS
    det_labels: jnp.ndarray,  # (K,)
    det_valid: jnp.ndarray,  # (K,)
    cand_boxes: jnp.ndarray,  # (N, 4) pre-NMS candidates
    cand_scores: jnp.ndarray,  # (N, C)
    cand_valid: jnp.ndarray,  # (N,)
    sigma: float = 0.025,
):
    """PAA score voting (reference ``paa_head.py:621``): each kept box is
    replaced by the score-and-proximity weighted average of candidates with
    IoU > 0.01 in its class."""
    iou = box_ops.bbox_overlaps(dets[:, :4], cand_boxes)  # (K, N)
    # candidate score at each det's class: (K, N)
    sel = cand_scores.T[jnp.clip(det_labels, 0, cand_scores.shape[1] - 1)]
    w = sel * jnp.exp(-((1.0 - iou) ** 2) / sigma)
    w = jnp.where((iou > 0.01) & cand_valid[None, :], w, 0.0)
    denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)
    voted = jnp.dot(w, cand_boxes) / denom
    voted = jnp.where(det_valid[:, None], voted, dets[:, :4])
    return jnp.concatenate([voted, dets[:, 4:5]], axis=-1)


def paa_get_bboxes(
    cfg: PAACfg,
    cls_logits: jnp.ndarray,  # (A, C) one image
    bbox_preds: jnp.ndarray,
    iou_logits: jnp.ndarray,  # (A,)
    anchors: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    img_shape, scale_factor, rescale: bool,
    nms_pre: int = 1000, score_thr: float = 0.05,
    nms_iou_thr: float = 0.6, max_per_img: int = 100,
):
    """Reference ``_get_bboxes:532``: NMS score = sqrt(cls_prob * iou_prob),
    followed by score voting over the pre-NMS candidates."""
    from ...ops.nms import multiclass_nms_padded

    probs = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    iou_p = jax.nn.sigmoid(iou_logits.astype(jnp.float32))
    sel_s, sel_b = [], []
    start = 0
    for na in num_level_anchors:
        s = jax.lax.dynamic_slice_in_dim(probs, start, na)
        ip = jax.lax.dynamic_slice_in_dim(iou_p, start, na)
        bp = jax.lax.dynamic_slice_in_dim(bbox_preds, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        fused = jnp.sqrt(jnp.maximum(s * ip[:, None], 0.0))
        k = min(nms_pre, na) if nms_pre > 0 else na
        _, ti = jax.lax.top_k(jnp.max(fused, axis=-1), k)
        boxes = box_ops.delta2bbox(
            an[ti], bp[ti], cfg.target_means, cfg.target_stds,
            max_shape=img_shape,
        )
        sel_s.append(fused[ti])
        sel_b.append(boxes)
        start += na
    scores = jnp.concatenate(sel_s)
    boxes = jnp.concatenate(sel_b)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    dets, labels, valid = multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
    if cfg.score_voting:
        cand_valid = jnp.max(scores, axis=-1) > score_thr
        dets = score_voting(
            dets, labels, valid, boxes, scores, cand_valid
        )
    return dets, labels, valid
