"""Target assignment on padded, fixed-shape tensors.

The reference assigns per image with dynamic box counts
(``mmdet/core/bbox/assigners/max_iou_assigner.py:61-210``); here every image
carries ``(N,)`` candidate boxes with a validity mask and ``(G,)`` padded gt
boxes with a gt mask, and assignment is a single fixed-shape computation that
``jax.vmap``s over the batch.

Assignment encoding matches the reference: ``-1`` ignore, ``0`` negative,
``i + 1`` = matched to gt ``i``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .box_ops import bbox_overlaps

__all__ = ["AssignResult", "max_iou_assign", "atss_assign", "center_region_assign", "uniform_assign", "point_assign"]


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray  # (N,) int32: -1 ignore / 0 neg / i+1 pos
    max_overlaps: jnp.ndarray  # (N,) float32
    labels: jnp.ndarray  # (N,) int32 assigned class or -1


def max_iou_assign(
    boxes: jnp.ndarray,
    box_valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_labels: Optional[jnp.ndarray] = None,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    min_pos_iou: float = 0.0,
    match_low_quality: bool = True,
    gt_max_assign_all: bool = True,
    gt_bboxes_ignore: Optional[jnp.ndarray] = None,
    ignore_mask: Optional[jnp.ndarray] = None,
    ignore_iof_thr: float = -1.0,
) -> AssignResult:
    """Masked MaxIoUAssigner (reference ``max_iou_assigner.py:128``
    ``assign_wrt_overlaps``), single image.

    boxes: (N, 4); box_valid: (N,) bool; gt_bboxes: (G, 4) padded;
    gt_mask: (G,) bool; gt_labels: (G,) int32 or None.
    """
    overlaps = bbox_overlaps(gt_bboxes, boxes)  # (G, N)
    return assign_wrt_overlaps(
        overlaps, boxes, box_valid, gt_bboxes, gt_mask, gt_labels,
        pos_iou_thr, neg_iou_thr, min_pos_iou, match_low_quality,
        gt_max_assign_all, gt_bboxes_ignore, ignore_mask, ignore_iof_thr,
    )


def assign_wrt_overlaps(
    overlaps: jnp.ndarray,  # (G, N) precomputed IoU
    boxes: jnp.ndarray,
    box_valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_labels: Optional[jnp.ndarray] = None,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    min_pos_iou: float = 0.0,
    match_low_quality: bool = True,
    gt_max_assign_all: bool = True,
    gt_bboxes_ignore: Optional[jnp.ndarray] = None,
    ignore_mask: Optional[jnp.ndarray] = None,
    ignore_iof_thr: float = -1.0,
) -> AssignResult:
    """``assign_wrt_overlaps`` on a caller-supplied IoU matrix — shared by
    MaxIoU and ApproxMaxIoU (reference ``approx_max_iou_assigner.py:105``:
    the approx assigner maxes the IoU over each square's approx set first,
    then applies the identical rules)."""
    n = boxes.shape[0]
    g = gt_bboxes.shape[0]
    # Invalid gt rows must never win an argmax; invalid boxes must never be a
    # gt's best match.  (Padded gt rows are all-zero so their IoU is already
    # 0, but mask explicitly for robustness.)
    overlaps = jnp.where(gt_mask[:, None], overlaps, 0.0)
    overlaps_boxmasked = jnp.where(box_valid[None, :], overlaps, -1.0)

    # Per-box best gt (over valid gts only — padded rows are 0, ties resolve
    # to the first index exactly like torch.max).
    max_overlaps = jnp.max(overlaps, axis=0)  # (N,)
    argmax_overlaps = jnp.argmax(overlaps, axis=0)
    # Per-gt best box over valid boxes.
    gt_max_overlaps = jnp.max(overlaps_boxmasked, axis=1)  # (G,)

    assigned = jnp.full((n,), -1, dtype=jnp.int32)
    # 2. negatives
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    # 3. positives
    pos = max_overlaps >= pos_iou_thr
    assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

    # 4. low-quality matching: for each gt (in order, later overwrites
    #    earlier), boxes achieving the gt's max IoU (>= min_pos_iou) are
    #    forced positive.  Vectorised: each box takes the *last* eligible gt.
    if match_low_quality:
        eligible = (
            (overlaps == gt_max_overlaps[:, None])
            & (gt_max_overlaps >= min_pos_iou)[:, None]
            & gt_mask[:, None]
        )
        if not gt_max_assign_all:
            best_box = jnp.argmax(overlaps_boxmasked, axis=1)  # (G,)
            only_best = jax.nn.one_hot(best_box, n, dtype=bool)
            eligible = eligible & only_best
        gt_idx = jnp.arange(g, dtype=jnp.int32)
        last_eligible = jnp.max(
            jnp.where(eligible, gt_idx[:, None], -1), axis=0
        )  # (N,)
        assigned = jnp.where(last_eligible >= 0, last_eligible + 1, assigned)

    # Ignore regions (iof against ignore boxes) — reference step before
    # assign_wrt_overlaps (``max_iou_assigner.py:108-120``).
    if ignore_iof_thr > 0 and gt_bboxes_ignore is not None:
        iof = bbox_overlaps(boxes, gt_bboxes_ignore, mode="iof")  # (N, Gi)
        if ignore_mask is not None:
            iof = jnp.where(ignore_mask[None, :], iof, 0.0)
        ignore_hit = jnp.max(iof, axis=1) > ignore_iof_thr
        assigned = jnp.where(ignore_hit, -1, assigned)

    assigned = jnp.where(box_valid, assigned, -1)

    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], -1).astype(jnp.int32)
    else:
        labels = jnp.full((n,), -1, dtype=jnp.int32)
    return AssignResult(assigned, max_overlaps, labels)


def atss_assign(
    boxes: jnp.ndarray,
    box_valid: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_labels: Optional[jnp.ndarray] = None,
    topk: int = 9,
) -> AssignResult:
    """ATSS assignment (reference ``atss_assigner.py``), single image.

    For each gt: select ``topk`` closest (center distance) anchors per level,
    compute the IoU mean+std over those candidates as an adaptive threshold,
    keep candidates above it whose center lies inside the gt box; each anchor
    goes to the gt with highest IoU among its claimants.
    """
    n = boxes.shape[0]
    g = gt_bboxes.shape[0]
    overlaps = bbox_overlaps(gt_bboxes, boxes)  # (G, N)
    overlaps = jnp.where(gt_mask[:, None] & box_valid[None, :], overlaps, 0.0)

    acx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    acy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    dist = jnp.sqrt((acx[None] - gcx[:, None]) ** 2 + (acy[None] - gcy[:, None]) ** 2)
    dist = jnp.where(box_valid[None, :], dist, jnp.inf)  # (G, N)

    # Per-level top-k candidates by distance.
    is_cand = jnp.zeros((g, n), dtype=bool)
    start = 0
    for na in num_level_anchors:
        lvl_dist = jax.lax.dynamic_slice_in_dim(dist, start, na, axis=1)
        k = min(topk, na)
        _, idx = jax.lax.top_k(-lvl_dist, k)  # (G, k) closest
        lvl_mask = jnp.zeros((g, na), dtype=bool)
        lvl_mask = lvl_mask.at[jnp.arange(g)[:, None], idx].set(True)
        is_cand = jax.lax.dynamic_update_slice_in_dim(
            is_cand, lvl_mask, start, axis=1
        )
        start += na
    is_cand = is_cand & box_valid[None, :]

    # Adaptive threshold = mean + std of candidate IoUs per gt.  torch
    # ``.std()`` in the reference ATSSAssigner is unbiased (n-1).
    cnt = jnp.maximum(jnp.sum(is_cand, axis=1), 1)
    cand_iou = jnp.where(is_cand, overlaps, 0.0)
    mean = jnp.sum(cand_iou, axis=1) / cnt
    var = jnp.sum(
        jnp.where(is_cand, (overlaps - mean[:, None]) ** 2, 0.0), axis=1
    ) / jnp.maximum(cnt - 1, 1)
    thr = mean + jnp.sqrt(var)  # (G,)

    # Center-inside-gt test (reference requires all 4 margins > 0.01).
    l = acx[None, :] - gt_bboxes[:, 0:1]
    t = acy[None, :] - gt_bboxes[:, 1:2]
    r = gt_bboxes[:, 2:3] - acx[None, :]
    b = gt_bboxes[:, 3:4] - acy[None, :]
    inside = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > 0.01

    pos = is_cand & (overlaps >= thr[:, None]) & inside & gt_mask[:, None]
    # Each anchor -> claiming gt with max IoU.
    claimed_iou = jnp.where(pos, overlaps, -jnp.inf)
    best_gt = jnp.argmax(claimed_iou, axis=0).astype(jnp.int32)
    has = jnp.any(pos, axis=0)
    assigned = jnp.where(has, best_gt + 1, 0)
    assigned = jnp.where(box_valid, assigned, -1).astype(jnp.int32)
    max_overlaps = jnp.where(has, jnp.max(claimed_iou, axis=0), jnp.max(overlaps, axis=0))

    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], -1).astype(jnp.int32)
    else:
        labels = jnp.full((n,), -1, dtype=jnp.int32)
    return AssignResult(assigned, max_overlaps, labels)


def hungarian_assign(
    cls_logits: jnp.ndarray,  # (Q, C) predicted class logits
    pred_boxes: jnp.ndarray,  # (Q, 4) xyxy, absolute coords
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,)
    gt_mask: jnp.ndarray,  # (G,)
    img_shape: jnp.ndarray,  # (2,) H, W for normalised L1 cost
    cls_weight: float = 1.0,
    bbox_weight: float = 5.0,
    iou_weight: float = 2.0,
    cls_cost_type: str = "softmax",
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> AssignResult:
    """Hungarian (bipartite) assignment for set-prediction heads (reference
    ``mmdet/core/bbox/assigners/hungarian_assigner.py`` + match costs
    ``core/bbox/match_costs``: ClsSoftmaxCost, BBoxL1Cost on normalised
    cxcywh, IoUCost with GIoU).

    Fixed shapes: padded gt rows get a prohibitive cost so the solver never
    prefers them, and their matches are dropped from the result.
    """
    gt_mask = jnp.asarray(gt_mask)
    gt_labels = jnp.asarray(gt_labels)
    q = cls_logits.shape[0]
    g = gt_bboxes.shape[0]
    if cls_cost_type == "focal":
        # FocalLossCost (reference ``core/bbox/match_costs/match_cost.py``):
        # pos_cost - neg_cost of the gt class under sigmoid focal weighting
        p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        eps = 1e-8
        neg = -jnp.log(1 - p + eps) * (1 - focal_alpha) * p**focal_gamma
        pos = -jnp.log(p + eps) * focal_alpha * (1 - p) ** focal_gamma
        cls_cost = (pos - neg)[:, gt_labels]  # (Q, G)
    else:
        # classification cost: -softmax prob of the gt class
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        cls_cost = -probs[:, gt_labels]  # (Q, G)
    # L1 cost on normalised cxcywh
    h = img_shape[0]
    w = img_shape[1]
    norm = jnp.stack([w, h, w, h]).astype(jnp.float32)

    def to_cxcywh(b):
        return jnp.stack(
            [
                (b[..., 0] + b[..., 2]) / 2,
                (b[..., 1] + b[..., 3]) / 2,
                b[..., 2] - b[..., 0],
                b[..., 3] - b[..., 1],
            ],
            axis=-1,
        )

    pn = to_cxcywh(pred_boxes) / norm
    gn = to_cxcywh(gt_bboxes) / norm
    bbox_cost = jnp.sum(jnp.abs(pn[:, None] - gn[None, :]), axis=-1)
    iou_cost = -bbox_overlaps(pred_boxes, gt_bboxes, mode="giou")
    cost = (
        cls_weight * cls_cost + bbox_weight * bbox_cost + iou_weight * iou_cost
    )
    BIG_COST = 1e6
    cost = jnp.where(gt_mask[None, :], cost, BIG_COST)

    from optax import assignment as _assignment

    rows, cols = _assignment.hungarian_algorithm(cost)
    # rows[i] matched to cols[i]; build per-query assignment
    assigned = jnp.zeros((q,), jnp.int32)
    valid_match = gt_mask[cols]
    assigned = assigned.at[rows].set(
        jnp.where(valid_match, cols + 1, 0).astype(jnp.int32)
    )
    safe = jnp.clip(assigned - 1, 0, g - 1)
    labels = jnp.where(assigned > 0, gt_labels[safe], -1).astype(jnp.int32)
    max_ov = jnp.zeros((q,), jnp.float32)
    return AssignResult(assigned, max_ov, labels)


def center_region_assign(
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (A,)
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,)
    gt_labels: Optional[jnp.ndarray] = None,
    pos_scale: float = 0.2,
    ignore_scale: float = 0.5,
) -> AssignResult:
    """CenterRegionAssigner (reference ``center_region_assigner.py:72``,
    the FSAF effective/ignore-region rule): an anchor is positive for a gt
    when its center lies in the ``pos_scale``-shrunk gt box; centers in the
    ``ignore_scale``-shrunk box (but not the positive region) are ignored
    (gt_inds -1).  Overlaps resolve by gt priority = smaller area first."""
    a = anchors.shape[0]
    g = gt_bboxes.shape[0]
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5

    def shrink(boxes, scale):
        bcx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        bcy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        hw = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
        hh = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
        return jnp.stack([bcx - hw, bcy - hh, bcx + hw, bcy + hh], -1)

    def inside(regions):
        return (
            (cx[None, :] >= regions[:, 0:1])
            & (cx[None, :] <= regions[:, 2:3])
            & (cy[None, :] >= regions[:, 1:2])
            & (cy[None, :] <= regions[:, 3:4])
        )  # (G, A)

    in_pos = inside(shrink(gt_bboxes, pos_scale)) & gt_mask[:, None]
    in_ign = inside(shrink(gt_bboxes, ignore_scale)) & gt_mask[:, None]
    in_pos = in_pos & valid[None, :]
    in_ign = in_ign & valid[None, :]

    area = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * (
        gt_bboxes[:, 3] - gt_bboxes[:, 1]
    )
    big = jnp.float32(1e18)
    prio = jnp.where(in_pos, area[:, None], big)  # (G, A)
    best_gt = jnp.argmin(prio, axis=0).astype(jnp.int32)
    has_pos = jnp.any(in_pos, axis=0)
    has_ign = jnp.any(in_ign, axis=0)
    gt_inds = jnp.where(
        has_pos, best_gt + 1, jnp.where(has_ign, -1, 0)
    ).astype(jnp.int32)
    overlaps = jnp.where(has_pos, 1.0, 0.0)
    if gt_labels is None:
        labels = jnp.zeros((a,), jnp.int32)
    else:
        labels = jnp.where(has_pos, gt_labels[best_gt], -1).astype(jnp.int32)
    return AssignResult(gt_inds, overlaps, labels)


def uniform_assign(
    pred_boxes: jnp.ndarray,  # (A, 4) decoded predictions
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (A,)
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,)
    gt_labels: Optional[jnp.ndarray] = None,
    match_times: int = 4,
    pos_ignore_thr: float = 0.15,
    neg_ignore_thr: float = 0.7,
) -> AssignResult:
    """UniformAssigner (reference ``uniform_assigner.py``, YOLOF): each gt
    takes its ``match_times`` closest anchors AND closest predictions by
    cxcywh L1 distance; positives with anchor-IoU < ``pos_ignore_thr``
    are ignored, negatives whose prediction-IoU exceeds
    ``neg_ignore_thr`` are ignored.  Later gts overwrite earlier (torch
    scatter semantics)."""
    a = anchors.shape[0]
    g = gt_bboxes.shape[0]

    def cxcywh(b):
        return jnp.stack(
            [
                (b[:, 0] + b[:, 2]) * 0.5, (b[:, 1] + b[:, 3]) * 0.5,
                b[:, 2] - b[:, 0], b[:, 3] - b[:, 1],
            ],
            axis=-1,
        )

    pb = cxcywh(pred_boxes)
    ab = cxcywh(anchors)
    gb = cxcywh(gt_bboxes)
    big = jnp.float32(1e12)
    cost_pred = jnp.sum(jnp.abs(pb[:, None] - gb[None]), axis=-1)  # (A, G)
    cost_anchor = jnp.sum(jnp.abs(ab[:, None] - gb[None]), axis=-1)
    cost_pred = jnp.where(valid[:, None], cost_pred, big)
    cost_anchor = jnp.where(valid[:, None], cost_anchor, big)

    k = min(match_times, a)
    _, idx_p = jax.lax.top_k(-cost_pred.T, k)  # (G, k) closest preds
    _, idx_a = jax.lax.top_k(-cost_anchor.T, k)
    idxs = jnp.concatenate([idx_p, idx_a], axis=1)  # (G, 2k)

    pred_iou = bbox_overlaps(pred_boxes, gt_bboxes)  # (A, G)
    pred_iou = jnp.where(gt_mask[None, :], pred_iou, 0.0)
    anchor_iou = jnp.where(
        gt_mask[None, :], bbox_overlaps(anchors, gt_bboxes), 0.0
    )

    assigned = jnp.zeros((a,), jnp.int32)
    # negatives whose best prediction IoU is high -> ignore
    assigned = jnp.where(jnp.max(pred_iou, axis=1) > neg_ignore_thr, -1,
                         assigned)
    # scatter positives gt by gt (later gts overwrite, like torch)
    gt_ids = jnp.broadcast_to(jnp.arange(g)[:, None], idxs.shape)
    flat_idx = idxs.reshape(-1)
    flat_gt = gt_ids.reshape(-1)
    flat_iou = anchor_iou[flat_idx, flat_gt]
    keep = (flat_iou >= pos_ignore_thr) & gt_mask[flat_gt]
    code = jnp.where(keep, flat_gt + 1, -1)
    code = jnp.where(gt_mask[flat_gt], code, 0)  # padded gts: no-op later
    # sequential overwrite via scatter (later entries win)
    upd = jnp.where(gt_mask[flat_gt], code, assigned[flat_idx])
    assigned = assigned.at[flat_idx].set(upd)
    assigned = jnp.where(valid, assigned, -1)

    max_ov = jnp.max(anchor_iou, axis=1)
    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], -1).astype(jnp.int32)
    else:
        labels = jnp.full((a,), -1, jnp.int32)
    return AssignResult(assigned, max_ov, labels)


def point_assign(
    points: jnp.ndarray,  # (P, 3): x, y, stride
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,)
    gt_labels: Optional[jnp.ndarray] = None,
    scale: float = 4.0,
    pos_num: int = 1,
) -> AssignResult:
    """PointAssigner (reference ``point_assigner.py``, RepPoints init
    stage): each gt picks the ``pos_num`` nearest points (wh-normalised
    distance) on its scale-matched pyramid level; a point claimed by
    several gts goes to the closest one."""
    p = points.shape[0]
    g = gt_bboxes.shape[0]
    xy = points[:, :2]
    lvl = jnp.round(jnp.log2(jnp.maximum(points[:, 2], 1.0))).astype(jnp.int32)
    lvl_min = jnp.min(lvl)
    lvl_max = jnp.max(lvl)
    gxy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) * 0.5
    gwh = jnp.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6, None)
    glvl = (
        (jnp.log2(gwh[:, 0] / scale) + jnp.log2(gwh[:, 1] / scale)) / 2.0
    ).astype(jnp.int32)
    glvl = jnp.clip(glvl, lvl_min, lvl_max)

    dist = jnp.linalg.norm(
        (xy[None, :, :] - gxy[:, None, :]) / gwh[:, None, :], axis=-1
    )  # (G, P)
    big = jnp.float32(1e9)
    dist = jnp.where(
        (lvl[None, :] == glvl[:, None]) & gt_mask[:, None], dist, big
    )
    k = min(pos_num, p)
    neg_top, idx = jax.lax.top_k(-dist, k)  # (G, k) nearest
    claim_dist = jnp.full((g, p), big)
    claim_dist = jax.vmap(
        lambda row, ix, vals: row.at[ix].set(vals)
    )(claim_dist, idx, -neg_top)
    claim_dist = jnp.where(claim_dist < big / 2, claim_dist, big)
    best_gt = jnp.argmin(claim_dist, axis=0).astype(jnp.int32)
    best_d = jnp.min(claim_dist, axis=0)
    has = best_d < big / 2
    assigned = jnp.where(has, best_gt + 1, 0).astype(jnp.int32)
    if gt_labels is not None:
        labels = jnp.where(has, gt_labels[best_gt], -1).astype(jnp.int32)
    else:
        labels = jnp.full((p,), -1, jnp.int32)
    return AssignResult(assigned, jnp.where(has, 1.0, 0.0), labels)


def grid_assign(
    boxes: jnp.ndarray,
    box_responsible: jnp.ndarray,  # (N,) bool: YOLO responsible-cell flag
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    gt_labels: Optional[jnp.ndarray] = None,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.0,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
) -> AssignResult:
    """GridAssigner (reference ``grid_assigner.py``): MaxIoU rules but
    positives restricted to grid-responsible anchors (the YOLO cell that
    contains the gt center)."""
    n = boxes.shape[0]
    g = gt_bboxes.shape[0]
    overlaps = bbox_overlaps(gt_bboxes, boxes)
    overlaps = jnp.where(gt_mask[:, None], overlaps, 0.0)
    max_overlaps = jnp.max(overlaps, axis=0)
    argmax = jnp.argmax(overlaps, axis=0)
    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps <= neg_iou_thr), 0, assigned)
    pos = (max_overlaps >= pos_iou_thr) & box_responsible
    assigned = jnp.where(pos, argmax.astype(jnp.int32) + 1, assigned)
    # per-gt best among responsible boxes (>= min_pos_iou)
    ov_resp = jnp.where(box_responsible[None, :], overlaps, -1.0)
    gt_max = jnp.max(ov_resp, axis=1)
    eligible = (
        (ov_resp == gt_max[:, None])
        & (gt_max >= min_pos_iou)[:, None]
        & gt_mask[:, None]
        & box_responsible[None, :]
    )
    if not gt_max_assign_all:
        only_best = jax.nn.one_hot(jnp.argmax(ov_resp, axis=1), n,
                                   dtype=bool)
        eligible = eligible & only_best
    gt_idx = jnp.arange(g, dtype=jnp.int32)
    last = jnp.max(jnp.where(eligible, gt_idx[:, None], -1), axis=0)
    assigned = jnp.where(last >= 0, last + 1, assigned)
    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], -1).astype(
            jnp.int32)
    else:
        labels = jnp.full((n,), -1, jnp.int32)
    return AssignResult(assigned, max_overlaps, labels)


def region_assign(
    anchors: jnp.ndarray,  # (A, 4) concatenated over levels
    num_level_anchors,  # per-level counts (anchors per loc folded in)
    strides,  # per-level strides
    anchor_scale: float,
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    center_ratio: float = 0.2,
    ignore_ratio: float = 0.5,
    gt_labels: Optional[jnp.ndarray] = None,
) -> AssignResult:
    """RegionAssigner (reference ``region_assigner.py``, Cascade RPN):
    each gt claims the anchors whose centers fall in its center region at
    its scale-mapped level; the wider ignore region (own + adjacent
    levels) is marked -1.  Later gts overwrite earlier (reference loop
    order)."""
    a = anchors.shape[0]
    g = gt_bboxes.shape[0]
    num_lvls = len(num_level_anchors)
    scale = jnp.sqrt(jnp.maximum(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0])
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1e-6))
    min_size = float(anchor_scale * strides[0])
    lvl = jnp.clip(
        jnp.floor(jnp.log2(scale) - jnp.log2(min_size) + 0.5),
        0, num_lvls - 1).astype(jnp.int32)
    # anchor level id + centers
    lvl_id = jnp.concatenate([
        jnp.full((n_,), i, jnp.int32)
        for i, n_ in enumerate(num_level_anchors)
    ])
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2

    def region(gt, r):
        x1 = gt[:, 0] * (1 - r) + gt[:, 2] * r
        y1 = gt[:, 1] * (1 - r) + gt[:, 3] * r
        x2 = gt[:, 0] * r + gt[:, 2] * (1 - r)
        y2 = gt[:, 1] * r + gt[:, 3] * (1 - r)
        return x1, y1, x2, y2

    def inside(reg):
        x1, y1, x2, y2 = reg
        return (
            (cx[None, :] >= x1[:, None]) & (cx[None, :] <= x2[:, None])
            & (cy[None, :] >= y1[:, None]) & (cy[None, :] <= y2[:, None])
        )

    ctr = inside(region(gt_bboxes, r1)) & gt_mask[:, None] \
        & (lvl_id[None, :] == lvl[:, None])
    adj = (jnp.abs(lvl_id[None, :] - lvl[:, None]) <= 1)
    ign = inside(region(gt_bboxes, r2)) & gt_mask[:, None] & adj
    gt_idx = jnp.arange(g, dtype=jnp.int32)
    last_pos = jnp.max(jnp.where(ctr, gt_idx[:, None], -1), axis=0)
    any_ign = jnp.any(ign, axis=0)
    assigned = jnp.where(any_ign, -1, 0)
    assigned = jnp.where(last_pos >= 0, last_pos + 1, assigned)
    if gt_labels is not None:
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(assigned > 0, gt_labels[safe], -1).astype(
            jnp.int32)
    else:
        labels = jnp.full((a,), -1, jnp.int32)
    return AssignResult(assigned, jnp.zeros((a,), jnp.float32), labels)
