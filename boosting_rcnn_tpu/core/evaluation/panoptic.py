"""Panoptic Quality (PQ) evaluation, host-side numpy.

Reference surface: ``mmdet/datasets/coco_panoptic.py:120`` evaluates with
panopticapi's ``pq_compute``; this is a self-contained implementation of
the same statistic: segments of the same class match when IoU > 0.5
(unique by construction), PQ = sum(IoU_TP) / (TP + FP/2 + FN/2), with the
standard void handling (predicted segments mostly made of void pixels do
not count as FP)."""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..post_processing.panoptic_fusion import INSTANCE_OFFSET


def _segments(pan: np.ndarray):
    """pan map (H, W) with ids ``cls + inst * INSTANCE_OFFSET`` ->
    {seg_id: (cls, mask)}."""
    out = {}
    for sid in np.unique(pan):
        out[int(sid)] = (int(sid % INSTANCE_OFFSET), pan == sid)
    return out


def pq_compute(
    preds: Sequence[np.ndarray],
    gts: Sequence[np.ndarray],
    num_classes: int,
    void_id: int,
) -> Dict[str, float]:
    """Per-class accumulation over images; returns PQ/SQ/RQ (+ counts)."""
    iou_sum = np.zeros(num_classes)
    tp = np.zeros(num_classes, np.int64)
    fp = np.zeros(num_classes, np.int64)
    fn = np.zeros(num_classes, np.int64)

    for pan_pred, pan_gt in zip(preds, gts):
        pred_segs = _segments(pan_pred)
        gt_segs = _segments(pan_gt)
        void_mask = (pan_gt % INSTANCE_OFFSET) == void_id
        gt_matched = set()
        pred_matched = set()
        for pid, (pcls, pmask) in pred_segs.items():
            if pcls == void_id or pcls >= num_classes:
                continue
            best_iou, best_gid = 0.0, None
            for gid, (gcls, gmask) in gt_segs.items():
                if gcls != pcls or gid in gt_matched:
                    continue
                inter = np.logical_and(pmask, gmask).sum()
                if inter == 0:
                    continue
                union = pmask.sum() + gmask.sum() - inter - np.logical_and(
                    pmask, void_mask
                ).sum()
                iou = inter / max(union, 1)
                if iou > best_iou:
                    best_iou, best_gid = iou, gid
            if best_iou > 0.5:
                gt_matched.add(best_gid)
                pred_matched.add(pid)
                tp[pcls] += 1
                iou_sum[pcls] += best_iou
        for pid, (pcls, pmask) in pred_segs.items():
            if pcls == void_id or pcls >= num_classes or pid in pred_matched:
                continue
            # void rule: predictions mostly covering void are not FPs
            if np.logical_and(pmask, void_mask).sum() / max(pmask.sum(), 1) > 0.5:
                continue
            fp[pcls] += 1
        for gid, (gcls, gmask) in gt_segs.items():
            if gcls == void_id or gcls >= num_classes:
                continue
            if gid not in gt_matched:
                fn[gcls] += 1

    denom = tp + fp / 2.0 + fn / 2.0
    present = denom > 0
    pq_c = np.where(present, iou_sum / np.maximum(denom, 1e-9), 0.0)
    sq_c = np.where(tp > 0, iou_sum / np.maximum(tp, 1), 0.0)
    rq_c = np.where(present, tp / np.maximum(denom, 1e-9), 0.0)
    n = max(int(present.sum()), 1)
    return {
        "PQ": float(pq_c[present].sum() / n) if present.any() else 0.0,
        "SQ": float(sq_c[present].sum() / n) if present.any() else 0.0,
        "RQ": float(rq_c[present].sum() / n) if present.any() else 0.0,
        "num_present_classes": int(present.sum()),
    }
