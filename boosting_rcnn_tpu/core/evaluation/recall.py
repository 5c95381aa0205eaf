"""Proposal recall (reference ``mmdet/core/evaluation/recall.py``:
``eval_recalls`` — class-agnostic recall of gt boxes by the top-N
proposals at a set of IoU thresholds; AR@N is the mean over thresholds)."""
from __future__ import annotations

import numpy as np

DEFAULT_IOU_THRS = np.arange(0.5, 0.96, 0.05)


def _iou(a, b):
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def eval_recalls(gts, proposals, proposal_nums=(100, 300, 1000),
                 iou_thrs=None):
    """gts: per image (G, 4); proposals: per image (P, 5) score-sorted or
    unsorted (sorted here).  Returns (len(proposal_nums), len(iou_thrs))
    recall matrix."""
    iou_thrs = DEFAULT_IOU_THRS if iou_thrs is None else np.asarray(iou_thrs)
    proposal_nums = np.asarray(proposal_nums)
    all_ious = []
    for gt, prop in zip(gts, proposals):
        prop = np.asarray(prop, np.float32).reshape(-1, prop.shape[-1])
        if prop.shape[1] == 5:
            prop = prop[np.argsort(-prop[:, 4], kind="stable")]
        ious = _iou(np.asarray(gt, np.float32).reshape(-1, 4), prop[:, :4])
        all_ious.append(ious)

    recalls = np.zeros((len(proposal_nums), len(iou_thrs)))
    for i, n in enumerate(proposal_nums):
        # greedy per-gt best iou within the top-n proposals
        best = []
        for ious in all_ious:
            sub = ious[:, :n]
            g = sub.shape[0]
            covered = np.zeros(g)
            for _ in range(g):
                if sub.size == 0:
                    break
                gi, pi = np.unravel_index(np.argmax(sub), sub.shape)
                if sub[gi, pi] <= 0:
                    break
                covered[gi] = sub[gi, pi]
                sub = sub.copy()
                sub[gi, :] = -1
                sub[:, pi] = -1
            best.append(covered)
        best = np.concatenate(best) if best else np.zeros(0)
        for j, thr in enumerate(iou_thrs):
            recalls[i, j] = (best >= thr).mean() if len(best) else 0.0
    return recalls
