"""Heuristic panoptic fusion (reference
``seg_heads/panoptic_fusion_heads/heuristic_fusion_head.py:10``), host-side.

Lays instance masks in score order (skipping masks that mostly overlap
already-pasted ones), fills the rest from the stuff argmax, and removes
stuff segments smaller than ``stuff_area_limit``.  Output encoding matches
mmdet: ``class_id + instance_id * INSTANCE_OFFSET``."""
from __future__ import annotations

import numpy as np

INSTANCE_OFFSET = 1000


def heuristic_fuse(
    det_scores: np.ndarray,  # (K,)
    det_labels: np.ndarray,  # (K,) thing class ids [0, num_things)
    masks: np.ndarray,  # (K, H, W) binary instance masks
    seg_logits: np.ndarray,  # (H, W, num_stuff + 1); channel num_stuff = things
    num_things: int,
    overlap_thr: float = 0.5,
    stuff_area_limit: int = 4096,
) -> np.ndarray:
    h, w = seg_logits.shape[:2]
    id_map = np.zeros((h, w), np.int64)
    kept_labels = []
    order = np.argsort(-det_scores)
    instance_id = 1
    for idx in order:
        m = masks[idx].astype(bool)
        area = m.sum()
        if area == 0:
            continue
        pasted = id_map > 0
        if (m & pasted).sum() / (area + 1e-5) > overlap_thr:
            continue
        id_map[m & ~pasted] = instance_id
        kept_labels.append(int(det_labels[idx]))
        instance_id += 1

    seg = seg_logits.argmax(-1)  # [0, num_stuff]; num_stuff = merged things
    pan = seg + num_things  # stuff ids shifted behind the thing range
    for i, cls in enumerate(kept_labels):
        pan[id_map == (i + 1)] = cls + (i + 1) * INSTANCE_OFFSET
    # drop tiny stuff segments -> void (mmdet: num_things + num_stuff)
    ids, counts = np.unique(pan % INSTANCE_OFFSET, return_counts=True)
    void = seg_logits.shape[-1] - 1 + num_things
    for cid, cnt in zip(ids, counts):
        if cid >= num_things and cnt < stuff_area_limit:
            pan[(pan % INSTANCE_OFFSET) == cid] = void
    return pan
