"""Vanilla RPN head (stock Faster R-CNN path).

Spec: reference ``mmdet/models/dense_heads/rpn_head.py:16`` +
``anchor_head.py`` targets: 3x3 conv + 1x1 cls (sigmoid objectness) and 1x1
reg branches; train with MaxIoU(0.7/0.3, min 0.3) + RandomSampler(256, pos
0.5); BCE cls + SmoothL1(beta=1/9) box losses; proposals = per-level top-k by
objectness, decode, NMS.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import AssignResult, max_iou_assign
from ...ops.nms import batched_nms_padded
from ...ops.samplers import random_sample
from ...ops.topk import select_topk


class RPNConvs(nn.Module):
    num_anchors: int = 3
    feat_channels: int = 256
    # >1 stacks extra 3x3 convs (reference rpn_head.py num_convs, used by
    # configs/strong_baselines' rpn-2conv recipes)
    num_convs: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs = [
            nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name="rpn_conv" if i == 0 else f"rpn_conv_{i}",
            )
            for i in range(self.num_convs)
        ]
        conv_cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="rpn_cls")
        conv_reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="rpn_reg")
        cls_out, reg_out = [], []
        for x in feats:
            y = x
            for conv in convs:
                y = nn.relu(conv(y))
            cls_out.append(conv_cls(y))
            reg_out.append(conv_reg(y).astype(jnp.float32))
        return cls_out, reg_out, None


@dataclasses.dataclass(frozen=True)
class RPNCfg:
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    num_samples: int = 256
    pos_fraction: float = 0.5
    smooth_l1_beta: float = 1.0 / 9.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    # the fork's ensemble cascade_retinanet configs train the RPN
    # objectness with a focal loss (reference configs/ensemble/*)
    loss_cls_type: str = "bce"  # 'bce' | 'focal'
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25


def rpn_loss(
    cfg: RPNCfg,
    cls_logits: jnp.ndarray,  # (B, A)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (B, A)
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
):
    b, a = cls_logits.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, b)

    def targets(r_, v, gb, gm):
        assign = max_iou_assign(
            anchors, v, gb, gm,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, match_low_quality=True,
        )
        res = random_sample(
            r_, assign, v, num=cfg.num_samples, pos_fraction=cfg.pos_fraction
        )
        # scatter sampled slots back onto the anchor axis
        w = jnp.zeros((a,)).at[res.inds].add(res.valid.astype(jnp.float32))
        pos = jnp.zeros((a,), bool).at[res.inds].set(res.is_pos)
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        enc = box_ops.bbox2delta(
            anchors, box_ops.take_small_table(gb, safe), cfg.target_means, cfg.target_stds, eps=1e-6
        )
        bt = jnp.where(pos[:, None], enc, 0.0)
        return pos, jnp.minimum(w, 1.0), bt

    pos, w, bt = jax.vmap(targets)(rngs, valid, gt_bboxes, gt_mask)
    num_total = jnp.maximum(jnp.sum(w), 1.0)
    if axis_name is not None:
        num_total = jnp.maximum(jax.lax.pmean(jnp.sum(w), axis_name), 1.0)

    if cfg.loss_cls_type == "focal":
        loss_cls = (
            L.sigmoid_focal_loss(
                cls_logits.reshape(-1, 1),
                pos.reshape(-1, 1).astype(jnp.float32),
                gamma=cfg.focal_gamma,
                alpha=cfg.focal_alpha,
                weight=w.reshape(-1, 1),
                avg_factor=num_total,
            )
            * cfg.loss_cls_weight
        )
    else:
        loss_cls = (
            L.binary_cross_entropy_loss(
                cls_logits.reshape(-1),
                pos.reshape(-1).astype(jnp.float32),
                weight=w.reshape(-1),
                avg_factor=num_total,
            )
            * cfg.loss_cls_weight
        )
    posf = pos.reshape(-1, 1).astype(jnp.float32)
    loss_bbox = (
        L.smooth_l1_loss(
            bbox_preds.reshape(-1, 4),
            bt.reshape(-1, 4),
            weight=posf,
            beta=cfg.smooth_l1_beta,
            avg_factor=num_total,
        )
        * cfg.loss_bbox_weight
    )
    return {"loss_rpn_cls": loss_cls, "loss_rpn_bbox": loss_bbox}


def rpn_proposals(
    cfg: RPNCfg,
    cls_logits: jnp.ndarray,  # (A,)
    bbox_preds: jnp.ndarray,  # (A, 4)
    anchors: jnp.ndarray,
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,
    nms_pre: int = 1000,
    max_per_img: int = 1000,
    nms_iou_thr: float = 0.7,
    min_bbox_size: float = 0.0,
    approx_topk: bool = False,
    topk_recall_target: float = 0.95,
):
    """Single-image proposal generation (``rpn_head.py`` ``_get_bboxes_single``).

    ``approx_topk`` opts in to the TPU approximate per-level selection
    (ops/topk.py) — a documented deviation from exact top-k, default off.
    """
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    sel_s, sel_b, sel_a, sel_i = [], [], [], []
    start = 0
    for lvl, na in enumerate(num_level_anchors):
        s = jax.lax.dynamic_slice_in_dim(scores, start, na)
        bp = jax.lax.dynamic_slice_in_dim(bbox_preds, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        ts, ti = select_topk(
            s, k, approx=approx_topk, recall_target=topk_recall_target
        )
        sel_s.append(ts)
        sel_b.append(bp[ti])
        sel_a.append(an[ti])
        sel_i.append(jnp.full((k,), lvl, jnp.int32))
        start += na
    s = jnp.concatenate(sel_s)
    d = jnp.concatenate(sel_b)
    an = jnp.concatenate(sel_a)
    ids = jnp.concatenate(sel_i)
    props = box_ops.delta2bbox(an, d, cfg.target_means, cfg.target_stds, max_shape=img_shape)
    wv = props[:, 2] - props[:, 0]
    hv = props[:, 3] - props[:, 1]
    ok = (wv > min_bbox_size) & (hv > min_bbox_size)
    boxes, out_s, valid, _ = batched_nms_padded(
        props, s, ids, nms_iou_thr, max_per_img, valid=ok
    )
    return boxes, jnp.where(valid, out_s, 0.0), valid
