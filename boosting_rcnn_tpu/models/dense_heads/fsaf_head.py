"""FSAF head (reference ``mmdet/models/dense_heads/fsaf_head.py:15`` +
``mmdet/models/detectors/fsaf.py``).

Anchor-free RetinaNet branch with Online Feature Selection: each level
assigns positives with the CenterRegionAssigner (0.2 effective / 0.5 ignore
regions, smaller-gt priority), regresses TBLR distances (ReLU energies,
IoU loss on decoded boxes), and — the FSAF signature move — every gt keeps
only the level where its summed cls+reg loss is minimal; its positives at
the other levels are dropped from the loss.

TPU design: all levels' per-anchor losses are computed unreduced anyway,
so the reference's collect/argmin/reweight python passes become one
segment-sum over (gt, level) and a mask."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import center_region_assign
from ...ops.coders import bboxes2tblr, tblr2bboxes
from ...ops.nms import multiclass_nms_padded
from ..layers import ConvModule


class FSAFConvs(nn.Module):
    """RetinaNet towers; the reg branch emits positive TBLR energies
    (reference ``forward_single``: ``self.relu(self.retina_reg(...))``)."""

    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [
            ConvModule(self.feat_channels, 3, act="relu", dtype=self.dtype,
                       name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            ConvModule(self.feat_channels, 3, act="relu", dtype=self.dtype,
                       name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="retina_cls",
        )
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="retina_reg")
        cls_out, reg_out = [], []
        for x in feats:
            c = x
            r = x
            for conv in cls_convs:
                c = conv(c)
            for conv in reg_convs:
                r = conv(r)
            cls_out.append(conv_cls(c).astype(jnp.float32))
            reg_out.append(
                jnp.maximum(
                    nn.relu(conv_reg(r).astype(jnp.float32)), 1e-4
                )
            )
        return cls_out, reg_out


@dataclasses.dataclass(frozen=True)
class FSAFCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_scale: float = 0.2
    ignore_scale: float = 0.5
    tblr_normalizer: float = 4.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0


def fsaf_loss(
    cfg: FSAFCfg,
    cls_logits: jnp.ndarray,  # (B, A, C)
    bbox_energies: jnp.ndarray,  # (B, A, 4) positive TBLR
    anchors: jnp.ndarray,  # (A, 4) stride-sized squares
    valid: jnp.ndarray,  # (B, A)
    num_level_anchors: Tuple[int, ...],
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, a, c = cls_logits.shape
    g = gt_bboxes.shape[1]
    nl = len(num_level_anchors)
    # per-anchor level index
    lvl_idx = jnp.concatenate(
        [jnp.full((na,), i, jnp.int32) for i, na in enumerate(num_level_anchors)]
    )

    def targets(v, gb, gl, gm):
        assign = center_region_assign(
            anchors, v, gb, gm, gt_labels=gl,
            pos_scale=cfg.pos_scale, ignore_scale=cfg.ignore_scale,
        )
        return assign.gt_inds, assign.labels

    gt_inds, labels = jax.vmap(targets)(valid, gt_bboxes, gt_labels, gt_mask)
    pos = gt_inds > 0
    neg = gt_inds == 0
    safe_gt = jnp.clip(gt_inds - 1, 0, g - 1)  # (B, A)

    # per-anchor unreduced losses
    lab = jnp.where(pos, labels, cfg.num_classes)
    onehot = jax.nn.one_hot(lab.reshape(-1), c, dtype=jnp.float32)
    cls_elem = L.sigmoid_focal_loss(
        cls_logits.reshape(-1, c), onehot,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, reduction="none",
    ).sum(-1).reshape(b, a)

    matched = jnp.take_along_axis(
        gt_bboxes, safe_gt[..., None], axis=1
    )  # (B, A, 4)
    anchors_b = jnp.broadcast_to(anchors[None], (b, a, 4))
    decoded = tblr2bboxes(
        anchors_b.reshape(-1, 4), bbox_energies.reshape(-1, 4),
        normalizer=cfg.tblr_normalizer,
    ).reshape(b, a, 4)
    safe_target = jnp.where(pos[..., None], matched, decoded)
    reg_elem = L.iou_loss(
        decoded.reshape(-1, 4),
        jax.lax.stop_gradient(safe_target.reshape(-1, 4)),
        reduction="none",
    ).reshape(b, a) * pos.astype(jnp.float32)

    # --- online feature selection: per (image, gt, level) summed loss ---
    # one-hot scatter: contribution of each positive anchor to its gt/level
    gt_onehot = jax.nn.one_hot(safe_gt, g, dtype=jnp.float32) * pos[
        ..., None
    ].astype(jnp.float32)  # (B, A, G)
    lvl_onehot = jax.nn.one_hot(lvl_idx, nl, dtype=jnp.float32)  # (A, NL)
    per = jnp.einsum(
        "bag,al->bgl", gt_onehot * (cls_elem + reg_elem)[..., None],
        lvl_onehot,
    )  # (B, G, NL) summed loss
    cnt = jnp.einsum("bag,al->bgl", gt_onehot, lvl_onehot)  # (B, G, NL)
    mean_loss = jnp.where(cnt > 0, per / jnp.maximum(cnt, 1.0), jnp.inf)
    best_lvl = jnp.argmin(mean_loss, axis=-1)  # (B, G)
    best_lvl = jax.lax.stop_gradient(best_lvl)

    anchor_best = jnp.take_along_axis(best_lvl, safe_gt, axis=1)  # (B, A)
    selected = pos & (lvl_idx[None, :] == anchor_best)

    wf = (selected | neg).astype(jnp.float32) * valid.astype(jnp.float32)
    num_pos = jnp.sum(selected.astype(jnp.float32))
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)
    loss_cls = cfg.loss_cls_weight * jnp.sum(cls_elem * wf) / num_pos
    loss_bbox = (
        cfg.loss_bbox_weight
        * jnp.sum(reg_elem * selected.astype(jnp.float32))
        / num_pos
    )
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


def fsaf_get_bboxes(
    cfg: FSAFCfg,
    cls_logits: jnp.ndarray,  # (A, C) single image
    bbox_energies: jnp.ndarray,  # (A, 4)
    anchors: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    img_shape, scale_factor, rescale: bool,
    nms_pre: int = 1000, score_thr: float = 0.05,
    nms_iou_thr: float = 0.5, max_per_img: int = 100,
):
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    sel_s, sel_b = [], []
    start = 0
    for na in num_level_anchors:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, na)
        e = jax.lax.dynamic_slice_in_dim(bbox_energies, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        k = min(nms_pre, na)
        _, ti = jax.lax.top_k(jnp.max(s, axis=-1), k)
        boxes = tblr2bboxes(
            an[ti], e[ti], normalizer=cfg.tblr_normalizer,
            max_shape=img_shape,
        )
        sel_s.append(s[ti])
        sel_b.append(boxes)
        start += na
    scores = jnp.concatenate(sel_s)
    boxes = jnp.concatenate(sel_b)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
