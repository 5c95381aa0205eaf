"""RetinaNet head (spec: reference ``mmdet/models/dense_heads/
retina_head.py`` + ``anchor_head.py`` target/loss/get_bboxes protocol).

4-conv cls tower + 4-conv reg tower per level, A*C sigmoid class logits,
A*4 deltas; MaxIoU(0.5/0.4) assignment over all anchors, focal loss with
pmean'd positive-count normaliser, SmoothL1/L1 box loss.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import max_iou_assign
from ...ops.nms import multiclass_nms_padded


class RetinaConvs(nn.Module):
    """RetinaNet towers.  ``sep_bn=True`` gives RetinaSepBNHead (reference
    ``retina_sepbn_head.py``, the NAS-FPN pairing): conv weights shared
    across levels, BatchNorm statistics separate per level."""

    num_classes: int = 80
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    sep_bn: bool = False
    # GHM momentum>0 (reference ghm_loss.py GHMC/GHMR ``acc_sum`` EMA
    # buffers): >0 declares the per-loss bin-count state in batch_stats
    # (same pattern as Dynamic R-CNN / Seesaw state in bbox_head.py)
    ghm_c_state_bins: int = 0
    ghm_r_state_bins: int = 0
    dtype: Any = jnp.float32

    def update_ghm_state(self, acc_c, acc_r):
        """Write back the EMA bin-count buffers computed by the GHM losses;
        invoked via ``net.apply(..., method=...)`` so the live-BN mutable
        mechanism threads the update through the train step (reference
        ``GHMC.acc_sum``/``GHMR.acc_sum`` registered buffers)."""
        if acc_c is not None:
            self.put_variable("batch_stats", "ghm_acc_sum_c", acc_c)
        if acc_r is not None:
            self.put_variable("batch_stats", "ghm_acc_sum_r", acc_r)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        if self.ghm_c_state_bins > 0:  # declare at init: static state tree
            self.variable(
                "batch_stats", "ghm_acc_sum_c",
                lambda: jnp.zeros((self.ghm_c_state_bins,), jnp.float32),
            )
        if self.ghm_r_state_bins > 0:
            self.variable(
                "batch_stats", "ghm_acc_sum_r",
                lambda: jnp.zeros((self.ghm_r_state_bins,), jnp.float32),
            )
        if self.sep_bn:
            from ..layers import LiveBatchNorm

            bns_cls = [[LiveBatchNorm(dtype=self.dtype,
                                      name=f"cls_bn_l{l}_{i}")
                        for i in range(self.stacked_convs)]
                       for l in range(len(feats))]
            bns_reg = [[LiveBatchNorm(dtype=self.dtype,
                                      name=f"reg_bn_l{l}_{i}")
                        for i in range(self.stacked_convs)]
                       for l in range(len(feats))]
        cls_tower = [
            nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        conv_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595), dtype=self.dtype,
            name="retina_cls",
        )
        conv_reg = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="retina_reg",
        )
        cls_out, reg_out = [], []
        for li, x in enumerate(feats):
            c = x
            r = x
            for i, conv in enumerate(cls_tower):
                c = conv(c)
                if self.sep_bn:
                    c = bns_cls[li][i](c)
                c = nn.relu(c)
            for i, conv in enumerate(reg_tower):
                r = conv(r)
                if self.sep_bn:
                    r = bns_reg[li][i](r)
                r = nn.relu(r)
            cls_out.append(conv_cls(c))
            reg_out.append(conv_reg(r).astype(jnp.float32))
        return cls_out, reg_out, None


@dataclasses.dataclass(frozen=True)
class RetinaCfg:
    num_classes: int = 80
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    smooth_l1_beta: float = 0.0  # 0 -> plain L1 (modern retinanet default)
    # GHM variants (reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py:
    # GHMC/GHMR replace focal/L1; momentum>0 = EMA acc_sum buffers held in
    # batch_stats by RetinaConvs and threaded through retina_loss)
    loss_cls_type: str = "focal"  # "focal" | "ghm"
    ghm_bins: int = 30
    ghm_momentum: float = 0.0
    loss_bbox_type: str = "l1"  # "l1" (beta selects smooth) | "ghmr"
    ghmr_mu: float = 0.02
    ghmr_bins: int = 10
    ghmr_momentum: float = 0.0
    # PISA (reference pisa_retinanet_head.py): ISR-P reweighting + CARL
    pisa: bool = False
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2


def retina_loss(
    cfg: RetinaCfg,
    cls_logits: jnp.ndarray,  # (B, A, C)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,
    valid: jnp.ndarray,  # (B, A)
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
    ghm_acc: Optional[Tuple] = None,
):
    """Anchor-head loss.  ``ghm_acc=(acc_sum_c, acc_sum_r)`` (either may be
    None) switches the GHM losses to their stateful EMA variant and makes
    the call return ``(losses, (new_acc_c, new_acc_r))``."""
    b, a, c = cls_logits.shape
    acc_c, acc_r = ghm_acc if ghm_acc is not None else (None, None)
    new_acc_c, new_acc_r = acc_c, acc_r

    def targets(v, gb, gl, gm):
        assign = max_iou_assign(
            anchors, v, gb, gm, gt_labels=gl,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, match_low_quality=True,
        )
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0
        w = (pos | neg).astype(jnp.float32)
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        enc = box_ops.bbox2delta(anchors, box_ops.take_small_table(gb, safe), cfg.target_means, cfg.target_stds, eps=1e-6)
        bt = jnp.where(pos[:, None], enc, 0.0)
        labels = jnp.where(pos, assign.labels, cfg.num_classes)
        return pos, w, bt, labels, jnp.clip(assign.gt_inds - 1, 0, g - 1)

    pos, w, bt, labels, gt_idx = jax.vmap(targets)(
        valid, gt_bboxes, gt_labels, gt_mask)
    num_pos = jnp.sum(pos.astype(jnp.float32))
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_total = jnp.maximum(num_pos, 1.0)

    if cfg.pisa:
        # ISR-P: reweight positive anchors by IoU-HLR; CARL on regression
        # (reference ``pisa_loss.py`` applied by PISARetinaHead).
        from ...ops.pisa import carl_loss, isr_p_weights

        g = gt_bboxes.shape[1]
        gt_global = (gt_idx
                     + jnp.arange(b, dtype=gt_idx.dtype)[:, None] * g)
        dec_p = jax.vmap(
            lambda r: box_ops.delta2bbox(anchors, r, cfg.target_means,
                                         cfg.target_stds)
        )(bbox_preds.astype(jnp.float32))
        dec_t = jax.vmap(
            lambda r: box_ops.delta2bbox(anchors, r, cfg.target_means,
                                         cfg.target_stds)
        )(bt)
        ious = box_ops.bbox_overlaps_aligned(
            dec_p.reshape(-1, 4), dec_t.reshape(-1, 4))
        onehot_p = jax.nn.one_hot(labels.reshape(-1), c,
                                  dtype=jnp.float32)
        ce = L.sigmoid_focal_loss(
            jax.lax.stop_gradient(cls_logits).reshape(-1, c), onehot_p,
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            reduction="none",
        ).sum(-1)
        w = isr_p_weights(
            labels.reshape(-1), gt_global.reshape(-1),
            jax.lax.stop_gradient(ious), w.reshape(-1),
            pos.reshape(-1), ce, k=cfg.isr_k, bias=cfg.isr_bias,
        ).reshape(b, a)

    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    if cfg.loss_cls_type == "ghm":
        loss_cls = L.ghm_c_loss(
            cls_logits.reshape(-1, c), onehot,
            jnp.broadcast_to(w.reshape(-1, 1), (b * a, c)),
            bins=cfg.ghm_bins, momentum=cfg.ghm_momentum, acc_sum=acc_c,
        )
        if acc_c is not None:
            loss_cls, new_acc_c = loss_cls
        loss_cls = loss_cls * cfg.loss_cls_weight
    else:
        loss_cls = (
            L.sigmoid_focal_loss(
                cls_logits.reshape(-1, c), onehot, weight=w.reshape(-1),
                gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
                avg_factor=num_total,
            )
            * cfg.loss_cls_weight
        )
    posf = pos.reshape(-1, 1).astype(jnp.float32)
    if cfg.loss_bbox_type == "ghmr":
        loss_bbox = L.ghm_r_loss(
            bbox_preds.reshape(-1, 4), bt.reshape(-1, 4),
            jnp.broadcast_to(posf, (b * a, 4)),
            mu=cfg.ghmr_mu, bins=cfg.ghmr_bins,
            momentum=cfg.ghmr_momentum, acc_sum=acc_r,
        )
        if acc_r is not None:
            loss_bbox, new_acc_r = loss_bbox
    elif cfg.smooth_l1_beta > 0:
        loss_bbox = L.smooth_l1_loss(
            bbox_preds.reshape(-1, 4), bt.reshape(-1, 4), weight=posf,
            beta=cfg.smooth_l1_beta, avg_factor=num_total,
        )
    else:
        loss_bbox = L.l1_loss(
            bbox_preds.reshape(-1, 4), bt.reshape(-1, 4), weight=posf,
            avg_factor=num_total,
        )
    out = {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox * cfg.loss_bbox_weight,
    }
    if cfg.pisa:
        from ...ops.pisa import carl_loss

        reg_elem = jnp.abs(bbox_preds.reshape(-1, 4) - bt.reshape(-1, 4))
        out["loss_carl"] = carl_loss(
            cls_logits.reshape(-1, c), labels.reshape(-1),
            pos.reshape(-1), reg_elem, k=cfg.carl_k, bias=cfg.carl_bias,
            avg_factor=num_total, sigmoid=True,
        )
    if ghm_acc is not None:
        return out, (new_acc_c, new_acc_r)
    return out


def retina_get_bboxes(
    cfg: RetinaCfg,
    cls_logits: jnp.ndarray,  # (A, C) single image
    bbox_preds: jnp.ndarray,  # (A, 4)
    anchors: jnp.ndarray,
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,
    rescale: bool,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_iou_thr: float = 0.5,
    max_per_img: int = 100,
    pre_nms_top_k: int = 2048,
):
    """Single-image detection decode (``anchor_head.py`` ``_get_bboxes``)."""
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    sel_scores, sel_boxes = [], []
    start = 0
    for na in num_level_anchors:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, na)  # (na, C)
        bp = jax.lax.dynamic_slice_in_dim(bbox_preds, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        max_s = jnp.max(s, axis=-1)
        _, ti = jax.lax.top_k(max_s, k)
        boxes = box_ops.delta2bbox(
            an[ti], bp[ti], cfg.target_means, cfg.target_stds, max_shape=img_shape
        )
        sel_scores.append(s[ti])
        sel_boxes.append(boxes)
        start += na
    scores = jnp.concatenate(sel_scores)  # (K, C)
    boxes = jnp.concatenate(sel_boxes)  # (K, 4)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    # append a dummy bg column: multiclass_nms_padded takes fg-only scores
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img, pre_nms_top_k=pre_nms_top_k,
    )
