"""GFL head (Generalized Focal Loss).

Spec: reference ``mmdet/models/dense_heads/gfl_head.py`` (and the fork's
unexported ``GFLRPNHead``, ``gfl_rpn_head.py:19``): ATSS assignment, joint
classification-quality branch trained with Quality Focal Loss, box branch
predicting a discrete distribution over ltrb distances (integral regression)
trained with DFL + GIoU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import atss_assign
from ...ops.nms import multiclass_nms_padded
from ..layers import ConvModule, Scale


class GFLConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_tower = [
            ConvModule(self.feat_channels, 3, norm_cfg={"type": "GN", "num_groups": 32},
                       act="relu", dtype=self.dtype, name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            ConvModule(self.feat_channels, 3, norm_cfg={"type": "GN", "num_groups": 32},
                       act="relu", dtype=self.dtype, name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                           bias_init=nn.initializers.constant(-4.595),
                           dtype=self.dtype, name="gfl_cls")
        conv_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="gfl_reg")
        scales = [Scale(name=f"scale_{l}") for l in range(self.num_levels)]
        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for c in cls_tower:
                cf = c(cf)
            for c in reg_tower:
                rf = c(rf)
            cls_out.append(conv_cls(cf))
            reg_out.append(scales[lvl](conv_reg(rf)).astype(jnp.float32))
        return cls_out, reg_out, None


@dataclasses.dataclass(frozen=True)
class GFLCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    reg_max: int = 16
    topk: int = 9
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    loss_dfl_weight: float = 0.25
    qfl_beta: float = 2.0


def integral_distances(dist_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) logits -> (..., 4) expected distances (in stride
    units), the GFL 'integral' operator."""
    shape = dist_logits.shape[:-1]
    p = jax.nn.softmax(
        dist_logits.reshape(*shape, 4, reg_max + 1).astype(jnp.float32), axis=-1
    )
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.sum(p * proj, axis=-1)


def _centers(anchors):
    return (
        (anchors[:, 0] + anchors[:, 2]) * 0.5,
        (anchors[:, 1] + anchors[:, 3]) * 0.5,
    )


def gfl_decode(anchors, dist, stride):
    """Distances (ltrb, stride units) around anchor centers -> boxes."""
    cx, cy = _centers(anchors)
    return jnp.stack(
        [
            cx - dist[:, 0] * stride,
            cy - dist[:, 1] * stride,
            cx + dist[:, 2] * stride,
            cy + dist[:, 3] * stride,
        ],
        axis=-1,
    )


def gfl_loss(
    cfg: GFLCfg,
    cls_logits: jnp.ndarray,  # (B, A, C)
    dist_logits: jnp.ndarray,  # (B, A, 4*(reg_max+1))
    anchors: jnp.ndarray,
    anchor_strides: jnp.ndarray,  # (A,) stride per anchor
    valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    axis_name: Optional[str] = None,
    soft_reg: Optional[jnp.ndarray] = None,  # teacher dist logits (LD)
    ld_weight: float = 0.25,
    ld_T: float = 10.0,
):
    b, a, c = cls_logits.shape

    def targets(v, gb, gl, gm):
        assign = atss_assign(
            anchors, v, tuple(num_level_anchors), gb, gm, gt_labels=gl,
            topk=cfg.topk,
        )
        pos = assign.gt_inds > 0
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        labels = jnp.where(pos, assign.labels, cfg.num_classes)
        return pos, box_ops.take_small_table(gb, safe), labels

    pos, matched, labels = jax.vmap(targets)(valid, gt_bboxes, gt_labels, gt_mask)
    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(posf), 1.0)
    if axis_name is not None:
        num_pos = jnp.maximum(jax.lax.pmean(jnp.sum(posf), axis_name), 1.0)

    strides_b = jnp.broadcast_to(anchor_strides, (b, a)).reshape(-1)
    anchors_b = jnp.broadcast_to(anchors, (b, a, 4)).reshape(-1, 4)
    dist = integral_distances(dist_logits.reshape(-1, dist_logits.shape[-1]), cfg.reg_max)
    decoded = gfl_decode(anchors_b, dist, strides_b)
    gt_flat = matched.reshape(-1, 4)
    safe_t = jnp.where(posf[:, None] > 0, gt_flat, jax.lax.stop_gradient(decoded))

    iou_q = box_ops.bbox_overlaps_aligned(jax.lax.stop_gradient(decoded), safe_t)
    iou_q = jnp.where(posf > 0, iou_q, 0.0)

    loss_cls = L.quality_focal_loss(
        cls_logits.reshape(-1, c), labels.reshape(-1), iou_q,
        beta=cfg.qfl_beta, avg_factor=num_pos,
    ) * cfg.loss_cls_weight

    w = iou_q  # GFL weights box losses by the quality score
    w_sum = jnp.maximum(jnp.sum(w), 1e-6)
    if axis_name is not None:
        w_sum = jnp.maximum(jax.lax.pmean(jnp.sum(w), axis_name), 1e-6)
    loss_bbox = L.giou_loss(decoded, safe_t, weight=w, avg_factor=w_sum) * cfg.loss_bbox_weight

    # DFL on each of the 4 target distances (clipped into the support)
    cx, cy = _centers(anchors_b)
    t_ltrb = jnp.stack(
        [
            (cx - safe_t[:, 0]) / strides_b,
            (cy - safe_t[:, 1]) / strides_b,
            (safe_t[:, 2] - cx) / strides_b,
            (safe_t[:, 3] - cy) / strides_b,
        ],
        axis=-1,
    )
    t_ltrb = jnp.clip(t_ltrb, 0.0, cfg.reg_max - 0.01)
    dl = dist_logits.reshape(-1, 4, cfg.reg_max + 1)
    loss_dfl = 0.0
    for k in range(4):
        loss_dfl = loss_dfl + L.distribution_focal_loss(
            dl[:, k], t_ltrb[:, k], weight=w, avg_factor=w_sum * 4.0
        )
    out = {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "loss_dfl": loss_dfl * cfg.loss_dfl_weight,
    }
    if soft_reg is not None:
        # Localization distillation (reference ``ld_head.py:loss_single``):
        # KD-KL between student and teacher corner distributions on
        # positives, weighted by the quality score like the DFL term.
        from .. import dense_heads  # noqa: F401  (package anchor)
        from ...ops.losses import kd_kl_div_loss

        sl = soft_reg.reshape(-1, 4, cfg.reg_max + 1)
        ld = 0.0
        for k in range(4):
            ld = ld + (
                kd_kl_div_loss(dl[:, k], sl[:, k], T=ld_T) * w
            ).sum() / (w_sum * 4.0)
        out["loss_ld"] = ld * ld_weight
    return out


def gfl_get_bboxes(
    cfg: GFLCfg,
    cls_logits: jnp.ndarray,  # (A, C)
    dist_logits: jnp.ndarray,  # (A, 4*(reg_max+1))
    anchors: jnp.ndarray,
    anchor_strides: jnp.ndarray,
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,
    rescale: bool,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_iou_thr: float = 0.6,
    max_per_img: int = 100,
):
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    sel_s, sel_b = [], []
    start = 0
    for na in num_level_anchors:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, na)
        d = jax.lax.dynamic_slice_in_dim(dist_logits, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        st = jax.lax.dynamic_slice_in_dim(anchor_strides, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        _, ti = jax.lax.top_k(jnp.max(s, axis=-1), k)
        dist = integral_distances(d[ti], cfg.reg_max)
        boxes = gfl_decode(an[ti], dist, st[ti])
        boxes = box_ops.clip_boxes(boxes, img_shape)
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
