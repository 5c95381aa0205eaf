"""ATSSRPNHead ("RetinaRPN") — the Boosting R-CNN proposal head, TPU-native.

Behavioural spec (re-derived from
``mmdet/models/dense_heads/atss_rpn_head.py:109-783``):

  * 4 stacked 3x3 convs with GN(32) on 5 FPN levels, then 3 branches:
    ``rpn_cls`` (A sigmoid objectness), ``rpn_reg`` (A*4 deltas through a
    per-level learnable ``Scale``), ``rpn_iou`` (A IoU logits) — ``:195-215``.
  * Train targets: MaxIoU assign (0.5/0.5/min 0, low-quality on) +
    PseudoSampler over *all* anchors — ``:505-605``.
  * Losses — ``:301-464``: sigmoid focal cls loss (avg by pmean'd #pos);
    IoU-box loss on decoded boxes weighted by ``iou_target**gamma`` and
    normalised by the pmean'd sum of ``iou_target``; optional MSE "aug" loss
    on encoded deltas averaged 50/50 with the box loss; BCE on the IoU branch
    vs the realised IoU.
  * Proposals — ``:688-760``: per-level top-``nms_pre`` by the fused score
    ``sqrt(sigmoid(cls) * sigmoid(iou))``, decode, level-offset batched NMS,
    keep ``max_per_img``; proposal column 4 carries the fused score (the
    "prior" consumed by ProbRoIHead).

TPU design: the reference's per-image / per-level python loops become a
single fixed-shape computation over the flattened anchor axis, ``vmap``'d
over the batch.  Cross-device normalisers use ``lax.pmean`` (replacing
``reduce_mean``/NCCL, reference ``core/utils/dist_utils.py:67``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import atss_assign, max_iou_assign
from ...ops.nms import batched_nms_padded
from ...ops.topk import select_topk
from ..layers import ConvModule, DeformConv, Scale, make_norm, mish

EPS = 1e-12


class ASPPShared(nn.Module):
    """Shared-weight multi-dilation conv block (reference ``ASPP_share:30``):
    one 3x3 kernel applied at several dilations, concat, 1x1 fuse, Mish."""

    dilations: Tuple[int, ...] = (1, 3, 5, 7)
    channels: int = 256
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "shared_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.channels),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "shared_bias", nn.initializers.zeros, (self.channels,), jnp.float32
        ).astype(self.dtype)
        outs = []
        for d in self.dilations:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(1, 1),
                padding=[(d, d), (d, d)],
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(y + bias)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fuse")(y)
        if self.norm_cfg is not None:
            y = nn.GroupNorm(
                self.norm_cfg.get("num_groups", 32), epsilon=1e-5,
                dtype=self.dtype,
            )(y)
        return mish(y)


class DCNModule(nn.Module):
    """Reference ``DCNModule`` (``atss_rpn_head.py:75-107``): v1 deformable
    conv -> norm -> Mish."""

    channels: int
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DeformConv(
            self.channels, 3, modulated=False, dtype=self.dtype, name="dcn"
        )(x)
        norm = make_norm(self.norm_cfg, self.dtype)
        if norm is not None:
            x = norm(x)
        return mish(x)


class ATSSRPNConvs(nn.Module):
    """The network part: shared conv tower + 3 prediction branches."""

    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    last_conv: str = "norm"  # 'norm' | 'aspp' | 'dcn'
    norm_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], bridge: bool = False):
        """feats: per-level (B, H, W, C).  Returns per-level
        (cls (B,H,W,A), reg (B,H,W,A*4), iou (B,H,W,A)) and optionally the
        tower features (bridge mode, reference ``:213,279-294``)."""
        cls_out, reg_out, iou_out, feat_out = [], [], [], []
        tower = []
        for i in range(self.stacked_convs):
            if i == self.stacked_convs - 1 and self.last_conv == "aspp":
                tower.append(
                    ASPPShared(
                        channels=self.feat_channels,
                        norm_cfg={"type": "GN", "num_groups": self.norm_groups},
                        dtype=self.dtype,
                        name=f"rpn_conv_{i}",
                    )
                )
            elif i == self.stacked_convs - 1 and self.last_conv == "dcn":
                # reference DCNModule (atss_rpn_head.py:75-107): v1 deform
                # conv + norm + Mish (its deform_groups arg is ignored —
                # DeformConv2dPack is hardcoded to deform_groups=1)
                tower.append(
                    DCNModule(
                        channels=self.feat_channels,
                        norm_cfg={"type": "GN", "num_groups": self.norm_groups},
                        dtype=self.dtype,
                        name=f"rpn_conv_{i}",
                    )
                )
            else:
                tower.append(
                    ConvModule(
                        self.feat_channels,
                        3,
                        norm_cfg={"type": "GN", "num_groups": self.norm_groups},
                        act="relu",
                        dtype=self.dtype,
                        name=f"rpn_conv_{i}",
                    )
                )
        conv_cls = nn.Conv(
            self.num_anchors, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595),  # prior prob 0.01
            dtype=self.dtype, name="rpn_cls",
        )
        conv_reg = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="rpn_reg",
        )
        conv_iou = nn.Conv(
            self.num_anchors, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="rpn_iou",
        )
        scales = [Scale(name=f"scale_{l}") for l in range(self.num_levels)]

        for lvl, x in enumerate(feats):
            for conv in tower:
                x = conv(x)
            cls_out.append(conv_cls(x))
            reg_out.append(scales[lvl](conv_reg(x)).astype(jnp.float32))
            iou_out.append(conv_iou(x))
            if bridge:
                feat_out.append(x)
        if bridge:
            return cls_out, reg_out, iou_out, feat_out
        return cls_out, reg_out, iou_out


def flatten_levels(per_level: Sequence[jnp.ndarray], last_dim: int) -> jnp.ndarray:
    """Per-level (B, H, W, A*D) -> (B, sum HWA, D), level-major order matching
    ``AnchorGenerator.flat_anchors``."""
    b = per_level[0].shape[0]
    return jnp.concatenate(
        [x.reshape(b, -1, last_dim) for x in per_level], axis=1
    )


@dataclasses.dataclass(frozen=True)
class ATSSRPNCfg:
    gamma: float = 0.5
    atss: bool = False
    atss_topk: int = 9
    reg_decoded_bbox: bool = True
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    # losses
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    loss_bbox_type: str = "iou"  # 'iou' | 'giou' | 'ciou' | 'diou'
    loss_cls_type: str = "focal"  # 'focal' | 'varifocal'
    loss_iou_weight: float = 1.0
    with_aug_loss: bool = True
    aug_loss_weight: float = 1.0
    # train assigner
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    match_low_quality: bool = True


def _encode(cfg: ATSSRPNCfg, anchors, boxes):
    return box_ops.bbox2delta(anchors, boxes, cfg.target_means, cfg.target_stds, eps=1e-6)


def _decode(cfg: ATSSRPNCfg, anchors, deltas, max_shape=None):
    return box_ops.delta2bbox(
        anchors, deltas, cfg.target_means, cfg.target_stds, max_shape=max_shape
    )


def atss_rpn_targets(
    cfg: ATSSRPNCfg,
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (A,) per-image anchor validity
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,)
    num_level_anchors: Tuple[int, ...] = (),
):
    """Single-image targets (vmap over batch).  Returns
    (labels01 pos-mask, label_weights, bbox_targets, pos_mask)."""
    if cfg.atss:
        assign = atss_assign(
            anchors, valid, tuple(num_level_anchors), gt_bboxes, gt_mask,
            topk=cfg.atss_topk,
        )
    else:
        assign = max_iou_assign(
            anchors,
            valid,
            gt_bboxes,
            gt_mask,
            pos_iou_thr=cfg.pos_iou_thr,
            neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
            match_low_quality=cfg.match_low_quality,
        )
    pos = assign.gt_inds > 0
    neg = assign.gt_inds == 0
    label_weights = (pos | neg).astype(jnp.float32)
    g = gt_bboxes.shape[0]
    safe_gt = jnp.clip(assign.gt_inds - 1, 0, g - 1)
    # one-hot MXU contraction, not a row gather: the dense (A,)-from-(G,4)
    # gather lowers to a ~11ms/step serial kCustom op (TRAIN_PERF round 3)
    matched_gt = box_ops.take_small_table(gt_bboxes, safe_gt)
    if cfg.reg_decoded_bbox:
        bbox_targets = jnp.where(pos[:, None], matched_gt, 0.0)
    else:
        enc = _encode(cfg, anchors, matched_gt)
        bbox_targets = jnp.where(pos[:, None], enc, 0.0)
    return pos, label_weights, bbox_targets


def atss_rpn_loss(
    cfg: ATSSRPNCfg,
    cls_logits: jnp.ndarray,  # (B, A)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    iou_logits: jnp.ndarray,  # (B, A)
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (B, A)
    gt_bboxes: jnp.ndarray,  # (B, G, 4)
    gt_mask: jnp.ndarray,  # (B, G)
    num_level_anchors: Tuple[int, ...] = (),
    axis_name: Optional[str] = None,
):
    """Full RPN loss over the batch (reference ``loss``/``loss_single``,
    ``atss_rpn_head.py:301-464``)."""
    b, a = cls_logits.shape
    pos, label_weights, bbox_targets = jax.vmap(
        lambda v, g, m: atss_rpn_targets(cfg, anchors, v, g, m, num_level_anchors)
    )(valid, gt_bboxes, gt_mask)

    num_pos = jnp.sum(pos.astype(jnp.float32))
    if axis_name is not None:
        num_total_samples = jax.lax.pmean(num_pos, axis_name)
    else:
        num_total_samples = num_pos
    num_total_samples = jnp.maximum(num_total_samples, 1.0)

    # --- classification (sigmoid focal, FG label = objectness) ---
    flat_logits = cls_logits.reshape(-1, 1)
    flat_target = pos.reshape(-1, 1).astype(jnp.float32)
    flat_w = label_weights.reshape(-1)
    if cfg.loss_cls_type == "varifocal":
        # VarifocalLoss path (COCO config): target = realised IoU on positives.
        anchors_b = jnp.broadcast_to(anchors, (b, a, 4))
        decoded = _decode(cfg, anchors_b, bbox_preds)
        iou_t_all = box_ops.bbox_overlaps_aligned(
            jax.lax.stop_gradient(decoded), bbox_targets
        )
        vf_target = jnp.where(pos, iou_t_all, 0.0).reshape(-1, 1)
        loss_cls = L.varifocal_loss(
            flat_logits, vf_target, weight=None, avg_factor=num_total_samples
        )
    else:
        loss_cls = L.sigmoid_focal_loss(
            flat_logits,
            flat_target,
            weight=flat_w,
            gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha,
            avg_factor=num_total_samples,
        )
    loss_cls = loss_cls * cfg.loss_cls_weight

    # --- box regression (IoU-target-weighted) ---
    anchors_b = jnp.broadcast_to(anchors, (b, a, 4))
    posf = pos.reshape(-1).astype(jnp.float32)
    if cfg.reg_decoded_bbox:
        decoded = _decode(cfg, anchors_b, bbox_preds).reshape(-1, 4)
        targets = bbox_targets.reshape(-1, 4)
        # guard padded rows for the IoU computation
        safe_t = jnp.where(posf[:, None] > 0, targets, decoded)
        iou_target = box_ops.bbox_overlaps_aligned(
            jax.lax.stop_gradient(decoded), safe_t
        )
        iou_target = jnp.where(posf > 0, iou_target, 0.0)
        w = jnp.maximum(iou_target**cfg.gamma, EPS) * posf
        box_loss_fn = {
            "iou": L.iou_loss,
            "giou": L.giou_loss,
            "diou": L.diou_loss,
            "ciou": L.ciou_loss,
            "eiou": L.eiou_loss,
            "focal_eiou": L.focal_eiou_loss,
        }[cfg.loss_bbox_type]
        loss_bbox = box_loss_fn(decoded, safe_t, weight=w, avg_factor=1.0)
        if cfg.with_aug_loss:
            enc_t = _encode(cfg, anchors_b.reshape(-1, 4), safe_t)
            aug_w = jnp.broadcast_to(w[:, None], enc_t.shape)
            loss_aug = L.mse_loss(
                bbox_preds.reshape(-1, 4), enc_t, weight=aug_w, avg_factor=1.0
            ) * cfg.aug_loss_weight
            loss_bbox = (loss_bbox + loss_aug) * 0.5
    else:
        # encoded-delta branch (COCO config): iou_target from decoded pairs,
        # but the box loss is applied to the raw delta vectors with (N, 4)
        # iou^gamma weights — reference ``loss_single`` else-branch
        # (``atss_rpn_head.py:365-379``), including the CIoU-on-deltas quirk.
        decoded = _decode(cfg, anchors_b, bbox_preds).reshape(-1, 4)
        dec_t = _decode(cfg, anchors_b, bbox_targets).reshape(-1, 4)
        safe_t = jnp.where(posf[:, None] > 0, dec_t, decoded)
        iou_target = box_ops.bbox_overlaps_aligned(
            jax.lax.stop_gradient(decoded), safe_t
        )
        iou_target = jnp.where(posf > 0, iou_target, 0.0)
        w4 = jnp.maximum(iou_target**cfg.gamma, EPS)[:, None] * posf[:, None]
        box_loss_fn = {
            "iou": L.iou_loss,
            "giou": L.giou_loss,
            "diou": L.diou_loss,
            "ciou": L.ciou_loss,
            "smooth_l1": lambda p, t, weight, avg_factor: L.smooth_l1_loss(
                p, t, weight=weight, avg_factor=avg_factor
            ),
            "l1": L.l1_loss,
        }[cfg.loss_bbox_type]
        flat_pred = bbox_preds.reshape(-1, 4)
        flat_t = jnp.where(posf[:, None] > 0, bbox_targets.reshape(-1, 4), flat_pred)
        loss_bbox = box_loss_fn(flat_pred, flat_t, weight=w4, avg_factor=1.0)

    bbox_avg = jnp.sum(iou_target)
    if axis_name is not None:
        bbox_avg = jax.lax.pmean(bbox_avg, axis_name)
    loss_bbox = loss_bbox * cfg.loss_bbox_weight / jnp.maximum(bbox_avg, 1.0)

    # --- IoU branch ("centerness") BCE ---
    loss_iou = (
        L.binary_cross_entropy_loss(
            iou_logits.reshape(-1),
            iou_target,
            weight=posf,
            avg_factor=num_total_samples,
        )
        * cfg.loss_iou_weight
    )
    return {
        "loss_rpn_cls": loss_cls,
        "loss_rpn_bbox": loss_bbox,
        "loss_rpn_iou": loss_iou,
    }


def atss_rpn_proposals(
    cfg: ATSSRPNCfg,
    cls_logits: jnp.ndarray,  # (A,) single image
    bbox_preds: jnp.ndarray,  # (A, 4)
    iou_logits: jnp.ndarray,  # (A,)
    anchors: jnp.ndarray,  # (A, 4)
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,  # (2,) valid H, W
    nms_pre: int = 1000,
    max_per_img: int = 256,
    nms_iou_thr: float = 0.7,
    min_bbox_size: float = 0.0,
    approx_topk: bool = False,
    topk_recall_target: float = 0.95,
):
    """Proposal generation for one image (vmap over batch).

    Returns (proposals (max_per_img, 4), scores (max_per_img,), valid mask).
    The score is the fused prior ``sqrt(sigmoid(cls)*sigmoid(iou))``
    (reference ``:712-731``).  ``approx_topk`` opts in to the TPU
    approximate per-level selection (ops/topk.py) — a documented
    deviation from the reference's exact top-k, default off.
    """
    fused = jnp.sqrt(
        jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        * jax.nn.sigmoid(iou_logits.astype(jnp.float32))
    )
    # per-level top-nms_pre
    sel_scores, sel_boxes, sel_anchors, sel_ids = [], [], [], []
    start = 0
    for lvl, na in enumerate(num_level_anchors):
        s = jax.lax.dynamic_slice_in_dim(fused, start, na)
        bp = jax.lax.dynamic_slice_in_dim(bbox_preds, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        top_s, top_i = select_topk(
            s, k, approx=approx_topk, recall_target=topk_recall_target
        )
        sel_scores.append(top_s)
        sel_boxes.append(bp[top_i])
        sel_anchors.append(an[top_i])
        sel_ids.append(jnp.full((k,), lvl, jnp.int32))
        start += na
    scores = jnp.concatenate(sel_scores)
    deltas = jnp.concatenate(sel_boxes)
    ancs = jnp.concatenate(sel_anchors)
    ids = jnp.concatenate(sel_ids)

    proposals = _decode(cfg, ancs, deltas, max_shape=img_shape)
    w = proposals[:, 2] - proposals[:, 0]
    h = proposals[:, 3] - proposals[:, 1]
    ok = (w > min_bbox_size) & (h > min_bbox_size)

    boxes, out_scores, valid, _ = batched_nms_padded(
        proposals, scores, ids, nms_iou_thr, max_per_img, valid=ok
    )
    out_scores = jnp.where(valid, out_scores, 0.0)
    return boxes, out_scores, valid
