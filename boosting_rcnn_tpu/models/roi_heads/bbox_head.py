"""R-CNN box heads (flax) + target/loss/decode logic.

Spec: reference ``mmdet/models/roi_heads/bbox_heads/bbox_head.py:15``
(``get_targets:188``, ``loss:256``, ``get_bboxes:317``) and the fork's
``ProbConvFCBBoxHead`` (``convfc_bbox_head.py:284-451``): 2 shared FCs, a
``get_bboxes`` that *skips softmax* (scores arrive pre-fused with the
proposal prior) and a loss that honours ``reduction_override`` so the
boosting reweighting can renormalise per-sample CE.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.nms import multiclass_nms_padded


class ConvFCBBoxHead(nn.Module):
    """Shared convs + FCs -> (cls logits, reg deltas).

    ``Shared2FCBBoxHead`` = defaults (0 convs, 2 FCs) — the configuration
    every Boosting R-CNN / Faster R-CNN config uses.
    """

    num_classes: int
    num_shared_convs: int = 0
    num_shared_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    reg_class_agnostic: bool = False
    with_cls: bool = True
    with_reg: bool = True
    conv_cfg: Optional[dict] = None  # e.g. dict(type='ConvWS') (gn+ws)
    norm_cfg: Optional[dict] = None  # e.g. dict(type='GN', num_groups=32)
    seesaw: bool = False  # hold cumulative class counts in batch_stats
    # Dynamic R-CNN (reference ``dynamic_roi_head.py``): the working
    # assigner IoU threshold and SmoothL1 beta live in ``batch_stats``
    # together with a ``dyn_interval``-slot ring buffer of the per-step
    # batch statistics; every ``dyn_interval`` steps the working values are
    # recomputed replay-exactly (mean IoU / median beta over the window,
    # floor/cap at the initial values) — the reference's
    # ``update_hyperparameters`` history semantics, jit-compatible.
    dynamic: bool = False
    dyn_initial_iou: float = 0.4
    dyn_initial_beta: float = 1.0
    dyn_interval: int = 100  # reference train_cfg update_iter_interval
    dtype: Any = jnp.float32

    def get_dynamic_state(self):
        """Current (iou_thr, beta) for Dynamic R-CNN sampling/loss."""
        return (self.get_variable("batch_stats", "dyn_iou_thr"),
                self.get_variable("batch_stats", "dyn_beta"))

    def update_dynamic(self, batch_iou: jnp.ndarray, batch_beta: jnp.ndarray):
        """Append the batch statistics to the interval history and, on
        every ``dyn_interval``-th step, replay the reference update
        (``dynamic_roi_head.py::update_hyperparameters``:
        ``new_iou = max(initial_iou, mean(history))``,
        ``new_beta = min(initial_beta, median(history))`` — beta kept
        unchanged when the median degenerates below EPS=1e-15).  NaN
        statistics (no positives in the batch — cannot happen upstream
        where add_gt_as_proposals=True guarantees positives) are recorded
        as the current working values."""
        iou = self.get_variable("batch_stats", "dyn_iou_thr")
        beta = self.get_variable("batch_stats", "dyn_beta")
        iou_hist = self.get_variable("batch_stats", "dyn_iou_hist")
        beta_hist = self.get_variable("batch_stats", "dyn_beta_hist")
        count = self.get_variable("batch_stats", "dyn_count")
        batch_iou = jnp.where(jnp.isnan(batch_iou), iou, batch_iou)
        batch_beta = jnp.where(jnp.isnan(batch_beta), beta, batch_beta)
        k = self.dyn_interval
        idx = jnp.mod(count, k)
        iou_hist = iou_hist.at[idx].set(batch_iou.astype(jnp.float32))
        beta_hist = beta_hist.at[idx].set(batch_beta.astype(jnp.float32))
        count = count + 1
        boundary = jnp.mod(count, k) == 0
        cand_iou = jnp.maximum(self.dyn_initial_iou, jnp.mean(iou_hist))
        med = jnp.median(beta_hist)
        cand_beta = jnp.where(
            med < 1e-15, beta,
            jnp.minimum(self.dyn_initial_beta, med))
        new_iou = jnp.where(boundary, cand_iou, iou)
        new_beta = jnp.where(boundary, cand_beta, beta)
        self.put_variable("batch_stats", "dyn_iou_thr", new_iou)
        self.put_variable("batch_stats", "dyn_beta", new_beta)
        self.put_variable("batch_stats", "dyn_iou_hist", iou_hist)
        self.put_variable("batch_stats", "dyn_beta_hist", beta_hist)
        self.put_variable("batch_stats", "dyn_count", count)
        return new_iou, new_beta

    def update_seesaw_counts(self, labels: jnp.ndarray, weights: jnp.ndarray):
        """Accumulate sampled-target class counts (reference
        ``SeesawLoss.cum_samples`` buffer) into ``batch_stats``; invoked via
        ``net.apply(..., method=...)`` so the live-BN mutable mechanism
        threads the update through the train step."""
        counts = self.get_variable("batch_stats", "seesaw_counts")
        onehot = jax.nn.one_hot(
            labels, self.num_classes + 1, dtype=jnp.float32)
        new = counts + (onehot * weights[:, None]).sum(0)
        self.put_variable("batch_stats", "seesaw_counts", new)
        return new

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (R, 7, 7, C) pooled features -> (cls (R, C+1), reg (R, 4K))."""
        from ..layers import ConvModule

        if self.seesaw:  # declare at init so the state tree is static
            self.variable(
                "batch_stats", "seesaw_counts",
                lambda: jnp.zeros((self.num_classes + 1,), jnp.float32),
            )
        if self.dynamic:
            self.variable(
                "batch_stats", "dyn_iou_thr",
                lambda: jnp.asarray(self.dyn_initial_iou, jnp.float32),
            )
            self.variable(
                "batch_stats", "dyn_beta",
                lambda: jnp.asarray(self.dyn_initial_beta, jnp.float32),
            )
            self.variable(
                "batch_stats", "dyn_iou_hist",
                lambda: jnp.zeros((self.dyn_interval,), jnp.float32),
            )
            self.variable(
                "batch_stats", "dyn_beta_hist",
                lambda: jnp.zeros((self.dyn_interval,), jnp.float32),
            )
            self.variable(
                "batch_stats", "dyn_count",
                lambda: jnp.asarray(0, jnp.int32),
            )
        for i in range(self.num_shared_convs):
            x = ConvModule(
                self.conv_out_channels, 3, conv_cfg=self.conv_cfg,
                norm_cfg=self.norm_cfg, dtype=self.dtype,
                name=f"shared_conv_{i}",
            )(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_shared_fcs):
            x = nn.Dense(self.fc_out_channels, dtype=self.dtype, name=f"shared_fc_{i}")(x)
            x = nn.relu(x)
        cls = (
            nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")(x)
            if self.with_cls
            else None
        )
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = (
            nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")(x)
            if self.with_reg
            else None
        )
        return cls, reg


@dataclasses.dataclass(frozen=True)
class BBoxHeadCfg:
    num_classes: int = 4
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False
    reg_decoded_bbox: bool = False
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 2.0
    loss_bbox_type: str = "l1"  # 'l1' | 'smooth_l1' | 'giou' | 'ciou'
    smooth_l1_beta: float = 1.0
    focal_reg: bool = False
    focal_reg_gamma: float = 1.0
    # Seesaw (reference configs/seesaw_loss + ``losses/seesaw_loss.py``):
    # cumulative class counts live in the head's ``batch_stats`` collection
    # (``ConvFCBBoxHead.update_seesaw_counts``) and thread through the train
    # step via the live-BN mutable mechanism.  Deviation: the reference adds
    # a separate 2-channel objectness branch (cls_channels = C+2); this
    # rebuild applies the seesaw weighting across the existing C+1 softmax.
    loss_cls_type: str = "ce"  # 'ce' | 'seesaw'
    seesaw_p: float = 0.8
    seesaw_q: float = 2.0


def bbox_targets(
    cfg: BBoxHeadCfg,
    sampled_boxes: jnp.ndarray,  # (R, 4)
    is_pos: jnp.ndarray,  # (R,)
    valid: jnp.ndarray,  # (R,)
    matched_gt_boxes: jnp.ndarray,  # (R, 4)
    matched_gt_labels: jnp.ndarray,  # (R,)
):
    """Per-image sampled-RoI targets (reference ``bbox_head.py:122-255``):
    labels (bg = num_classes), unit label weights on valid slots, encoded
    (or raw, if ``reg_decoded_bbox``) box targets on positives."""
    labels = jnp.where(is_pos, matched_gt_labels, cfg.num_classes).astype(jnp.int32)
    label_weights = valid.astype(jnp.float32)
    if cfg.reg_decoded_bbox:
        t = matched_gt_boxes
    else:
        t = box_ops.bbox2delta(
            sampled_boxes, matched_gt_boxes, cfg.target_means, cfg.target_stds,
            eps=1e-6,
        )
    t = jnp.where(is_pos[:, None], t, 0.0)
    bbox_weights = is_pos[:, None].astype(jnp.float32) * jnp.ones((1, 4))
    return labels, label_weights, t, bbox_weights


def bbox_head_loss(
    cfg: BBoxHeadCfg,
    cls_score: jnp.ndarray,  # (R, C+1)
    bbox_pred: jnp.ndarray,  # (R, 4K)
    rois: jnp.ndarray,  # (R, 4)
    labels: jnp.ndarray,
    label_weights: jnp.ndarray,
    bbox_t: jnp.ndarray,
    bbox_w: jnp.ndarray,
    reduction_override: Optional[str] = None,
    seesaw_counts: Optional[jnp.ndarray] = None,  # (C+1,) cumulative
    beta_override: Optional[jnp.ndarray] = None,  # traced SmoothL1 beta
):
    """The reference head loss (``convfc_bbox_head.py:332-418``) on static
    shapes.  With ``reduction_override='none'`` returns elementwise losses
    for the boosting renormalisation."""
    r = cls_score.shape[0]
    c = cfg.num_classes
    pos = (labels >= 0) & (labels < c)
    posf = pos.astype(jnp.float32)

    if cfg.reg_class_agnostic:
        pred4 = bbox_pred.reshape(r, 4)
    else:
        safe_lab = jnp.clip(labels, 0, c - 1)
        pred4 = jnp.take_along_axis(
            bbox_pred.reshape(r, c, 4), safe_lab[:, None, None].repeat(4, -1), axis=1
        )[:, 0]

    if cfg.reg_decoded_bbox:
        pred_boxes = box_ops.delta2bbox(rois, pred4, cfg.target_means, cfg.target_stds)
        safe_t = jnp.where(pos[:, None], bbox_t, pred_boxes)
        if cfg.loss_bbox_type == "bounded_iou":
            # per-coordinate elementwise (reference
            # ``losses/iou_loss.py::bounded_iou_loss`` keeps the (N, 4)
            # shape; configs/faster_rcnn bounded_iou variant)
            from ..dense_heads.guided_anchor_head import bounded_iou_loss

            elem = bounded_iou_loss(pred_boxes, safe_t)
        else:
            box_fn = {"giou": L.giou_loss, "ciou": L.ciou_loss,
                      "iou": L.iou_loss, "eiou": L.eiou_loss,
                      "focal_eiou": L.focal_eiou_loss}[cfg.loss_bbox_type]
            elem = box_fn(pred_boxes, safe_t, reduction="none")[:, None] * jnp.ones((1, 4)) / 4.0
    else:
        if cfg.loss_bbox_type == "l1":
            elem = jnp.abs(pred4 - bbox_t)
        elif cfg.loss_bbox_type == "balanced_l1":
            elem = L.balanced_l1_loss(pred4, bbox_t, beta=cfg.smooth_l1_beta,
                                      reduction="none")
        else:
            d = jnp.abs(pred4 - bbox_t)
            b = (cfg.smooth_l1_beta if beta_override is None
                 else beta_override)  # Dynamic R-CNN: traced beta
            elem = jnp.where(d < b, 0.5 * d * d / b, d - 0.5 * b)
    elem = elem * bbox_w * posf[:, None] * cfg.loss_bbox_weight

    if cfg.focal_reg:
        # iou^gamma reweighting of the reg loss (``convfc_bbox_head.py:372``)
        dec_pred = box_ops.delta2bbox(rois, pred4, cfg.target_means, cfg.target_stds)
        dec_t = box_ops.delta2bbox(rois, bbox_t, cfg.target_means, cfg.target_stds)
        safe_t = jnp.where(pos[:, None], dec_t, dec_pred)
        iou_t = box_ops.bbox_overlaps_aligned(jax.lax.stop_gradient(dec_pred), safe_t)
        elem = elem * jnp.maximum(iou_t**cfg.focal_reg_gamma, 1e-12)[:, None]

    if cfg.loss_cls_type == "seesaw":
        assert seesaw_counts is not None, "seesaw needs cumulative counts"
        ce = L.seesaw_loss(
            cls_score, labels, seesaw_counts,
            p=cfg.seesaw_p, q=cfg.seesaw_q, reduction="none",
        )
    else:
        ce = L.cross_entropy_loss(cls_score, labels, reduction="none")
    ce = ce * label_weights * cfg.loss_cls_weight

    if reduction_override == "none":
        return {"loss_cls": ce, "loss_bbox": elem, "pos": pos}

    # mean reductions: cls by #(weight>0), reg by #sampled rois
    # (reference ``convfc_bbox_head.py:381-391``)
    avg_cls = jnp.maximum(jnp.sum((label_weights > 0).astype(jnp.float32)), 1.0)
    loss_cls = jnp.sum(ce) / avg_cls
    loss_bbox = jnp.sum(elem) / jnp.maximum(jnp.asarray(r, jnp.float32), 1.0)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "pos": pos}


def bbox_head_decode(
    cfg: BBoxHeadCfg,
    rois: jnp.ndarray,  # (R, 4)
    scores: jnp.ndarray,  # (R, C+1) — already activated/fused by caller
    bbox_pred: Optional[jnp.ndarray],  # (R, 4K)
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,  # (4,)
    rescale: bool,
    score_thr: float,
    nms_iou_thr: float,
    max_per_img: int,
    roi_valid: Optional[jnp.ndarray] = None,
    nms_type: str = "nms",
    pre_nms_top_k: int = 2048,
):
    """Decode + multiclass NMS for one image (reference
    ``ProbConvFCBBoxHead.get_bboxes:294-330``)."""
    r = rois.shape[0]
    c = cfg.num_classes
    if bbox_pred is not None and bbox_pred.shape[-1] == 0:
        bbox_pred = None  # with_reg=False head (Grid R-CNN)
    if bbox_pred is not None:
        boxes = box_ops.delta2bbox(
            rois, bbox_pred, cfg.target_means, cfg.target_stds, max_shape=img_shape
        ).reshape(r, -1, 4)
        if boxes.shape[1] == 1:
            boxes = jnp.broadcast_to(boxes, (r, c, 4))
    else:
        boxes = jnp.broadcast_to(
            box_ops.clip_boxes(rois, img_shape)[:, None, :], (r, c, 4)
        )
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 1, 4)
    return multiclass_nms_padded(
        boxes,
        scores[:, :c],
        score_thr=score_thr,
        iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
        valid=roi_valid,
        nms_type=nms_type,
        pre_nms_top_k=pre_nms_top_k,
    )


class DoubleBBoxHead(nn.Module):
    """Double-Head R-CNN bbox head (reference
    ``bbox_heads/double_bbox_head.py``): a conv branch (BasicResBlock +
    bottlenecks + avg-pool) regresses boxes while an fc branch classifies —
    decoupling localisation-friendly conv features from
    classification-friendly fc features.  Both branches read the same
    pooled RoI features (``DoubleHeadRoIHead`` pools once)."""

    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from ..layers import LiveBatchNorm

        def bn(name):
            return LiveBatchNorm(dtype=self.dtype, name=name)

        r, s, _, c = x.shape
        # --- conv (reg) branch ---
        # BasicResBlock: 3x3(keep ch) -> 1x1(out ch) + 1x1 identity
        y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="res_conv1")(x)
        y = nn.relu(bn("res_bn1")(y))
        y = nn.Conv(self.conv_out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="res_conv2")(y)
        y = bn("res_bn2")(y)
        idt = nn.Conv(self.conv_out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="res_identity")(x)
        y = nn.relu(y + bn("res_bn_identity")(idt))
        for i in range(self.num_convs):
            # bottleneck: 1x1 down -> 3x3 -> 1x1 up, residual
            mid = self.conv_out_channels // 4
            z = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"btl{i}_conv1")(y)
            z = nn.relu(bn(f"btl{i}_bn1")(z))
            z = nn.Conv(mid, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"btl{i}_conv2")(z)
            z = nn.relu(bn(f"btl{i}_bn2")(z))
            z = nn.Conv(self.conv_out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"btl{i}_conv3")(z)
            z = bn(f"btl{i}_bn3")(z)
            y = nn.relu(y + z)
        y = jnp.mean(y, axis=(1, 2))  # global avg pool
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")(y)

        # --- fc (cls) branch ---
        f = x.reshape(r, -1)
        for i in range(self.num_fcs):
            f = nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         name=f"fc_branch_{i}")(f)
            f = nn.relu(f)
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="fc_cls")(f)
        return cls, reg
