"""YOLACT (reference ``mmdet/models/detectors/yolact.py`` +
``dense_heads/yolact_head.py``: YOLACTHead / YOLACTProtonet /
YOLACTSegmHead).

Real-time instance segmentation: an SSD-style anchor head (softmax CE with
3:1 hard-negative mining, smooth-L1 boxes) additionally predicts 32 mask
coefficients per anchor (tanh); a protonet on P3 emits 32 prototype maps;
instance masks = sigmoid(protos @ coeffs) cropped to the box
(``YOLACTProtonet.forward:668``).  Train adds an auxiliary per-class
semantic map BCE (``YOLACTSegmHead``) and supervises at most
``max_masks_to_train`` positives per image with box-area-normalised BCE
(``YOLACTProtonet.loss:743``).  Test uses Fast NMS (``fast_nms``): one
per-class IoU matrix, keep a det iff no higher-scored same-class det
overlaps it above the threshold — a single batched matmul-style op on the
MXU instead of a sequential loop.

Fixed shapes: the mask branch gathers exactly ``max_masks_to_train``
positive slots per image (padded with zero weight); prototype combination
is one matmul per image.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops
from ...ops import losses as L
from ...ops.point_sample import point_sample
from ..dense_heads.atss_rpn_head import flatten_levels
from ..dense_heads.ssd_head import SSDCfg, ssd_loss


@dataclasses.dataclass(frozen=True)
class YOLACTCfg:
    num_classes: int = 80
    num_protos: int = 32
    max_masks_to_train: int = 100
    loss_mask_weight: float = 1.0
    loss_segm_weight: float = 1.0
    # test
    score_thr: float = 0.05
    iou_thr: float = 0.5
    top_k: int = 200
    max_per_img: int = 100


class YOLACTHeadConvs(nn.Module):
    """Anchor head with an extra tanh coefficient branch
    (``YOLACTHead._init_layers:83``: one shared head conv, then cls/reg/
    coeff 3x3 convs applied to every level)."""

    num_classes: int
    num_anchors: int = 3
    num_protos: int = 32
    feat_channels: int = 256
    num_head_convs: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        head = [nn.Conv(self.feat_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"head_conv{i}")
                for i in range(self.num_head_convs)]
        conv_cls = nn.Conv(self.num_anchors * (self.num_classes + 1),
                           (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(self.num_anchors * 4, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name="conv_reg")
        conv_coeff = nn.Conv(self.num_anchors * self.num_protos, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             name="conv_coeff")
        cls_l, reg_l, coeff_l = [], [], []
        for f in feats:
            y = f
            for conv in head:
                y = nn.relu(conv(y))
            cls_l.append(conv_cls(y))
            reg_l.append(conv_reg(y))
            coeff_l.append(jnp.tanh(conv_coeff(y)))
        return cls_l, reg_l, coeff_l


class YOLACTProtonet(nn.Module):
    """P3 -> (256,3)x3 -> x2 upsample -> (256,3) -> (32,1)
    (``proto_channels=(256,256,256,None,256,32)``)."""

    num_protos: int = 32
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, name=f"conv{i}")(x))
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
        x = nn.relu(nn.Conv(self.channels, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="conv3")(x))
        return nn.Conv(self.num_protos, (1, 1), dtype=self.dtype,
                       name="proto_out")(x)


class YOLACTSegmHead(nn.Module):
    """One 1x1 conv on P3 -> per-class semantic logits
    (``YOLACTSegmHead:461``)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="segm_conv")(x)


class YOLACTNet(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module
    protonet: nn.Module
    segm_head: nn.Module

    def features(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images):
        feats = self.features(images)
        cls_l, reg_l, coeff_l = self.head(feats)
        protos = self.protonet(feats[0])
        segm = self.segm_head(feats[0])
        return cls_l, reg_l, coeff_l, protos, segm


def crop_sample_mask(crop28, box, out_h, out_w, canvas_hw):
    """Sample a (m, m) box-relative gt-mask crop onto an (out_h, out_w)
    canvas-aligned grid: bilinear inside the box, 0 outside."""
    h, w = canvas_hw
    ys = (jnp.arange(out_h) + 0.5) / out_h * h
    xs = (jnp.arange(out_w) + 0.5) / out_w * w
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)
    u = (xs[None, :] - x1) / bw  # (1, W)
    v = (ys[:, None] - y1) / bh  # (H, 1)
    pts = jnp.stack(
        [jnp.broadcast_to(u, (out_h, out_w)),
         jnp.broadcast_to(v, (out_h, out_w))], axis=-1
    ).reshape(-1, 2)
    vals = point_sample(crop28[..., None].astype(jnp.float32), pts)[..., 0]
    vals = vals.reshape(out_h, out_w)
    inside = ((u >= 0) & (u <= 1)) & ((v >= 0) & (v <= 1))
    return jnp.where(inside, vals, 0.0)


def crop_mask_by_box(mask, box, canvas_hw):
    """Zero a canvas-aligned (H, W) map outside the (unnormalised) box
    (reference ``YOLACTProtonet.crop``)."""
    h_m, w_m = mask.shape
    h, w = canvas_hw
    ys = (jnp.arange(h_m) + 0.5) / h_m * h
    xs = (jnp.arange(w_m) + 0.5) / w_m * w
    inside = (
        (xs[None, :] >= box[0]) & (xs[None, :] <= box[2])
        & (ys[:, None] >= box[1]) & (ys[:, None] <= box[3])
    )
    return mask * inside


def fast_nms(boxes, scores, iou_thr, top_k, max_per_img, score_thr):
    """YOLACT Fast NMS for one image: boxes (N, 4), scores (N, C) fg.

    Per class: take top_k by score, IoU matrix, keep iff the max IoU with
    any higher-scored same-class det <= thr.  Returns (dets (max_per_img,
    5), labels, valid, kept_box_idx)."""
    n, c = scores.shape
    k = min(top_k, n)
    top_s, top_i = jax.lax.top_k(scores.T, k)  # (C, k) sorted desc
    top_boxes = boxes[top_i]  # (C, k, 4)
    iou = jax.vmap(box_ops.bbox_overlaps)(top_boxes, top_boxes)  # (C,k,k)
    tri = jnp.tril(jnp.ones((k, k), bool), -1)  # j<i (higher scored)
    max_iou = jnp.max(jnp.where(tri[None], iou, 0.0), axis=-1)  # (C, k)
    keep = (max_iou <= iou_thr) & (top_s > score_thr)
    flat_s = jnp.where(keep, top_s, -1.0).reshape(-1)
    flat_boxes = top_boxes.reshape(-1, 4)
    flat_lab = jnp.repeat(jnp.arange(c, dtype=jnp.int32), k)
    flat_idx = top_i.reshape(-1)
    out_s, sel = jax.lax.top_k(flat_s, max_per_img)
    valid = out_s > 0
    dets = jnp.concatenate(
        [flat_boxes[sel], jnp.where(valid, out_s, 0.0)[:, None]], -1)
    return dets, jnp.where(valid, flat_lab[sel], 0), valid, \
        jnp.where(valid, flat_idx[sel], 0)


class YOLACTDetector:
    def __init__(self, net: YOLACTNet, anchor_generator, ssd_cfg: SSDCfg,
                 cfg: YOLACTCfg):
        self.net = net
        self.anchor_generator = anchor_generator
        self.ssd_cfg = ssd_cfg
        self.cfg = cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s[1]), math.ceil(canvas_hw[1] / s[0]))
            for s in self.anchor_generator.strides
        ]

    def anchors_for(self, canvas_hw):
        fs = self.featmap_sizes(canvas_hw)
        flat = self.anchor_generator.flat_anchors(fs)
        nla = [a.shape[0] for a in self.anchor_generator.grid_anchors(fs)]
        return jnp.asarray(flat), tuple(nla)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _outs(self, variables, images):
        cls_l, reg_l, coeff_l, protos, segm = self.net.apply(
            variables, images)
        cls = flatten_levels(cls_l, self.cfg.num_classes + 1)
        reg = flatten_levels(reg_l, 4)
        coeff = flatten_levels(coeff_l, self.cfg.num_protos)
        return cls, reg, coeff, protos, segm

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ...ops.assigners import max_iou_assign

        images = batch["images"]
        b = images.shape[0]
        canvas_hw = (images.shape[1], images.shape[2])
        cls, reg, coeff, protos, segm = self._outs(variables, images)
        valid = (anchor_valid if anchor_valid is not None
                 else jnp.ones((b, anchors.shape[0]), bool))
        losses = ssd_loss(
            self.ssd_cfg, cls, reg, anchors, valid, batch["gt_bboxes"],
            batch["gt_labels"], batch["gt_mask"], axis_name=axis_name)

        if "gt_mask_crops" not in batch:
            return losses
        mm = self.cfg.max_masks_to_train
        ph, pw = protos.shape[1], protos.shape[2]

        def per_img(cf, pr, gb, gl, gm, crops):
            assign = max_iou_assign(
                anchors, jnp.ones((anchors.shape[0],), bool), gb, gm,
                gt_labels=gl, pos_iou_thr=self.ssd_cfg.pos_iou_thr,
                neg_iou_thr=self.ssd_cfg.neg_iou_thr,
                min_pos_iou=self.ssd_cfg.min_pos_iou,
                match_low_quality=True)
            pos = assign.gt_inds > 0
            # deterministic top-mm positive slots (score = iou)
            sel_score = jnp.where(pos, assign.max_overlaps, -1.0)
            _, sel = jax.lax.top_k(sel_score, mm)
            sel_valid = pos[sel]
            gt_idx = jnp.clip(assign.gt_inds[sel] - 1, 0, gb.shape[0] - 1)
            sel_coeff = cf[sel]  # (mm, P)
            mask_pred = jax.nn.sigmoid(
                pr.astype(jnp.float32) @ sel_coeff.astype(jnp.float32).T
            )  # (ph, pw, mm)
            boxes = gb[gt_idx]  # (mm, 4)
            tgt = jax.vmap(
                lambda cr, bx: crop_sample_mask(cr, bx, ph, pw, canvas_hw)
            )(crops[gt_idx].astype(jnp.float32), boxes)  # (mm, ph, pw)
            pred = jax.vmap(
                lambda m, bx: crop_mask_by_box(m, bx, canvas_hw)
            )(mask_pred.transpose(2, 0, 1), boxes)
            pred = jnp.clip(pred, 1e-4, 1 - 1e-4)
            bce = -(tgt * jnp.log(pred) + (1 - tgt) * jnp.log(1 - pred))
            bw = (boxes[:, 2] - boxes[:, 0]) / canvas_hw[1]
            bh = (boxes[:, 3] - boxes[:, 1]) / canvas_hw[0]
            per = bce.mean(axis=(1, 2)) / jnp.maximum(bw * bh, 1e-4)
            return (per * sel_valid.astype(jnp.float32)).sum(), \
                sel_valid.astype(jnp.float32).sum()

        mloss, npos = jax.vmap(per_img)(
            coeff, protos, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_mask"], batch["gt_mask_crops"])
        total_pos = jnp.maximum(jnp.sum(npos), 1.0)
        losses["loss_mask"] = (self.cfg.loss_mask_weight
                               * jnp.sum(mloss) / total_pos)

        # segm aux: per-class union of gt masks at segm resolution
        sh, sw = segm.shape[1], segm.shape[2]
        c = self.cfg.num_classes

        def segm_tgt(gb, gl, gm, crops):
            per_gt = jax.vmap(
                lambda cr, bx: crop_sample_mask(cr, bx, sh, sw, canvas_hw)
            )(crops.astype(jnp.float32), gb)  # (G, sh, sw)
            per_gt = per_gt * gm[:, None, None].astype(jnp.float32)
            onehot = jax.nn.one_hot(gl, c)  # (G, C)
            return jnp.einsum("ghw,gc->hwc", per_gt, onehot).clip(0, 1)

        tgt = jax.vmap(segm_tgt)(
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            batch["gt_mask_crops"])
        losses["loss_segm"] = self.cfg.loss_segm_weight * jnp.mean(
            L.binary_cross_entropy_loss(
                segm.astype(jnp.float32), tgt, reduction="none"))
        return losses

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        images = batch["images"]
        b = images.shape[0]
        canvas_hw = (images.shape[1], images.shape[2])
        cls, reg, coeff, protos, segm = self._outs(variables, images)
        tc = self.cfg

        def per_img(c_, r_, cf, pr, shp, sf):
            probs = jax.nn.softmax(c_.astype(jnp.float32), axis=-1)[:, :-1]
            boxes = box_ops.delta2bbox(
                anchors, r_.astype(jnp.float32), self.ssd_cfg.target_means,
                self.ssd_cfg.target_stds, max_shape=shp)
            dets, labels, valid, kept = fast_nms(
                boxes, probs, tc.iou_thr, tc.top_k, tc.max_per_img,
                tc.score_thr)
            kc = cf[kept]  # (D, P)
            mp = jax.nn.sigmoid(
                pr.astype(jnp.float32) @ kc.astype(jnp.float32).T
            ).transpose(2, 0, 1)  # (D, ph, pw)
            mp = jax.vmap(
                lambda m, bx: crop_mask_by_box(m, bx, canvas_hw)
            )(mp, dets[:, :4])
            # box-relative 28x28 crops (framework-wide mask convention)
            def to_crop(m, bx):
                x1, y1, x2, y2 = bx[0], bx[1], bx[2], bx[3]
                u = x1 / canvas_hw[1] + (jnp.arange(28) + 0.5) / 28 \
                    * (x2 - x1) / canvas_hw[1]
                v = y1 / canvas_hw[0] + (jnp.arange(28) + 0.5) / 28 \
                    * (y2 - y1) / canvas_hw[0]
                pts = jnp.stack([
                    jnp.broadcast_to(u[None, :], (28, 28)),
                    jnp.broadcast_to(v[:, None], (28, 28))], -1
                ).reshape(-1, 2)
                return point_sample(m[..., None], pts)[..., 0].reshape(28, 28)

            crops = jax.vmap(to_crop)(mp, dets[:, :4])
            if rescale:
                dets = jnp.concatenate(
                    [dets[:, :4] / sf.reshape(1, 4), dets[:, 4:5]], -1)
            return dets, labels, valid, crops

        return jax.vmap(per_img)(
            cls, reg, coeff, protos, batch["img_shape"],
            batch["scale_factor"])
