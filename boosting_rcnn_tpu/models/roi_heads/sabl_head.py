"""SABL two-stage bbox head + detector (reference
``mmdet/models/roi_heads/bbox_heads/sabl_head.py:15`` SABLHead and
``configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py``).

Side-Aware Boundary Localization for the RoI stage: a conv tower refines
the 7x7 RoI features, attention pooling collapses them into per-column
(x) and per-row (y) side features, 1-D convs + a 2x ConvTranspose
upsample bring each to ``num_buckets`` positions, and two linear
predictors emit per-side bucket classification logits and fine offsets.
Decoding and targets use the bucketing coder (``ops/bucketing_coder.py``,
reference ``bucketing_bbox_coder.py``); test-time scores are rescored by
the bucketing confidence (``score_factors`` in multiclass NMS,
``sabl_head.py:510``).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.bucketing_coder import bbox2bucket, bucket2bbox
from ...ops import losses as L
from .prob_roi_head import RoISample


class SABLBBoxHead(nn.Module):
    """-> (cls (R, C+1), packed (R, 8*side)) where packed =
    concat([bucket_cls (R, 4*side), bucket_offset (R, 4*side)], -1) so the
    generic ``TwoStageNet.roi_out`` plumbing passes it through unchanged.
    """

    num_classes: int
    in_channels: int = 256
    roi_feat_size: int = 7
    reg_feat_up_ratio: int = 2
    reg_pre_kernel: int = 3
    reg_post_kernel: int = 3
    reg_pre_num: int = 2
    reg_post_num: int = 1
    cls_out_channels: int = 1024
    reg_offset_out_channels: int = 256
    reg_cls_out_channels: int = 256
    num_cls_fcs: int = 1
    num_reg_fcs: int = 0
    num_buckets: int = 14
    dtype: Any = jnp.float32

    @property
    def side_num(self) -> int:
        return int(math.ceil(self.num_buckets / 2))

    def _side_split(self, pred):
        """(R, L) -> (R, L) reordered [left ceil(L/2), flipped right]
        (reference ``side_aware_split``)."""
        up = self.roi_feat_size * self.reg_feat_up_ratio
        l_end = int(math.ceil(up / 2))
        r_start = int(math.floor(up / 2))
        return jnp.concatenate(
            [pred[:, :l_end], pred[:, r_start:][:, ::-1]], axis=-1)

    @nn.compact
    def __call__(self, x):  # x: (R, 7, 7, C)
        r = x.shape[0]
        c = self.in_channels

        # ---- cls branch: fcs on the flattened RoI ----
        cf = x.reshape(r, -1)
        for i in range(self.num_cls_fcs):
            cf = nn.relu(nn.Dense(self.cls_out_channels, dtype=self.dtype,
                                  name=f"cls_fc_{i}")(cf))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="fc_cls")(cf).astype(jnp.float32)

        # ---- reg branch ----
        y = x
        for i in range(self.reg_pre_num):
            k = self.reg_pre_kernel
            y = nn.relu(nn.Conv(
                c, (k, k), padding=[(k // 2, k // 2)] * 2, dtype=self.dtype,
                name=f"reg_pre_conv_{i}")(y))
        # attention pooling (``attention_pool``): fx collapses rows (H),
        # fy collapses columns (W)
        att_x = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), dtype=self.dtype, name="reg_conv_att_x")(y)
        ).astype(jnp.float32)
        att_y = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), dtype=self.dtype, name="reg_conv_att_y")(y)
        ).astype(jnp.float32)
        att_x = att_x / att_x.sum(axis=1, keepdims=True)
        att_y = att_y / att_y.sum(axis=2, keepdims=True)
        yf = y.astype(jnp.float32)
        fx = (yf * att_x).sum(axis=1).astype(self.dtype)  # (R, W, C)
        fy = (yf * att_y).sum(axis=2).astype(self.dtype)  # (R, H, C)
        for i in range(self.reg_post_num):
            k = self.reg_post_kernel
            fx = nn.relu(nn.Conv(c, (k,), padding=[(k // 2, k // 2)],
                                 dtype=self.dtype,
                                 name=f"reg_post_conv_x_{i}")(fx))
            fy = nn.relu(nn.Conv(c, (k,), padding=[(k // 2, k // 2)],
                                 dtype=self.dtype,
                                 name=f"reg_post_conv_y_{i}")(fy))
        if self.reg_feat_up_ratio > 1:
            u = self.reg_feat_up_ratio
            fx = nn.relu(nn.ConvTranspose(
                c, (u,), strides=(u,), dtype=self.dtype,
                name="upsample_x")(fx))
            fy = nn.relu(nn.ConvTranspose(
                c, (u,), strides=(u,), dtype=self.dtype,
                name="upsample_y")(fy))
        # per-position predictors, SHARED between the x and y branches
        # (reference reg_pred reuses reg_offset_fcs/fc_reg_offset for both)
        offset_fcs = [
            nn.Dense(self.reg_offset_out_channels, dtype=self.dtype,
                     name=f"reg_offset_fc_{i}")
            for i in range(self.num_reg_fcs)
        ]
        cls_fcs = [
            nn.Dense(self.reg_cls_out_channels, dtype=self.dtype,
                     name=f"reg_cls_fc_{i}")
            for i in range(self.num_reg_fcs)
        ]
        fc_reg_offset = nn.Dense(1, dtype=self.dtype, name="fc_reg_offset")
        fc_reg_cls = nn.Dense(1, dtype=self.dtype, name="fc_reg_cls")

        def reg_pred(f):
            z_off, z_cls = f, f
            for fc in offset_fcs:
                z_off = nn.relu(fc(z_off))
            for fc in cls_fcs:
                z_cls = nn.relu(fc(z_cls))
            return fc_reg_offset(z_off)[..., 0], fc_reg_cls(z_cls)[..., 0]

        off_x, cls_x = reg_pred(fx)
        off_y, cls_y = reg_pred(fy)
        off_x, cls_x = self._side_split(off_x), self._side_split(cls_x)
        off_y, cls_y = self._side_split(off_y), self._side_split(cls_y)
        bucket_cls = jnp.concatenate([cls_x, cls_y], axis=-1)
        bucket_off = jnp.concatenate([off_x, off_y], axis=-1)
        packed = jnp.concatenate(
            [bucket_cls, bucket_off], axis=-1).astype(jnp.float32)
        return cls, packed


def sabl_roi_loss(
    num_classes: int,
    side_num: int,
    num_buckets: int,
    scale_factor: float,
    cls_s: jnp.ndarray,  # (N, C+1)
    packed: jnp.ndarray,  # (N, 8*side)
    flat: RoISample,
) -> Dict[str, jnp.ndarray]:
    """Reference ``SABLHead.loss`` on the padded sample: softmax CE for
    classification; per-side sigmoid CE for bucket estimation (avg by
    valid*4 rows); smooth-L1 beta 0.1 for fine offsets (avg by valid)."""
    n = cls_s.shape[0]
    valid = flat.valid
    pos = flat.is_pos & valid
    vcount = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)

    labels = jnp.where(pos, flat.matched_label, num_classes)
    logp = jax.nn.log_softmax(cls_s.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss_cls = -jnp.sum(jnp.where(valid, ll, 0.0)) / vcount

    bucket_cls = packed[:, : 4 * side_num]
    bucket_off = packed[:, 4 * side_num:]
    offsets, off_w, bucket_labels, cls_w = bbox2bucket(
        flat.boxes, flat.matched_gt, num_buckets, scale_factor)
    posf = pos.astype(jnp.float32)[:, None]
    bce = (jnp.logaddexp(0.0, bucket_cls)
           - bucket_cls * bucket_labels)  # sigmoid CE with logits
    loss_bbox_cls = jnp.sum(bce * cls_w * posf) / (vcount * 4.0)
    sl1 = L.smooth_l1_loss(bucket_off, offsets, beta=0.1, reduction="none")
    loss_bbox_reg = jnp.sum(sl1 * off_w * posf) / vcount
    return {
        "loss_cls": loss_cls,
        "loss_bbox_cls": loss_bbox_cls,
        "loss_bbox_reg": loss_bbox_reg,
    }


def make_sabl_detector_class():
    from ..detectors.two_stage import TwoStageDetector, TwoStageNet

    class SABLDetector(TwoStageDetector):
        """Faster R-CNN with the SABL bucketing bbox head."""

        def __init__(self, *args, num_buckets: int = 14,
                     bucket_scale_factor: float = 1.7, **kwargs):
            super().__init__(*args, **kwargs)
            self.num_buckets = num_buckets
            self.bucket_scale_factor = bucket_scale_factor
            self.side_num = int(math.ceil(num_buckets / 2))

        def _roi_losses(self, cls_s, reg_s, flat, seesaw_counts=None):
            # seesaw is a ConvFC-head option; SABL's bucketing loss ignores it
            return sabl_roi_loss(
                self.bbox_cfg.num_classes, self.side_num, self.num_buckets,
                self.bucket_scale_factor, cls_s, reg_s, flat)

        def predict(self, variables, batch, anchors, num_level_anchors,
                    rescale: bool = True):
            from ...ops.nms import multiclass_nms_padded

            images = batch["images"]
            b = images.shape[0]
            feats = self.net.apply(
                variables, images, method=TwoStageNet.features)
            cls, reg, iou = self._rpn_flat(variables, feats)
            prop_boxes, prop_scores, prop_valid = self._proposals(
                cls, reg, iou, anchors, num_level_anchors,
                batch["img_shape"], self.test_proposal_cfg,
            )
            roi_feats = getattr(self, "_roi_feats", feats)
            cls_s, packed = self.net.apply(
                variables, roi_feats, prop_boxes, prop_valid, inference=True,
                method=TwoStageNet.roi_out,
            )
            r = prop_boxes.shape[1]
            cls_s = cls_s.reshape(b, r, -1)
            packed = packed.reshape(b, r, -1)
            scores = jax.nn.softmax(cls_s.astype(jnp.float32), axis=-1)
            tc = self.rcnn_test_cfg

            def one(pb, pv, sc, pk, shp, sf):
                boxes, confids = bucket2bbox(
                    pb, pk[:, : 4 * self.side_num],
                    pk[:, 4 * self.side_num:],
                    self.num_buckets, self.bucket_scale_factor,
                    max_shape=shp,
                )
                if rescale:
                    boxes = boxes / sf[None, :]
                fg = sc[:, :-1]  # drop bg column
                dets, labels, valid = multiclass_nms_padded(
                    boxes, fg, tc.score_thr, tc.nms_iou_thr, tc.max_per_img,
                    score_factors=confids, valid=pv,
                    pre_nms_top_k=tc.pre_nms_top_k,
                )
                return dets, labels, valid

            return jax.vmap(one)(
                prop_boxes, prop_valid, scores, packed,
                batch["img_shape"], batch["scale_factor"],
            )

    return SABLDetector


def make_sabl_cascade_class():
    """Cascade R-CNN with SABL bucketing bbox heads per stage (reference
    ``configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py``): each stage's
    loss is the SABL bucketing loss, between-stage refinement decodes via
    ``bucket2bbox`` (detached), inference averages stage cls scores and
    decodes the last stage's buckets with bucket-confidence score factors."""
    import dataclasses as _dc

    from ..detectors.cascade import CascadeDetector, CascadeNet
    from .prob_roi_head import RoISample, sample_rois

    class SABLCascadeDetector(CascadeDetector):
        def __init__(self, *args, num_buckets: int = 14,
                     bucket_scale_factor: float = 1.7, **kwargs):
            super().__init__(*args, **kwargs)
            self.num_buckets = num_buckets
            self.bucket_scale_factor = bucket_scale_factor
            self.side_num = int(math.ceil(num_buckets / 2))

        def _bucket_decode(self, boxes, packed, img_shape):
            out, confids = bucket2bbox(
                boxes, packed[:, : 4 * self.side_num],
                packed[:, 4 * self.side_num:],
                self.num_buckets, self.bucket_scale_factor,
                max_shape=img_shape,
            )
            return out, confids

        def loss(self, variables, rng, batch, anchors, num_level_anchors,
                 anchor_valid=None, axis_name=None):
            from ..dense_heads.atss_rpn_head import atss_rpn_loss
            from ..dense_heads.rpn_head import rpn_loss

            images = batch["images"]
            b = images.shape[0]
            rpn_rng, roi_rng = jax.random.split(rng)
            feats = self.net.apply(
                variables, images, method=CascadeNet.features)
            cls, reg, iou = self._rpn_flat(variables, feats)
            valid = (anchor_valid if anchor_valid is not None
                     else jnp.ones((b, anchors.shape[0]), bool))
            if self.rpn_type == "atss_rpn":
                losses = atss_rpn_loss(
                    self.rpn_cfg, cls, reg, iou, anchors, valid,
                    batch["gt_bboxes"], batch["gt_mask"],
                    num_level_anchors, axis_name=axis_name)
            else:
                losses = rpn_loss(
                    self.rpn_cfg, cls, reg, anchors, valid,
                    batch["gt_bboxes"], batch["gt_mask"], rng=rpn_rng,
                    axis_name=axis_name)
            prop_boxes, prop_scores, prop_valid = jax.tree.map(
                jax.lax.stop_gradient,
                self._proposals(
                    cls, reg, iou, anchors, num_level_anchors,
                    batch["img_shape"], self.train_proposal_cfg))

            cc = self.cascade_cfg
            for stage in range(cc.num_stages):
                stage_rngs = jax.random.split(
                    jax.random.fold_in(roi_rng, stage), b)
                thr = cc.stage_pos_iou[stage]
                stage_roi_cfg = _dc.replace(
                    self.roi_cfg, pos_iou_thr=thr, neg_iou_thr=thr,
                    min_pos_iou=thr)
                sample: RoISample = jax.vmap(
                    lambda r_, pb, ps, pv, gb, gm, gl: sample_rois(
                        stage_roi_cfg, r_, pb, ps, pv, gb, gm, gl)
                )(stage_rngs, prop_boxes, prop_scores, prop_valid,
                  batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"])
                cls_s, packed = self.net.apply(
                    variables, feats, sample.boxes, sample.valid,
                    method=CascadeNet.roi_out, stage=stage)
                flat = RoISample(
                    *[x.reshape((-1,) + x.shape[2:]) for x in sample])
                stage_losses = sabl_roi_loss(
                    self.bbox_cfg.num_classes, self.side_num,
                    self.num_buckets, self.bucket_scale_factor,
                    cls_s, packed, flat)
                w = cc.stage_loss_weights[stage]
                losses.update({
                    f"s{stage}.{k}": w * v for k, v in stage_losses.items()
                })
                if stage < cc.num_stages - 1:
                    r = sample.boxes.shape[1]
                    pk = jax.lax.stop_gradient(packed).reshape(b, r, -1)
                    refined, _ = jax.vmap(
                        lambda bx, p_, shp: self._bucket_decode(bx, p_, shp)
                    )(sample.boxes, pk, batch["img_shape"])
                    is_gt_slot = sample.is_pos & (sample.prior == 0.0)
                    prop_boxes = refined
                    prop_scores = jnp.where(
                        sample.is_pos, sample.prior, 1.0 - sample.prior)
                    prop_valid = sample.valid & ~is_gt_slot
            return losses

        def predict(self, variables, batch, anchors, num_level_anchors,
                    rescale: bool = True):
            from ...ops.nms import multiclass_nms_padded

            images = batch["images"]
            b = images.shape[0]
            feats = self.net.apply(
                variables, images, method=CascadeNet.features)
            cls, reg, iou = self._rpn_flat(variables, feats)
            prop_boxes, prop_scores, prop_valid = self._proposals(
                cls, reg, iou, anchors, num_level_anchors,
                batch["img_shape"], self.test_proposal_cfg)
            cc = self.cascade_cfg
            r = prop_boxes.shape[1]
            rois = prop_boxes
            ms_logits = []
            packed = None
            for stage in range(cc.num_stages):
                cls_s, packed = self.net.apply(
                    variables, feats, rois, prop_valid,
                    method=CascadeNet.roi_out, stage=stage)
                cls_s = cls_s.reshape(b, r, -1).astype(jnp.float32)
                packed = packed.reshape(b, r, -1).astype(jnp.float32)
                ms_logits.append(cls_s)
                if stage < cc.num_stages - 1:
                    rois, _ = jax.vmap(
                        lambda bx, p_, shp: self._bucket_decode(bx, p_, shp)
                    )(rois, packed, batch["img_shape"])
            avg = sum(ms_logits) / float(len(ms_logits))
            scores = jax.nn.softmax(avg, axis=-1)
            tc = self.rcnn_test_cfg

            def one(pb, pv, sc, pk, shp, sf):
                boxes, confids = self._bucket_decode(pb, pk, shp)
                if rescale:
                    boxes = boxes / sf[None, :]
                fg = sc[:, :-1]
                return multiclass_nms_padded(
                    boxes, fg, tc.score_thr, tc.nms_iou_thr, tc.max_per_img,
                    score_factors=confids, valid=pv,
                    pre_nms_top_k=tc.pre_nms_top_k)

            return jax.vmap(one)(
                rois, prop_valid, scores, packed,
                batch["img_shape"], batch["scale_factor"])

    return SABLCascadeDetector
