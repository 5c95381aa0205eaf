"""Cascade R-CNN detector (plain + ProbCascade fusion).

Reference: ``mmdet/models/roi_heads/cascade_roi_head.py`` and the fork's
``ProbCascadeRoIHead`` (``prob_roi_head.py:627-881``).  Deviations from the
reference, recorded deliberately:

  * the reference's cascade prior extraction indexes ``proposal_list`` by
    *stage* instead of image and reads column -1 of 4-column refined boxes
    (a latent bug); we carry each RoI's prior through refinement explicitly;
  * the reference's ``_bbox_forward_train_boost`` calls ``self.bbox_head
    .loss`` on the ModuleList (would crash); we apply the boosting weights
    with a standard weighted-mean reduction.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import multilevel_roi_align, multilevel_roi_align_fast
from ..roi_heads.bbox_head import BBoxHeadCfg, bbox_head_decode
from ..roi_heads.cascade_roi_head import (
    CascadeCfg,
    cascade_stage_loss,
    refine_boxes,
    stage_head_cfg,
)
from ..roi_heads.prob_roi_head import ProbRoICfg, RoISample, sample_rois
from .two_stage import ProposalCfg, RCNNTestCfg, TwoStageDetector, TwoStageNet


class CascadeNet(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    rpn: nn.Module
    bbox_heads: Tuple[nn.Module, ...]
    roi_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    roi_out_size: int = 7
    roi_sample_num: int = 2
    roi_finest_scale: int = 56

    def features(self, images):
        return self.neck(self.backbone(images))

    def rpn_out(self, feats):
        return self.rpn(feats)

    def seesaw_counts(self, labels, weights, stage: int):
        """Per-stage Seesaw cumulative class counts (each cascade stage's
        SeesawLoss keeps its own ``cum_samples`` in the reference)."""
        return self.bbox_heads[stage].update_seesaw_counts(labels, weights)

    def roi_out(self, feats, rois, roi_valid, stage: int):
        b, r, _ = rois.shape
        pooled = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(
                fl, rb, vb, self.roi_strides,
                out_size=self.roi_out_size, sample_num=self.roi_sample_num,
                finest_scale=self.roi_finest_scale,
                num_route_levels=len(self.roi_strides),
            )
        )(feats, rois, roi_valid)
        pooled = pooled.reshape(b * r, self.roi_out_size, self.roi_out_size, -1)
        return self.bbox_heads[stage](pooled)

    def __call__(self, images, rois, roi_valid):
        feats = self.features(images)
        rpn_outs = self.rpn_out(feats)
        outs = [
            self.roi_out(feats, rois, roi_valid, s)
            for s in range(len(self.bbox_heads))
        ]
        return rpn_outs, outs


class CascadeDetector(TwoStageDetector):
    def __init__(self, *args, cascade_cfg: CascadeCfg = CascadeCfg(), **kwargs):
        super().__init__(*args, **kwargs)
        self.cascade_cfg = cascade_cfg

    def _stage_seesaw_counts(self, variables, flat, stage: int):
        """Per-stage Seesaw count update/fetch (mirrors
        ``TwoStageDetector._seesaw_counts``: mutable under the train step's
        _MutableNet shim, pure fetch in a direct ``loss`` call)."""
        if getattr(self.bbox_cfg, "loss_cls_type", "ce") != "seesaw":
            return None
        labels = jnp.where(
            flat.is_pos, flat.matched_label, self.bbox_cfg.num_classes)
        w = flat.valid.astype(jnp.float32)
        if hasattr(self.net, "_net"):  # _MutableNet shim (train step)
            return self.net.apply(
                variables, labels, w, stage, method="seesaw_counts")
        counts, _upd = self.net.apply(
            variables, labels, w, stage, method="seesaw_counts",
            mutable=["batch_stats"],
        )
        return counts

    def loss(
        self,
        variables,
        rng,
        batch,
        anchors,
        num_level_anchors,
        anchor_valid=None,
        axis_name=None,
    ):
        from ..dense_heads.atss_rpn_head import atss_rpn_loss
        from ..dense_heads.rpn_head import rpn_loss

        images = batch["images"]
        b = images.shape[0]
        rpn_rng, roi_rng = jax.random.split(rng)
        feats = self.net.apply(variables, images, method=CascadeNet.features)
        cls, reg, iou = self._rpn_flat(variables, feats)
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        if self.rpn_type == "atss_rpn":
            losses = atss_rpn_loss(
                self.rpn_cfg, cls, reg, iou, anchors, valid,
                batch["gt_bboxes"], batch["gt_mask"],
                num_level_anchors, axis_name=axis_name,
            )
        else:
            losses = rpn_loss(
                self.rpn_cfg, cls, reg, anchors, valid,
                batch["gt_bboxes"], batch["gt_mask"], rng=rpn_rng,
                axis_name=axis_name,
            )
        prop_boxes, prop_scores, prop_valid = jax.tree.map(
            jax.lax.stop_gradient,
            self._proposals(
                cls, reg, iou, anchors, num_level_anchors,
                batch["img_shape"], self.train_proposal_cfg,
            ),
        )

        cc = self.cascade_cfg
        for stage in range(cc.num_stages):
            stage_rngs = jax.random.split(
                jax.random.fold_in(roi_rng, stage), b
            )
            thr = cc.stage_pos_iou[stage]
            stage_roi_cfg = dataclasses.replace(
                self.roi_cfg, pos_iou_thr=thr, neg_iou_thr=thr, min_pos_iou=thr
            )
            sample: RoISample = jax.vmap(
                lambda r_, pb, ps, pv, gb, gm, gl: sample_rois(
                    stage_roi_cfg, r_, pb, ps, pv, gb, gm, gl
                )
            )(
                stage_rngs, prop_boxes, prop_scores, prop_valid,
                batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"],
            )
            cls_s, reg_s = self.net.apply(
                variables, feats, sample.boxes, sample.valid,
                method=CascadeNet.roi_out, stage=stage,
            )
            flat = RoISample(*[x.reshape((-1,) + x.shape[2:]) for x in sample])
            losses.update(
                cascade_stage_loss(
                    cc, self.bbox_cfg, stage, cls_s, reg_s, flat,
                    seesaw_counts=self._stage_seesaw_counts(
                        variables, flat, stage),
                )
            )
            if stage < cc.num_stages - 1:
                # refine sampled boxes into next-stage proposals (gt rows
                # dropped like the reference's pos_is_gts filter; here gt
                # rows carry prior 0 and are marked invalid instead)
                hc = stage_head_cfg(self.bbox_cfg, stage)
                r = sample.boxes.shape[1]
                refined = jax.vmap(
                    lambda ro, cs, bp, shp: refine_boxes(hc, ro, cs, bp, shp)
                )(
                    sample.boxes,
                    jax.lax.stop_gradient(cls_s).reshape(b, r, -1),
                    jax.lax.stop_gradient(reg_s).reshape(b, r, -1),
                    batch["img_shape"],
                )
                is_gt_slot = sample.is_pos & (sample.prior == 0.0)
                prop_boxes = refined
                prop_scores = jnp.where(
                    sample.is_pos, sample.prior, 1.0 - sample.prior
                )  # undo neg transform: carried prior column
                prop_valid = sample.valid & ~is_gt_slot
        return losses

    def predict(
        self,
        variables,
        batch,
        anchors,
        num_level_anchors,
        rescale=True,
    ):
        images = batch["images"]
        b = images.shape[0]
        feats = self.net.apply(variables, images, method=CascadeNet.features)
        cls, reg, iou = self._rpn_flat(variables, feats)
        prop_boxes, prop_scores, prop_valid = self._proposals(
            cls, reg, iou, anchors, num_level_anchors,
            batch["img_shape"], self.test_proposal_cfg,
        )
        cc = self.cascade_cfg
        r = prop_boxes.shape[1]
        rois = prop_boxes
        ms_logits = []
        reg_s = None
        for stage in range(cc.num_stages):
            cls_s, reg_s = self.net.apply(
                variables, feats, rois, prop_valid,
                method=CascadeNet.roi_out, stage=stage,
            )
            cls_s = cls_s.reshape(b, r, -1).astype(jnp.float32)
            reg_s = reg_s.reshape(b, r, -1).astype(jnp.float32)
            ms_logits.append(cls_s)
            if stage < cc.num_stages - 1:
                hc = stage_head_cfg(self.bbox_cfg, stage)
                rois = jax.vmap(
                    lambda ro, cs, bp, shp: refine_boxes(hc, ro, cs, bp, shp)
                )(rois, cls_s, reg_s, batch["img_shape"])
        avg_logits = sum(ms_logits) / float(len(ms_logits))
        probs = jax.nn.softmax(avg_logits, axis=-1)
        if cc.prob:
            # ProbCascade fusion (``prob_roi_head.py:810-813``)
            fg = probs[..., :-1] * prop_scores[..., None]
            bg = probs[..., -1:] * (1.0 - prop_scores[..., None])
            probs = jnp.sqrt(jnp.maximum(jnp.concatenate([fg, bg], -1), 0.0))
        tc = self.rcnn_test_cfg
        hc_last = stage_head_cfg(self.bbox_cfg, cc.num_stages - 1)
        return jax.vmap(
            lambda ro, sc, bp, rv, shp, sf: bbox_head_decode(
                hc_last, ro, sc, bp, shp, sf, rescale,
                tc.score_thr, tc.nms_iou_thr, tc.max_per_img, roi_valid=rv,
                nms_type=tc.nms_type,
            )
        )(rois, probs, reg_s, prop_valid, batch["img_shape"], batch["scale_factor"])
