"""Hybrid Task Cascade (reference ``mmdet/models/detectors/htc.py`` +
``roi_heads/htc_roi_head.py:14``).

Cascade R-CNN with three HTC additions, all reproduced on fixed shapes:

  * **interleaved execution** (``htc_roi_head.py:296-313``): each stage's
    mask branch trains on boxes *refined* by that stage's bbox branch
    (re-assigned + re-sampled);
  * **mask information flow** (``:140-148``): stage-i's mask head fuses the
    running feature of mask heads 0..i-1 executed on the same RoIs
    (``HTCMaskHead.conv_res``);
  * optional **semantic branch** (``FusedSemanticHead``): pixel-CE on a
    stuff map, and its embedding pooled + summed into box/mask RoI features
    (``semantic_fusion``).  The batch must carry ``gt_semantic_seg`` when a
    semantic head is configured.

Inference (``simple_test:330-420``): cascade bbox decode as Cascade R-CNN,
then every stage's mask head runs on the final detections with info flow
and the per-stage sigmoid outputs are averaged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import multilevel_roi_align_fast
from ..roi_heads.bbox_head import bbox_head_decode
from ..roi_heads.cascade_roi_head import (
    CascadeCfg,
    cascade_stage_loss,
    refine_boxes,
    stage_head_cfg,
)
from ..roi_heads.mask_head import (
    mask_loss,
    resample_mask_targets,
    semantic_seg_loss,
)
from ..roi_heads.prob_roi_head import RoISample, sample_rois
from .cascade import CascadeDetector, CascadeNet


class HTCNet(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    rpn: nn.Module
    bbox_heads: Tuple[nn.Module, ...]
    mask_heads: Tuple[nn.Module, ...]
    semantic_head: Optional[nn.Module] = None
    # False -> plain Cascade Mask R-CNN: independent per-stage mask heads,
    # no running-feature fusion (reference ``cascade_roi_head.py`` vs
    # ``htc_roi_head.py:140-148``)
    mask_info_flow: bool = True
    roi_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    roi_out_size: int = 7
    mask_roi_out_size: int = 14
    roi_sample_num: int = 2
    roi_finest_scale: int = 56
    semantic_stride: int = 8  # semantic embedding lives at the P2/P3 level

    def features(self, images):
        return self.neck(self.backbone(images))

    def rpn_out(self, feats):
        return self.rpn(feats)

    def semantic_out(self, feats):
        return self.semantic_head(feats)

    def seesaw_counts(self, labels, weights, stage: int):
        """Per-stage Seesaw cumulative class counts (the LVIS cascade
        seesaw configs)."""
        return self.bbox_heads[stage].update_seesaw_counts(labels, weights)

    def _pool(self, feats, rois, roi_valid, out_size):
        b, r, _ = rois.shape
        pooled = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(
                fl, rb, vb, self.roi_strides,
                out_size=out_size, sample_num=self.roi_sample_num,
                finest_scale=self.roi_finest_scale,
                num_route_levels=len(self.roi_strides),
            )
        )(feats, rois, roi_valid)
        return pooled.reshape(b * r, out_size, out_size, -1)

    def _pool_semantic(self, sem_feat, rois, roi_valid, out_size):
        """Pool the single-level semantic embedding for RoI fusion
        (reference ``semantic_roi_extractor``: one level, stride 8)."""
        b, r, _ = rois.shape
        pooled = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(
                (fl,), rb, vb, (self.semantic_stride,),
                out_size=out_size, sample_num=self.roi_sample_num,
                finest_scale=self.roi_finest_scale, num_route_levels=1,
            )
        )(sem_feat, rois, roi_valid)
        return pooled.reshape(b * r, out_size, out_size, -1)

    def bbox_out(self, feats, rois, roi_valid, stage: int, sem_feat=None):
        pooled = self._pool(feats, rois, roi_valid, self.roi_out_size)
        if sem_feat is not None:
            pooled = pooled + self._pool_semantic(
                sem_feat, rois, roi_valid, self.roi_out_size
            )
        return self.bbox_heads[stage](pooled)

    def mask_out(self, feats, rois, roi_valid, stage: int, sem_feat=None):
        """Pooled mask features -> (logits, via info flow through heads
        0..stage)."""
        pooled = self._pool(feats, rois, roi_valid, self.mask_roi_out_size)
        if sem_feat is not None:
            pooled = pooled + self._pool_semantic(
                sem_feat, rois, roi_valid, self.mask_roi_out_size
            )
        last_feat = None
        if self.mask_info_flow:
            for i in range(stage):
                last_feat = self.mask_heads[i](
                    pooled, last_feat, return_logits=False, return_feat=True
                )
        return self.mask_heads[stage](
            pooled, last_feat, return_logits=True, return_feat=False
        )

    def mask_out_all_stages(self, feats, rois, roi_valid, sem_feat=None):
        """Inference: every stage's logits on the same rois with info flow
        (reference ``simple_test`` mask loop); caller averages sigmoids."""
        pooled = self._pool(feats, rois, roi_valid, self.mask_roi_out_size)
        if sem_feat is not None:
            pooled = pooled + self._pool_semantic(
                sem_feat, rois, roi_valid, self.mask_roi_out_size
            )
        outs = []
        last_feat = None
        for i, head in enumerate(self.mask_heads):
            logits, last_feat = head(
                pooled, last_feat, return_logits=True, return_feat=True
            )
            if not self.mask_info_flow:
                last_feat = None
            outs.append(logits)
        return outs

    def __call__(self, images, rois, roi_valid):
        feats = self.features(images)
        rpn_outs = self.rpn_out(feats)
        sem_feat = None
        if self.semantic_head is not None:
            _, sem_feat = self.semantic_out(feats)
        for s in range(len(self.bbox_heads)):
            self.bbox_out(feats, rois, roi_valid, s, sem_feat)
        self.mask_out_all_stages(feats, rois, roi_valid, sem_feat)
        return rpn_outs


class HTCDetector(CascadeDetector):
    """HTC = CascadeDetector + interleaved per-stage mask training +
    info-flow mask inference (+ optional semantic branch)."""

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.atss_rpn_head import atss_rpn_loss
        from ..dense_heads.rpn_head import rpn_loss

        images = batch["images"]
        b = images.shape[0]
        rpn_rng, roi_rng = jax.random.split(rng)
        feats = self.net.apply(variables, images, method=HTCNet.features)
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

        sem_feat = None
        if self.net.semantic_head is not None:
            if "gt_semantic_seg" not in batch:
                raise KeyError(
                    "HTC with a semantic head needs 'gt_semantic_seg' in the "
                    "batch (COCO-stuff maps); use the without_semantic "
                    "config otherwise"
                )
            seg_logits, sem_feat = self.net.apply(
                variables, feats, method=HTCNet.semantic_out
            )
            gt_sem = batch["gt_semantic_seg"]
            if gt_sem.shape[1:3] != seg_logits.shape[1:3]:
                # align the label raster to the logit grid (nearest) — the
                # loader emits at 1/semantic_stride of the canvas, which
                # matches fusion_level=1 (stride 8) by default
                b_, h_, w_, _ = seg_logits.shape
                gt_sem = jax.image.resize(
                    gt_sem.astype(jnp.float32), (b_, h_, w_), "nearest"
                ).astype(jnp.int32)
            losses["loss_semantic_seg"] = 0.2 * semantic_seg_loss(
                seg_logits, gt_sem
            )

        prop_boxes, prop_scores, prop_valid = jax.tree.map(
            jax.lax.stop_gradient,
            self._proposals(
                cls, reg, iou, anchors, num_level_anchors,
                batch["img_shape"], self.train_proposal_cfg,
            ),
        )

        cc = self.cascade_cfg
        with_mask = "gt_mask_crops" in batch and len(self.net.mask_heads) > 0
        for stage in range(cc.num_stages):
            stage_rngs = jax.random.split(jax.random.fold_in(roi_rng, stage), b)
            thr = cc.stage_pos_iou[stage]
            stage_roi_cfg = dataclasses.replace(
                self.roi_cfg, pos_iou_thr=thr, neg_iou_thr=thr, min_pos_iou=thr
            )

            def _sample(rngs, pb, ps, pv):
                return jax.vmap(
                    lambda r_, pb_, ps_, pv_, gb, gm, gl: sample_rois(
                        stage_roi_cfg, r_, pb_, ps_, pv_, gb, gm, gl
                    )
                )(rngs, pb, ps, pv,
                  batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"])

            sample: RoISample = _sample(
                stage_rngs, prop_boxes, prop_scores, prop_valid
            )
            cls_s, reg_s = self.net.apply(
                variables, feats, sample.boxes, sample.valid,
                method=HTCNet.bbox_out, stage=stage, sem_feat=sem_feat,
            )
            flat = RoISample(*[x.reshape((-1,) + x.shape[2:]) for x in sample])
            losses.update(
                cascade_stage_loss(
                    cc, self.bbox_cfg, stage, cls_s, reg_s, flat,
                    seesaw_counts=self._stage_seesaw_counts(
                        variables, flat, stage),
                )
            )

            # interleaved: refine -> re-sample -> mask branch on the refined
            # boxes (htc_roi_head.py:296-313)
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
            next_boxes = refined
            next_scores = jnp.where(
                sample.is_pos, sample.prior, 1.0 - sample.prior
            )
            next_valid = sample.valid & ~is_gt_slot

            if with_mask:
                if cc.interleaved:
                    # HTC: the mask branch trains on boxes refined by this
                    # stage's bbox branch, re-assigned + re-sampled
                    mask_rngs = jax.random.split(
                        jax.random.fold_in(roi_rng, 100 + stage), b
                    )
                    msample: RoISample = _sample(
                        mask_rngs, next_boxes, next_scores, next_valid
                    )
                else:
                    # plain Cascade Mask R-CNN: same sampled rois as the
                    # bbox branch (reference ``cascade_roi_head.py``
                    # _mask_forward_train on sampling_results)
                    msample = sample
                pos_valid = msample.valid & msample.is_pos
                mask_logits = self.net.apply(
                    variables, feats, msample.boxes, pos_valid,
                    method=HTCNet.mask_out, stage=stage, sem_feat=sem_feat,
                )
                m = mask_logits.shape[1]
                targets = jax.vmap(
                    lambda crops, gb, rb, gi: resample_mask_targets(
                        crops, gb, rb, gi, out_size=m
                    )
                )(
                    batch["gt_mask_crops"], batch["gt_bboxes"],
                    msample.boxes, msample.gt_idx,
                )
                losses[f"s{stage}.loss_mask"] = cc.stage_loss_weights[
                    stage
                ] * mask_loss(
                    mask_logits,
                    targets.reshape(-1, m, m),
                    msample.matched_label.reshape(-1),
                    pos_valid.reshape(-1),
                )

            if stage < cc.num_stages - 1:
                prop_boxes = next_boxes
                prop_scores = next_scores
                prop_valid = next_valid
        return losses

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        images = batch["images"]
        b = images.shape[0]
        feats = self.net.apply(variables, images, method=HTCNet.features)
        sem_feat = None
        if self.net.semantic_head is not None:
            _, sem_feat = self.net.apply(
                variables, feats, method=HTCNet.semantic_out
            )
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
                method=HTCNet.bbox_out, stage=stage, sem_feat=sem_feat,
            )
            cls_s = cls_s.reshape(b, r, -1).astype(jnp.float32)
            reg_s = reg_s.reshape(b, r, -1).astype(jnp.float32)
            ms_logits.append(cls_s)
            if stage < cc.num_stages - 1:
                hc = stage_head_cfg(self.bbox_cfg, stage)
                rois = jax.vmap(
                    lambda ro, cs, bp, shp: refine_boxes(hc, ro, cs, bp, shp)
                )(rois, cls_s, reg_s, batch["img_shape"])
        avg = sum(ms_logits) / float(len(ms_logits))
        probs = jax.nn.softmax(avg, axis=-1)
        tc = self.rcnn_test_cfg
        hc_last = stage_head_cfg(self.bbox_cfg, cc.num_stages - 1)
        dets, labels, dvalid = jax.vmap(
            lambda ro, sc, bp, rv, shp, sf: bbox_head_decode(
                hc_last, ro, sc, bp, shp, sf, rescale,
                tc.score_thr, tc.nms_iou_thr, tc.max_per_img, roi_valid=rv,
                nms_type=tc.nms_type, pre_nms_top_k=tc.pre_nms_top_k,
            )
        )(rois, probs, reg_s, prop_valid, batch["img_shape"],
          batch["scale_factor"])

        if not self.net.mask_heads:
            return dets, labels, dvalid
        det_boxes = dets[..., :4]
        if rescale:
            det_boxes = det_boxes * batch["scale_factor"][:, None, :]
        stage_logits = self.net.apply(
            variables, feats, det_boxes, dvalid,
            method=HTCNet.mask_out_all_stages, sem_feat=sem_feat,
        )
        m = stage_logits[0].shape[1]
        c = stage_logits[0].shape[-1]
        avg_mask = sum(jax.nn.sigmoid(s) for s in stage_logits) / float(
            len(stage_logits)
        )
        avg_mask = avg_mask.reshape(b, -1, m, m, c)
        safe = jnp.clip(labels, 0, c - 1)
        sel = jnp.take_along_axis(
            avg_mask, safe[:, :, None, None, None], axis=-1
        )[..., 0]
        return dets, labels, dvalid, sel
