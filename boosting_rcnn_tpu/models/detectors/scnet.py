"""SCNet (reference ``mmdet/models/detectors/scnet.py`` +
``roi_heads/scnet_roi_head.py``): sample-consistent cascade network.

Cascade R-CNN plus four SCNet pieces, all on fixed shapes:

  * **global context branch** (``mask_heads/global_context_head.py``): convs
    on the coarsest FPN level -> global pool -> multilabel class logits; the
    pooled vector is added to every RoI feature (``_fuse_glbctx:73``);
  * **feature relay** (``mask_heads/feature_relay_head.py``): the last
    bbox stage's shared-FC feature is projected back to a 14x14 spatial map
    and added into the mask features;
  * **single mask head** run once after the cascade (not per stage,
    ``scnet_roi_head.py:179-205``);
  * optional **semantic branch** identical to HTC's.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ...ops.roi_align import multilevel_roi_align_fast
from ..roi_heads.bbox_head import bbox_head_decode
from ..roi_heads.cascade_roi_head import (
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
from .cascade import CascadeDetector
from .htc import HTCNet


class SCNetBBoxHead(nn.Module):
    """Shared-2FC bbox head that also exposes the shared feature for the
    relay (reference ``bbox_heads/scnet_bbox_head.py``)."""

    num_classes: int
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"shared_fc_{i}")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="fc_cls")(x)
        k = 1 if self.reg_class_agnostic else self.num_classes
        reg = nn.Dense(4 * k, dtype=self.dtype, name="fc_reg")(x)
        return cls, reg, x


class GlobalContextHead(nn.Module):
    """reference ``mask_heads/global_context_head.py``: convs on the top
    pyramid level -> (multilabel logits, pooled context vector)."""

    num_classes: int
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                name=f"conv{i}")(x))
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="fc")(pooled)
        return logits, pooled


class FeatureRelayHead(nn.Module):
    """reference ``mask_heads/feature_relay_head.py``: FC -> 7x7xC map ->
    bilinear x2 -> 14x14xC."""

    out_channels: int = 256
    roi_feat_size: int = 7
    scale_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, in_C)
        n = x.shape[0]
        s, c = self.roi_feat_size, self.out_channels
        y = nn.Dense(s * s * c, dtype=self.dtype, name="fc")(x)
        y = y.reshape(n, c, s, s).transpose(0, 2, 3, 1)  # torch CHW order
        out = s * self.scale_factor
        return jax.image.resize(y, (n, out, out, c), "bilinear")


class SCNetNet(HTCNet):
    """HTCNet skeleton with one mask head, glbctx and relay heads."""

    glbctx_head: Optional[nn.Module] = None
    feat_relay_head: Optional[nn.Module] = None

    def glbctx_out(self, feats):
        return self.glbctx_head(feats)

    def bbox_out(self, feats, rois, roi_valid, stage: int, sem_feat=None,
                 glbctx_vec=None):
        b, r, _ = rois.shape
        pooled = self._pool(feats, rois, roi_valid, self.roi_out_size)
        if sem_feat is not None:
            pooled = pooled + self._pool_semantic(
                sem_feat, rois, roi_valid, self.roi_out_size)
        if glbctx_vec is not None:
            pooled = pooled + jnp.repeat(
                glbctx_vec, r, axis=0)[:, None, None, :].astype(pooled.dtype)
        return self.bbox_heads[stage](pooled)

    def relay_out(self, feat):
        return self.feat_relay_head(feat)

    def scnet_mask_out(self, feats, rois, roi_valid, sem_feat=None,
                       glbctx_vec=None, relayed=None):
        b, r, _ = rois.shape
        pooled = self._pool(feats, rois, roi_valid, self.mask_roi_out_size)
        if sem_feat is not None:
            pooled = pooled + self._pool_semantic(
                sem_feat, rois, roi_valid, self.mask_roi_out_size)
        if glbctx_vec is not None:
            pooled = pooled + jnp.repeat(
                glbctx_vec, r, axis=0)[:, None, None, :].astype(pooled.dtype)
        if relayed is not None:
            pooled = pooled + relayed.astype(pooled.dtype)
        return self.mask_heads[0](pooled)

    def __call__(self, images, rois, roi_valid):
        feats = self.features(images)
        rpn_outs = self.rpn_out(feats)
        sem_feat = None
        if self.semantic_head is not None:
            _, sem_feat = self.semantic_out(feats)
        gvec = None
        if self.glbctx_head is not None:
            _, gvec = self.glbctx_out(feats)
        relayed = None
        for s in range(len(self.bbox_heads)):
            _, _, feat = self.bbox_out(feats, rois, roi_valid, s, sem_feat,
                                       gvec)
        if self.feat_relay_head is not None:
            relayed = self.relay_out(feat)
        if self.mask_heads:
            self.scnet_mask_out(feats, rois, roi_valid, sem_feat, gvec,
                                relayed)
        return rpn_outs


class SCNetDetector(CascadeDetector):
    """Cascade training loop with glbctx/relay/single-mask losses
    (``scnet_roi_head.py:206-313``)."""

    glbctx_loss_weight: float = 3.0
    semantic_loss_weight: float = 0.2

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.atss_rpn_head import atss_rpn_loss
        from ..dense_heads.rpn_head import rpn_loss

        images = batch["images"]
        b = images.shape[0]
        rpn_rng, roi_rng = jax.random.split(rng)
        feats = self.net.apply(variables, images, method=SCNetNet.features)
        cls, reg, iou = self._rpn_flat(variables, feats)
        valid = (anchor_valid if anchor_valid is not None
                 else jnp.ones((b, anchors.shape[0]), bool))
        if self.rpn_type == "atss_rpn":
            losses = atss_rpn_loss(
                self.rpn_cfg, cls, reg, iou, anchors, valid,
                batch["gt_bboxes"], batch["gt_mask"], num_level_anchors,
                axis_name=axis_name)
        else:
            losses = rpn_loss(
                self.rpn_cfg, cls, reg, anchors, valid, batch["gt_bboxes"],
                batch["gt_mask"], rng=rpn_rng, axis_name=axis_name)

        sem_feat = None
        if self.net.semantic_head is not None and "gt_semantic_seg" in batch:
            seg_logits, sem_feat = self.net.apply(
                variables, feats, method=SCNetNet.semantic_out)
            losses["loss_semantic_seg"] = (
                self.semantic_loss_weight
                * semantic_seg_loss(seg_logits, batch["gt_semantic_seg"]))

        gvec = None
        if self.net.glbctx_head is not None:
            glogits, gvec = self.net.apply(
                variables, feats, method=SCNetNet.glbctx_out)
            c = glogits.shape[-1]
            onehot = jax.nn.one_hot(
                jnp.clip(batch["gt_labels"], 0, c - 1), c)
            present = jnp.max(
                onehot * batch["gt_mask"][..., None].astype(onehot.dtype),
                axis=1)
            losses["loss_glbctx"] = self.glbctx_loss_weight * jnp.mean(
                L.binary_cross_entropy_loss(
                    glogits.astype(jnp.float32), present, reduction="none"))

        prop_boxes, prop_scores, prop_valid = jax.tree.map(
            jax.lax.stop_gradient,
            self._proposals(cls, reg, iou, anchors, num_level_anchors,
                            batch["img_shape"], self.train_proposal_cfg))

        cc = self.cascade_cfg
        sample = None
        feat_s = None
        for stage in range(cc.num_stages):
            stage_rngs = jax.random.split(
                jax.random.fold_in(roi_rng, stage), b)
            thr = cc.stage_pos_iou[stage]
            stage_roi_cfg = dataclasses.replace(
                self.roi_cfg, pos_iou_thr=thr, neg_iou_thr=thr,
                min_pos_iou=thr)
            sample = jax.vmap(
                lambda r_, pb, ps, pv, gb, gm, gl: sample_rois(
                    stage_roi_cfg, r_, pb, ps, pv, gb, gm, gl)
            )(stage_rngs, prop_boxes, prop_scores, prop_valid,
              batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"])
            cls_s, reg_s, feat_s = self.net.apply(
                variables, feats, sample.boxes, sample.valid,
                method=SCNetNet.bbox_out, stage=stage, sem_feat=sem_feat,
                glbctx_vec=gvec)
            flat = RoISample(
                *[x.reshape((-1,) + x.shape[2:]) for x in sample])
            losses.update(cascade_stage_loss(
                cc, self.bbox_cfg, stage, cls_s, reg_s, flat))
            if stage < cc.num_stages - 1:
                hc = stage_head_cfg(self.bbox_cfg, stage)
                r = sample.boxes.shape[1]
                refined = jax.vmap(
                    lambda ro, cs, bp, shp: refine_boxes(hc, ro, cs, bp, shp)
                )(sample.boxes,
                  jax.lax.stop_gradient(cls_s).reshape(b, r, -1),
                  jax.lax.stop_gradient(reg_s).reshape(b, r, -1),
                  batch["img_shape"])
                is_gt_slot = sample.is_pos & (sample.prior == 0.0)
                prop_boxes = refined
                prop_scores = jnp.where(
                    sample.is_pos, sample.prior, 1.0 - sample.prior)
                prop_valid = sample.valid & ~is_gt_slot

        if self.net.mask_heads and "gt_mask_crops" in batch:
            pos_valid = sample.valid & sample.is_pos
            relayed = None
            if self.net.feat_relay_head is not None:
                relayed = self.net.apply(
                    variables, feat_s, method=SCNetNet.relay_out)
            mask_logits = self.net.apply(
                variables, feats, sample.boxes, pos_valid,
                method=SCNetNet.scnet_mask_out, sem_feat=sem_feat,
                glbctx_vec=gvec, relayed=relayed)
            m = mask_logits.shape[1]
            targets = jax.vmap(
                lambda crops, gb, rb, gi: resample_mask_targets(
                    crops, gb, rb, gi, out_size=m)
            )(batch["gt_mask_crops"], batch["gt_bboxes"], sample.boxes,
              sample.gt_idx)
            losses["loss_mask"] = mask_loss(
                mask_logits, targets.reshape(-1, m, m),
                sample.matched_label.reshape(-1), pos_valid.reshape(-1))
        return losses

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        images = batch["images"]
        b = images.shape[0]
        feats = self.net.apply(variables, images, method=SCNetNet.features)
        sem_feat = None
        if self.net.semantic_head is not None:
            _, sem_feat = self.net.apply(
                variables, feats, method=SCNetNet.semantic_out)
        gvec = None
        if self.net.glbctx_head is not None:
            _, gvec = self.net.apply(
                variables, feats, method=SCNetNet.glbctx_out)
        cls, reg, iou = self._rpn_flat(variables, feats)
        prop_boxes, prop_scores, prop_valid = self._proposals(
            cls, reg, iou, anchors, num_level_anchors,
            batch["img_shape"], self.test_proposal_cfg)
        cc = self.cascade_cfg
        r = prop_boxes.shape[1]
        rois = prop_boxes
        ms_logits = []
        reg_s = None
        for stage in range(cc.num_stages):
            cls_s, reg_s, _ = self.net.apply(
                variables, feats, rois, prop_valid,
                method=SCNetNet.bbox_out, stage=stage, sem_feat=sem_feat,
                glbctx_vec=gvec)
            cls_s = cls_s.reshape(b, r, -1).astype(jnp.float32)
            reg_s = reg_s.reshape(b, r, -1).astype(jnp.float32)
            ms_logits.append(cls_s)
            if stage < cc.num_stages - 1:
                hc = stage_head_cfg(self.bbox_cfg, stage)
                rois = jax.vmap(
                    lambda ro, cs, bp, shp: refine_boxes(hc, ro, cs, bp, shp)
                )(rois, cls_s, reg_s, batch["img_shape"])
        probs = jax.nn.softmax(
            sum(ms_logits) / float(len(ms_logits)), axis=-1)
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
        relayed = None
        if self.net.feat_relay_head is not None:
            _, _, feat_d = self.net.apply(
                variables, feats, det_boxes, dvalid,
                method=SCNetNet.bbox_out, stage=cc.num_stages - 1,
                sem_feat=sem_feat, glbctx_vec=gvec)
            relayed = self.net.apply(
                variables, feat_d, method=SCNetNet.relay_out)
        mask_logits = self.net.apply(
            variables, feats, det_boxes, dvalid,
            method=SCNetNet.scnet_mask_out, sem_feat=sem_feat,
            glbctx_vec=gvec, relayed=relayed)
        m = mask_logits.shape[1]
        c = mask_logits.shape[-1]
        probs_m = jax.nn.sigmoid(
            mask_logits.astype(jnp.float32)).reshape(b, -1, m, m, c)
        safe = jnp.clip(labels, 0, c - 1)
        sel = jnp.take_along_axis(
            probs_m, safe[:, :, None, None, None], axis=-1)[..., 0]
        return dets, labels, dvalid, sel
