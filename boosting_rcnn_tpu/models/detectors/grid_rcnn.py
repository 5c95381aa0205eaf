"""Grid R-CNN (reference ``mmdet/models/detectors/grid_rcnn.py`` +
``roi_heads/grid_roi_head.py``).

Two-stage detector whose final box coordinates come from grid-point
heatmap voting instead of the bbox-head regression: training jitters the
positive proposals (``_random_jitter:28``) and supervises 9 boundary
heatmaps; inference refines the NMS-ed detections with the voting decode.
The whole grid branch is a fixed-shape batch program (vmap over RoIs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..roi_heads.grid_head import (
    GridCfg,
    grid_loss,
    grid_refine_boxes,
    grid_targets,
    jitter_boxes,
)
from ..roi_heads.prob_roi_head import RoISample, sample_rois
from .two_stage import TwoStageDetector, TwoStageNet


class GridRCNN(TwoStageDetector):
    def __init__(self, *args, grid_cfg: GridCfg = GridCfg(), **kwargs):
        super().__init__(*args, **kwargs)
        self.grid_cfg = grid_cfg

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        losses = super().loss(
            variables, rng, batch, anchors, num_level_anchors,
            anchor_valid=anchor_valid, axis_name=axis_name,
        )
        if self.net.grid_head is None:
            return losses
        images = batch["images"]
        b = images.shape[0]
        rpn_rng, roi_rng = jax.random.split(rng)
        jit_rng = jax.random.fold_in(rng, 11)
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        cls, reg, iou = self._rpn_flat(variables, feats)
        prop_boxes, prop_scores, prop_valid = jax.tree.map(
            jax.lax.stop_gradient,
            self._proposals(
                cls, reg, iou, anchors, num_level_anchors,
                batch["img_shape"], self.train_proposal_cfg,
            ),
        )
        rngs = jax.random.split(roi_rng, b)
        sample: RoISample = jax.vmap(
            lambda r_, pb, ps, pv, gb, gm, gl: sample_rois(
                self.roi_cfg, r_, pb, ps, pv, gb, gm, gl
            )
        )(
            rngs, prop_boxes, prop_scores, prop_valid,
            batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"],
        )
        pos_valid = sample.valid & sample.is_pos
        jboxes = jitter_boxes(
            sample.boxes, jit_rng, self.grid_cfg.jitter_amplitude,
            batch["img_shape"],
        )
        gt_of_roi = jnp.take_along_axis(
            batch["gt_bboxes"], sample.gt_idx[..., None], axis=1
        )
        r = jboxes.shape[1]
        fused, unfused = self.net.apply(
            variables, feats, jboxes, pos_valid,
            method=TwoStageNet.grid_out, train=True,
        )
        tgt, w = jax.vmap(
            lambda pb, gb, pv: grid_targets(self.grid_cfg, pb, gb, pv)
        )(jboxes, gt_of_roi, pos_valid)
        hw = fused.shape[2]
        gp = fused.shape[-1]
        losses["loss_grid"] = grid_loss(
            self.grid_cfg,
            fused.reshape(b * r, hw, hw, gp),
            unfused.reshape(b * r, hw, hw, gp),
            tgt.reshape(b * r, hw, hw, gp),
            w.reshape(b * r),
        )
        return losses

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        out = super().predict(
            variables, batch, anchors, num_level_anchors, rescale=rescale
        )
        if self.net.grid_head is None:
            return out
        dets, labels, valid = out[0], out[1], out[2]
        images = batch["images"]
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        det_boxes = dets[..., :4]
        if rescale:
            det_boxes = det_boxes * batch["scale_factor"][:, None, :]
        fused, _ = self.net.apply(
            variables, feats, det_boxes, valid,
            method=TwoStageNet.grid_out,
        )
        refined = jax.vmap(
            lambda db, hm, sh: grid_refine_boxes(self.grid_cfg, db, hm, sh)
        )(det_boxes, fused, batch["img_shape"])
        if rescale:
            refined = refined / batch["scale_factor"][:, None, :]
        refined = jnp.where(valid[..., None], refined, 0.0)
        dets = jnp.concatenate([refined, dets[..., 4:5]], axis=-1)
        return (dets, labels, valid) + tuple(out[3:])
