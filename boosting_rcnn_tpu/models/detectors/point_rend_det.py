"""PointRend detector (reference ``mmdet/models/detectors/point_rend.py``:
Mask R-CNN with a ``PointRendRoIHead``).

Training adds two mask terms to the standard two-stage loss: the coarse
mask BCE (handled by the generic mask path — ``CoarseMaskHead`` simply
returns a 7x7 logit map) and the point BCE at ``num_points``
importance-sampled points per positive RoI (``point_rend_roi_head.py:
30-64``).  Inference refines the coarse mask with
``subdivision_steps`` x2 upsample-and-requery rounds
(``_mask_point_forward_test:104``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import losses as L
from ..roi_heads.point_rend import (
    PointRendCfg,
    get_train_points,
    point_sample,
    rel_roi_point_to_rel_img_point,
    sample_gt_mask_at_points,
    subdivision_refine,
)
from ..roi_heads.prob_roi_head import RoISample, sample_rois
from .two_stage import TwoStageDetector, TwoStageNet


class PointRendDetector(TwoStageDetector):
    def __init__(self, *args, point_cfg: PointRendCfg = PointRendCfg(),
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.point_cfg = point_cfg

    # -- shared point machinery -------------------------------------------

    def _point_logits(self, variables, feats, rois, rel_pts, coarse_pts,
                      canvas_hw):
        """rois (B, R, 4) padded-image coords; rel_pts (B, R, P, 2)
        roi-relative; coarse_pts (B, R, P, C) -> (B, R, P, C) refined
        logits.  Fine-grained features come from the finest FPN level
        (reference point_rend config: GenericRoIExtractor over stride-4 P2
        only)."""
        fine_map = feats[0]
        b, r, p, c = coarse_pts.shape

        def per_img(fm, rb, pb):
            def per_roi(roi, pts):
                img_pts = rel_roi_point_to_rel_img_point(roi, pts, canvas_hw)
                return point_sample(fm, img_pts)

            return jax.vmap(per_roi)(rb, pb)

        fine = jax.vmap(per_img)(fine_map, rois, rel_pts)  # (B, R, P, Cf)
        flat = self.net.apply(
            variables,
            fine.reshape(b * r * p, -1),
            coarse_pts.reshape(b * r * p, c),
            method=TwoStageNet.point_out,
        )
        return flat.reshape(b, r, p, c)

    # -- training -----------------------------------------------------------

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        losses = super().loss(
            variables, rng, batch, anchors, num_level_anchors,
            anchor_valid=anchor_valid, axis_name=axis_name,
        )
        if "gt_mask_crops" not in batch or self.net.point_head is None:
            return losses

        # Recompute the base loss's sampling (identical rng folding) — the
        # duplicated forward subgraphs CSE away inside the jitted step.
        images = batch["images"]
        b = images.shape[0]
        canvas_hw = (float(images.shape[1]), float(images.shape[2]))
        rpn_rng, roi_rng = jax.random.split(rng)
        point_rng = jax.random.fold_in(rng, 7)
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
        coarse = self.net.apply(
            variables, feats, sample.boxes, pos_valid,
            method=TwoStageNet.mask_out,
        )  # (B*R, s, s, C)
        r = sample.boxes.shape[1]
        c = coarse.shape[-1]
        labels_flat = jnp.clip(sample.matched_label.reshape(-1), 0, c - 1)

        pts = get_train_points(
            self.point_cfg, point_rng, coarse, labels_flat
        )  # (B*R, P, 2)
        p = pts.shape[1]
        coarse_at_pts = jax.vmap(point_sample)(coarse, pts)  # (B*R, P, C)
        logits = self._point_logits(
            variables, feats, sample.boxes,
            pts.reshape(b, r, p, 2), coarse_at_pts.reshape(b, r, p, c),
            canvas_hw,
        ).reshape(b * r, p, c)
        sel = jnp.take_along_axis(
            logits, labels_flat[:, None, None].repeat(p, 1), axis=-1
        )[..., 0]  # (B*R, P)

        targets = jax.vmap(
            lambda crops, gb, rb, gi, pp: jax.vmap(
                lambda crop, gbox, roi, pt: sample_gt_mask_at_points(
                    crop, gbox, roi, pt
                )
            )(crops[gi], gb[gi], rb, pp)
        )(
            batch["gt_mask_crops"], batch["gt_bboxes"], sample.boxes,
            sample.gt_idx, pts.reshape(b, r, p, 2),
        ).reshape(b * r, p)

        elem = L.binary_cross_entropy_loss(sel, targets, reduction="none")
        posf = pos_valid.reshape(-1).astype(jnp.float32)
        num = jnp.maximum(jnp.sum(posf), 1.0)
        losses["loss_point"] = jnp.sum(elem * posf[:, None]) / (num * p)
        return losses

    # -- inference ----------------------------------------------------------

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        out = super().predict(
            variables, batch, anchors, num_level_anchors, rescale=rescale
        )
        if self.net.point_head is None or len(out) < 4:
            return out
        dets, labels, valid = out[0], out[1], out[2]
        images = batch["images"]
        b = images.shape[0]
        canvas_hw = (float(images.shape[1]), float(images.shape[2]))
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        det_boxes = dets[..., :4]
        if rescale:
            det_boxes = det_boxes * batch["scale_factor"][:, None, :]
        coarse = self.net.apply(
            variables, feats, det_boxes, valid, inference=True,
            method=TwoStageNet.mask_out,
        )  # (B*D, s, s, C)
        d = det_boxes.shape[1]
        c = coarse.shape[-1]
        labels_flat = jnp.clip(labels.reshape(-1), 0, c - 1)
        s = coarse.shape[1]
        label_map = jnp.take_along_axis(
            coarse,
            labels_flat[:, None, None, None].repeat(s, 1).repeat(s, 2),
            axis=-1,
        )[..., 0]  # (B*D, s, s)

        def point_fn(pts):  # (B*D, k, 2) -> (B*D, k)
            k = pts.shape[1]
            coarse_at = jax.vmap(point_sample)(coarse, pts)  # (B*D, k, C)
            lg = self._point_logits(
                variables, feats, det_boxes,
                pts.reshape(b, d, k, 2), coarse_at.reshape(b, d, k, c),
                canvas_hw,
            ).reshape(b * d, k, c)
            return jnp.take_along_axis(
                lg, labels_flat[:, None, None].repeat(k, 1), axis=-1
            )[..., 0]

        refined = subdivision_refine(self.point_cfg, label_map, point_fn)
        m = refined.shape[-1]
        masks = jax.nn.sigmoid(refined.astype(jnp.float32)).reshape(
            b, d, m, m
        )
        return dets, labels, valid, masks
