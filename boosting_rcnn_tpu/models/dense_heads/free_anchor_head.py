"""FreeAnchor (reference
``mmdet/models/dense_heads/free_anchor_retina_head.py`` +
``mmdet/models/detectors/free_anchor_retinanet.py`` lineage).

RetinaNet architecture trained with the FreeAnchor likelihood: each gt
carries a bag of its ``pre_anchor_topk`` highest-IoU anchors and maximises
the mean-max of P_cls * P_loc over the bag; anchors not in any bag pay a
focal-style background loss down-weighted by how well they already predict
some object (the saturated-IoU box probability)."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import box_ops, losses as L

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class FreeAnchorCfg:
    num_classes: int = 80
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5
    smooth_l1_beta: float = 0.11
    loss_bbox_weight: float = 0.75


def free_anchor_loss(
    cfg: FreeAnchorCfg,
    cls_logits: jnp.ndarray,  # (B, A, C)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, a, c = cls_logits.shape
    g = gt_bboxes.shape[1]
    k = min(cfg.pre_anchor_topk, a)
    cls_prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

    def one(cls_p, bp, gb, gl, gm):
        # padded gt rows are all-zero: give them unit boxes so bbox2delta's
        # log(w) stays finite (their losses are masked out anyway, but inf
        # intermediates would poison the backward with inf * 0 = NaN)
        safe_box = jnp.asarray([0.0, 0.0, 32.0, 32.0])
        gb = jnp.where(gm[:, None], gb, safe_box[None, :])
        decoded = box_ops.delta2bbox(
            anchors, bp, cfg.target_means, cfg.target_stds
        )
        # saturated box probability (no-grad in the reference)
        iou_pd = jax.lax.stop_gradient(
            box_ops.bbox_overlaps(gb, decoded)
        )  # (G, A)
        iou_pd = jnp.where(gm[:, None], iou_pd, 0.0)
        t1 = cfg.bbox_thr
        t2 = jnp.clip(jnp.max(iou_pd, axis=1, keepdims=True), t1 + 1e-12,
                      None)
        obj_box_prob = jnp.clip((iou_pd - t1) / (t2 - t1), 0.0, 1.0)
        onehot = jax.nn.one_hot(gl, c) * gm[:, None].astype(jnp.float32)
        image_box_prob = jnp.max(
            obj_box_prob[:, :, None] * onehot[:, None, :], axis=0
        )  # (A, C)

        # positive bags: top-k anchors by anchor-gt IoU
        iou_ag = jnp.where(
            gm[:, None], box_ops.bbox_overlaps(gb, anchors), -1.0
        )
        _, matched = jax.lax.top_k(iou_ag, k)  # (G, k)
        mat_cls = jnp.take_along_axis(
            cls_p[matched],  # (G, k, C)
            gl[:, None, None].repeat(k, 1), axis=2,
        )[..., 0]
        mat_anchors = anchors[matched]  # (G, k, 4)
        targets = box_ops.bbox2delta(
            mat_anchors.reshape(-1, 4),
            jnp.repeat(gb, k, axis=0),
            cfg.target_means, cfg.target_stds,
        ).reshape(g, k, 4)
        lb = L.smooth_l1_loss(
            bp[matched], targets, beta=cfg.smooth_l1_beta, reduction="none"
        ).sum(-1) * cfg.loss_bbox_weight
        mat_box = jnp.exp(-lb)
        mp = mat_cls * mat_box
        w = 1.0 / jnp.clip(1.0 - mp, EPS, None)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        bag_prob = jnp.clip(jnp.sum(w * mp, axis=1), EPS, 1 - EPS)
        pos_l = -cfg.alpha * jnp.log(bag_prob) * gm.astype(jnp.float32)

        prob = jnp.clip(cls_p * (1.0 - image_box_prob), EPS, 1 - EPS)
        neg_l = (
            (1 - cfg.alpha)
            * prob**cfg.gamma
            * (-jnp.log(1.0 - prob))
        )
        return jnp.sum(pos_l), jnp.sum(neg_l), jnp.sum(gm.astype(jnp.float32))

    pos_l, neg_l, npos = jax.vmap(one)(
        cls_prob, bbox_preds, gt_bboxes, gt_labels, gt_mask
    )
    num_pos = jnp.sum(npos)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)
    return {
        "positive_bag_loss": jnp.sum(pos_l) / num_pos,
        "negative_bag_loss": jnp.sum(neg_l) / (num_pos * k),
    }
