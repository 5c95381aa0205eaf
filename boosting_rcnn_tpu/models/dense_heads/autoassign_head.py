"""AutoAssign head (reference
``mmdet/models/dense_heads/autoassign_head.py`` +
``mmdet/models/detectors/autoassign.py``).

Fully differentiable label assignment over the FCOS architecture: a
learnable per-class gaussian center prior weights each in-box point, the
positive loss maximises the confidence-weighted sum of P_cls*P_obj*P_loc
per gt, the negative loss is a focal-style penalty down-weighted (at
in-box points) by the per-instance min-max-normalised 1/(1-IoU), and a
center-prior regulariser keeps the prior mass alive."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class AutoAssignCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_loss_weight: float = 0.25
    neg_loss_weight: float = 0.75
    center_loss_weight: float = 0.75
    reg_loss_weight: float = 5.0  # GIoU weight inside exp(-loss)


def distance2bbox(points, dist):
    return jnp.stack(
        [
            points[:, 0] - dist[:, 0], points[:, 1] - dist[:, 1],
            points[:, 0] + dist[:, 2], points[:, 1] + dist[:, 3],
        ],
        axis=-1,
    )


def autoassign_loss(
    cfg: AutoAssignCfg,
    cls_logits: jnp.ndarray,  # (B, P, C)
    bbox_dist: jnp.ndarray,  # (B, P, 4) image-unit l,t,r,b (relu'd)
    obj_logits: jnp.ndarray,  # (B, P)
    center_mean: jnp.ndarray,  # (C, 2) learnable prior mean
    center_sigma: jnp.ndarray,  # (C, 2)
    points: jnp.ndarray,  # (P, 2)
    strides_flat: jnp.ndarray,  # (P,)
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, p, c = cls_logits.shape
    g = gt_bboxes.shape[1]

    def one(cls_l, bd, ol, gb, gl, gm):
        cls_p = jax.nn.sigmoid(cls_l.astype(jnp.float32))
        obj_p = jax.nn.sigmoid(ol.astype(jnp.float32))[:, None]
        safe_box = jnp.asarray([0.0, 0.0, 32.0, 32.0])
        gb = jnp.where(gm[:, None], gb, safe_box[None, :])

        # inside-gt mask (P, G)
        inside = (
            (points[:, 0:1] >= gb[None, :, 0])
            & (points[:, 0:1] <= gb[None, :, 2])
            & (points[:, 1:2] >= gb[None, :, 1])
            & (points[:, 1:2] <= gb[None, :, 3])
        ).reshape(p, g) & gm[None, :]

        # center prior (P, G)
        gc = jnp.stack(
            [(gb[:, 0] + gb[:, 2]) / 2, (gb[:, 1] + gb[:, 3]) / 2], -1
        )
        mean = center_mean[gl]  # (G, 2)
        sigma = center_sigma[gl]
        d = (
            (points[:, None, :] - gc[None, :, :])
            / strides_flat[:, None, None]
            - mean[None]
        ) ** 2
        prior = jnp.exp(-d / (2 * sigma[None] ** 2 + EPS)).prod(-1)
        prior = prior * inside.astype(jnp.float32)

        # dense decoded pred vs each gt
        dec = distance2bbox(points, bd)  # (P, 4)
        giou_l = (
            1.0
            - box_ops.bbox_overlaps(dec, gb, mode="giou").reshape(p, g)
        ) * cfg.reg_loss_weight
        iou = jax.lax.stop_gradient(
            box_ops.bbox_overlaps(dec, gb).reshape(p, g)
        )
        iou_max = jnp.max(
            jnp.where(gm[None, :], iou, 0.0), axis=1, keepdims=True
        )
        ious = jnp.where(inside, jnp.broadcast_to(iou_max, (p, g)), 0.0)

        # positive loss per gt
        p_loc = jnp.exp(-giou_l)  # (P, G)
        p_cls = (cls_p * obj_p)[:, gl]  # (P, G)
        p_pos = p_cls * p_loc
        conf_w = jnp.exp(p_pos * 3.0) * prior
        wsum = jnp.clip(jnp.sum(conf_w, axis=0, keepdims=True), EPS, None)
        w = conf_w / wsum
        rew = jnp.clip(jnp.sum(p_pos * w, axis=0), EPS, 1 - EPS)
        pos_l = -jnp.log(rew) * gm.astype(jnp.float32)

        # negative weights at in-box points (last-writer per (point, label))
        tw = 1.0 / jnp.clip(1.0 - ious, EPS, None)  # (P, G)
        twm = jnp.where(inside, tw, jnp.nan)
        tmin = jnp.nanmin(twm, axis=0, keepdims=True)
        tmax = jnp.nanmax(twm, axis=0, keepdims=True)
        norm_w = (tw - tmin + EPS) / (tmax - tmin + EPS)
        neg_w_map = jnp.ones((p, c))
        # last gt (in index order) covering (point, its label) wins
        gidx = jnp.arange(g)
        last = jnp.where(inside, gidx[None, :], -1)  # (P, G)
        onehot = jax.nn.one_hot(gl, c, dtype=jnp.int32)  # (G, C)
        # for each class: the covering gt with max index
        last_per_class = jnp.max(
            last[:, :, None] * onehot[None, :, :]
            - (1 - onehot[None, :, :]),
            axis=1,
        )  # (P, C), -1 when none
        has = last_per_class >= 0
        safe_g = jnp.clip(last_per_class, 0, g - 1)
        w_sel = jnp.take_along_axis(1.0 - norm_w, safe_g, axis=1)  # (P, C)
        neg_w_map = jnp.where(has, w_sel, 1.0)

        logits = jnp.clip(cls_p * obj_p * neg_w_map, EPS, 1 - EPS)
        neg_l = jnp.sum(logits**2 * (-jnp.log(1.0 - logits)))

        prior_sum = jnp.sum(prior)
        n_gt = jnp.sum(gm.astype(jnp.float32))
        center_l = jnp.where(
            jnp.any(inside), n_gt / jnp.clip(prior_sum, EPS, None), 0.0
        )
        return jnp.sum(pos_l), neg_l, center_l, n_gt, prior_sum

    pos_l, neg_l, center_l, n_gt, prior_sum = jax.vmap(one)(
        cls_logits, bbox_dist, obj_logits, gt_bboxes, gt_labels, gt_mask
    )
    num_gt = jnp.sum(n_gt)
    prior_total = jnp.sum(prior_sum)
    if axis_name is not None:
        num_gt = jax.lax.pmean(num_gt, axis_name)
        prior_total = jax.lax.pmean(prior_total, axis_name)
    return {
        "loss_pos": cfg.pos_loss_weight * jnp.sum(pos_l)
        / jnp.maximum(num_gt, 1.0),
        "loss_neg": cfg.neg_loss_weight * jnp.sum(neg_l)
        / jnp.maximum(prior_total, 1.0),
        "loss_center": cfg.center_loss_weight * jnp.mean(center_l),
    }
