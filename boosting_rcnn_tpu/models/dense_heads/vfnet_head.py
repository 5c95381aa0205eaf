"""VarifocalNet head (reference ``mmdet/models/dense_heads/vfnet_head.py:20``).

FCOS-style point regression with a star-shaped deformable refinement: the
initial distance prediction places the 9 deformable-conv taps on the
predicted box (corners/edge midpoints/center), and both the IoU-aware
classification branch and the multiplicative bbox refinement read features
through that star dconv.  Losses: IoU-weighted GIoU on both bbox stages and
varifocal loss whose positive targets are the refined-box IoUs.  Targets use
ATSS assignment over per-point square anchors (8 x stride), converted to
point-distance form.

TPU design: the explicit-offset deformable conv reuses ``ops.deform_conv2d``
(gathers + one MXU matmul); per-image target loops become vmap.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import atss_assign
from ...ops.deform_conv import deform_conv2d
from ...ops.nms import multiclass_nms_padded
from ..layers import ConvModule, Scale
from .fcos_head import fcos_points

INF = 1e8


class _ExplicitDConv(nn.Module):
    """3x3 deformable conv with caller-supplied offsets (reference
    ``DeformConv2d`` used by ``vfnet_reg_refine_dconv``/``vfnet_cls_dconv``)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.out_channels), jnp.float32,
        )
        return deform_conv2d(
            x, offset, kernel.astype(self.dtype), stride=1, padding=1
        )


class VFNetConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 3
    num_levels: int = 5
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    reg_denoms: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    gradient_mul: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """Returns per-level (cls (B,H,W,C), bbox (B,H,W,4) image units,
        bbox_refine (B,H,W,4) image units)."""
        cls_convs = [
            ConvModule(self.feat_channels, 3,
                       norm_cfg={"type": "GN", "num_groups": 32},
                       act="relu", dtype=self.dtype, name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            ConvModule(self.feat_channels, 3,
                       norm_cfg={"type": "GN", "num_groups": 32},
                       act="relu", dtype=self.dtype, name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_conv_init = ConvModule(
            self.feat_channels, 3,
            norm_cfg={"type": "GN", "num_groups": 32}, act="relu",
            dtype=self.dtype, name="vfnet_reg_conv",
        )
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="vfnet_reg")
        dconv_reg = _ExplicitDConv(self.feat_channels, dtype=self.dtype,
                                   name="vfnet_reg_refine_dconv")
        conv_reg_refine = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                                  dtype=self.dtype, name="vfnet_reg_refine")
        dconv_cls = _ExplicitDConv(self.feat_channels, dtype=self.dtype,
                                   name="vfnet_cls_dconv")
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="vfnet_cls",
        )
        scales = [Scale(name=f"scale_{i}") for i in range(self.num_levels)]
        scales_r = [
            Scale(name=f"scale_refine_{i}") for i in range(self.num_levels)
        ]

        # 3x3 base tap grid, row-major, (dy, dx) interleaved
        base = []
        for iy in (-1, 0, 1):
            for ix in (-1, 0, 1):
                base.extend([float(iy), float(ix)])
        base = jnp.asarray(base, jnp.float32)  # (18,)

        cls_out, reg_out, reg_refine_out = [], [], []
        for lvl, x in enumerate(feats):
            cf = x
            rf = x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            ri = reg_conv_init(rf)
            bbox_pred = (
                jnp.exp(scales[lvl](conv_reg(ri)).astype(jnp.float32))
                * self.reg_denoms[lvl]
            )  # (B, H, W, 4) l, t, r, b in image units

            # star offsets (reference star_dcn_offset): gradient-damped
            # distances projected to feature cells, minus the base grid
            gm = self.gradient_mul
            bp = (1 - gm) * jax.lax.stop_gradient(bbox_pred) + gm * bbox_pred
            bp = bp / self.strides[lvl]
            l_, t_, r_, b_ = bp[..., 0], bp[..., 1], bp[..., 2], bp[..., 3]
            z = jnp.zeros_like(l_)
            # 9 taps x (dy, dx): rows (top, mid, bottom) x cols (l, c, r)
            tap = jnp.stack(
                [
                    -t_, -l_, -t_, z, -t_, r_,
                    z, -l_, z, z, z, r_,
                    b_, -l_, b_, z, b_, r_,
                ],
                axis=-1,
            )  # (B, H, W, 18)
            offset = tap - base
            rf2 = nn.relu(dconv_reg(rf, offset.astype(rf.dtype)))
            refine_mul = jnp.exp(
                scales_r[lvl](conv_reg_refine(rf2)).astype(jnp.float32)
            )
            bbox_refine = refine_mul * jax.lax.stop_gradient(bbox_pred)
            cf2 = nn.relu(dconv_cls(cf, offset.astype(cf.dtype)))
            cls_out.append(conv_cls(cf2).astype(jnp.float32))
            reg_out.append(bbox_pred)
            reg_refine_out.append(bbox_refine)
        return cls_out, reg_out, reg_refine_out


@dataclasses.dataclass(frozen=True)
class VFNetCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    anchor_scale: float = 8.0  # ATSS square anchors: side = scale * stride
    atss_topk: int = 9
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.5
    loss_bbox_refine_weight: float = 2.0
    vfl_alpha: float = 0.75
    vfl_gamma: float = 2.0


def distance2bbox(points, dist):
    """(P, 2) centers + (P, 4) l,t,r,b -> xyxy."""
    return jnp.stack(
        [
            points[:, 0] - dist[:, 0],
            points[:, 1] - dist[:, 1],
            points[:, 0] + dist[:, 2],
            points[:, 1] + dist[:, 3],
        ],
        axis=-1,
    )


def vfnet_anchors(points: jnp.ndarray, strides: jnp.ndarray,
                  scale: float) -> jnp.ndarray:
    half = 0.5 * scale * strides
    return jnp.stack(
        [
            points[:, 0] - half, points[:, 1] - half,
            points[:, 0] + half, points[:, 1] + half,
        ],
        axis=-1,
    )


def vfnet_loss(
    cfg: VFNetCfg,
    cls_logits: jnp.ndarray,  # (B, P, C)
    bbox_pred: jnp.ndarray,  # (B, P, 4) distances, image units
    bbox_refine: jnp.ndarray,  # (B, P, 4)
    points: jnp.ndarray,  # (P, 2)
    strides_flat: jnp.ndarray,  # (P,)
    num_level_points: Tuple[int, ...],
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, p, c = cls_logits.shape
    anchors = vfnet_anchors(points, strides_flat, cfg.anchor_scale)
    valid = jnp.ones((p,), bool)

    def targets(gb, gl, gm):
        assign = atss_assign(
            anchors, valid, tuple(num_level_points), gb, gm, gt_labels=gl,
            topk=cfg.atss_topk,
        )
        pos = assign.gt_inds > 0
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        matched = box_ops.take_small_table(gb, safe)
        labels = jnp.where(pos, assign.labels, cfg.num_classes)
        return pos, matched, labels

    pos, matched_gt, labels = jax.vmap(targets)(gt_bboxes, gt_labels, gt_mask)
    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.sum(posf)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    pts = jnp.tile(points, (b, 1))
    dec_init = distance2bbox(pts, bbox_pred.reshape(-1, 4))
    dec_refine = distance2bbox(pts, bbox_refine.reshape(-1, 4))
    gt_flat = matched_gt.reshape(-1, 4)
    safe_gt = jnp.where(posf[:, None] > 0, gt_flat, dec_init)
    safe_gt = jax.lax.stop_gradient(safe_gt)

    iou_ini = jnp.clip(
        box_ops.bbox_overlaps_aligned(
            jax.lax.stop_gradient(dec_init), safe_gt
        ), 1e-6, None,
    ) * posf
    iou_rf = jnp.clip(
        box_ops.bbox_overlaps_aligned(
            jax.lax.stop_gradient(dec_refine),
            jnp.where(posf[:, None] > 0, gt_flat, dec_refine),
        ), 1e-6, None,
    ) * posf
    avg_ini = jnp.maximum(jnp.sum(iou_ini), 1.0)
    avg_rf = jnp.maximum(jnp.sum(iou_rf), 1.0)
    if axis_name is not None:
        avg_ini = jax.lax.pmean(avg_ini, axis_name)
        avg_rf = jax.lax.pmean(avg_rf, axis_name)

    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        dec_init, safe_gt, weight=iou_ini, avg_factor=avg_ini
    )
    loss_bbox_rf = cfg.loss_bbox_refine_weight * L.giou_loss(
        dec_refine,
        jnp.where(posf[:, None] > 0, jax.lax.stop_gradient(gt_flat),
                  dec_refine),
        weight=iou_rf, avg_factor=avg_rf,
    )

    # varifocal targets: refined IoU at the gt class, 0 elsewhere
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    vfl_targets = onehot * iou_rf[:, None]
    loss_cls = cfg.loss_cls_weight * L.varifocal_loss(
        cls_logits.reshape(-1, c), vfl_targets,
        alpha=cfg.vfl_alpha, gamma=cfg.vfl_gamma, avg_factor=num_pos,
    )
    return {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "loss_bbox_rf": loss_bbox_rf,
    }


def vfnet_get_bboxes(
    cfg: VFNetCfg,
    cls_logits: jnp.ndarray,  # (P, C) one image
    bbox_refine: jnp.ndarray,  # (P, 4)
    points: jnp.ndarray,
    num_level_points: Tuple[int, ...],
    img_shape, scale_factor, rescale: bool,
    nms_pre: int = 1000, score_thr: float = 0.05,
    nms_iou_thr: float = 0.6, max_per_img: int = 100,
):
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    sel_s, sel_b = [], []
    start = 0
    for np_ in num_level_points:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, np_)
        d = jax.lax.dynamic_slice_in_dim(bbox_refine, start, np_)
        pt = jax.lax.dynamic_slice_in_dim(points, start, np_)
        k = min(nms_pre, np_)
        _, ti = jax.lax.top_k(jnp.max(s, axis=-1), k)
        boxes = box_ops.clip_boxes(distance2bbox(pt[ti], d[ti]), img_shape)
        sel_s.append(s[ti])
        sel_b.append(boxes)
        start += np_
    scores = jnp.concatenate(sel_s)
    boxes = jnp.concatenate(sel_b)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
