"""RepPoints head (reference ``mmdet/models/dense_heads/reppoints_head.py:16``
+ ``mmdet/models/detectors/reppoints_detector.py``).

Each location regresses a set of ``num_points`` representative points in
two stages: an initial 3x3-conv offset field, then a refinement whose
classification and point branches read features through a deformable conv
whose offsets ARE the (gradient-damped) initial points.  Points convert to
boxes via the moment transform (mean +- std * exp(learnable)).  Init stage
targets come from the PointAssigner (one nearest point per gt on its scale
level), refine stage from MaxIoU over the init-decoded boxes; losses are
focal cls + SmoothL1 on normalised box coordinates (0.5 / 1.0 weights)."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import max_iou_assign, point_assign
from ...ops.deform_conv import deform_conv2d
from ...ops.nms import multiclass_nms_padded
from ..layers import ConvModule


class _ExplicitDConv(nn.Module):
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


class RepPointsConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    num_levels: int = 5
    # reference ``use_grid_points``: the init/refine branches regress a
    # 4-param box and the point set is a kxk grid over it
    # (``gen_grid_from_reg``, the bbox_r50_grid configs)
    use_grid_points: bool = False
    point_base_scale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """Per level: (cls (B,H,W,C), pts_init (B,H,W,2n) y-first offsets in
        stride units, pts_refine (B,H,W,2n))."""
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
        n2 = self.num_points * 2
        init_out_ch = 4 if self.use_grid_points else n2
        pts_init_conv = nn.Conv(
            self.point_feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="reppoints_pts_init_conv",
        )
        pts_init_out = nn.Conv(init_out_ch, (1, 1), dtype=self.dtype,
                               name="reppoints_pts_init_out")
        cls_dconv = _ExplicitDConv(self.point_feat_channels,
                                   dtype=self.dtype, name="reppoints_cls_conv")
        cls_out_conv = nn.Conv(
            self.num_classes, (1, 1),
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="reppoints_cls_out",
        )
        refine_dconv = _ExplicitDConv(
            self.point_feat_channels, dtype=self.dtype,
            name="reppoints_pts_refine_conv",
        )
        refine_out = nn.Conv(init_out_ch, (1, 1), dtype=self.dtype,
                             name="reppoints_pts_refine_out")

        # 3x3 base grid, y-first interleaved, row-major
        base = []
        for iy in (-1, 0, 1):
            for ix in (-1, 0, 1):
                base.extend([float(iy), float(ix)])
        base = jnp.asarray(base, jnp.float32)  # (18,)

        moment = self.param(
            "moment_transfer", nn.initializers.zeros, (2,), jnp.float32
        )

        k = int(self.num_points ** 0.5)

        def grid_from_reg(reg, prev):
            """reference ``gen_grid_from_reg``: (B,H,W,4) reg + (...,4)
            base box -> (y-first interleaved kxk grid points, box)."""
            bxy = (prev[..., :2] + prev[..., 2:]) / 2.0
            bwh = jnp.maximum(prev[..., 2:] - prev[..., :2], 1e-6)
            tl = bxy + bwh * reg[..., :2] - 0.5 * bwh * jnp.exp(
                reg[..., 2:])
            wh = bwh * jnp.exp(reg[..., 2:])
            iv = jnp.linspace(0.0, 1.0, k)
            gx = tl[..., 0:1] + wh[..., 0:1] * iv  # (B,H,W,k) x fast
            gy = tl[..., 1:2] + wh[..., 1:2] * iv
            yy = jnp.repeat(gy, k, axis=-1)  # y slow
            xx = jnp.tile(gx, (1,) * (gx.ndim - 1) + (k,))
            pts = jnp.stack([yy, xx], axis=-1)
            pts = pts.reshape(pts.shape[:-2] + (2 * k * k,))
            box = jnp.concatenate([tl, tl + wh], axis=-1)
            return pts, box

        half = self.point_base_scale / 2.0
        base_box = jnp.asarray([-half, -half, half, half], jnp.float32)
        cls_list, init_list, refine_list = [], [], []
        for x in feats:
            cf = x
            pf = x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                pf = conv(pf)
            raw_init = pts_init_out(
                nn.relu(pts_init_conv(pf))
            ).astype(jnp.float32)
            if self.use_grid_points:
                pts_init, box_init = grid_from_reg(raw_init, base_box)
            else:
                pts_init = raw_init
            gm = self.gradient_mul
            damped = (1 - gm) * jax.lax.stop_gradient(pts_init) + gm * pts_init
            dcn_offset = damped - base
            cls = cls_out_conv(
                nn.relu(cls_dconv(cf, dcn_offset.astype(cf.dtype)))
            ).astype(jnp.float32)
            raw_refine = refine_out(
                nn.relu(refine_dconv(pf, dcn_offset.astype(pf.dtype)))
            ).astype(jnp.float32)
            if self.use_grid_points:
                pts_refine, _ = grid_from_reg(
                    raw_refine, jax.lax.stop_gradient(box_init))
            else:
                pts_refine = raw_refine + jax.lax.stop_gradient(pts_init)
            cls_list.append(cls)
            init_list.append(pts_init)
            refine_list.append(pts_refine)
        return cls_list, init_list, refine_list, moment


@dataclasses.dataclass(frozen=True)
class RepPointsCfg:
    num_classes: int = 80
    num_points: int = 9
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    assigner_scale: float = 4.0
    init_pos_num: int = 1
    refine_pos_iou: float = 0.5
    moment_mul: float = 0.01
    transform_method: str = "moment"  # 'moment' | 'minmax' | 'partial_minmax'
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    init_loss_weight: float = 0.5
    refine_loss_weight: float = 1.0
    smooth_l1_beta: float = 0.11


def points2bbox(pts_xy: jnp.ndarray, moment: jnp.ndarray,
                moment_mul: float, method: str = "moment") -> jnp.ndarray:
    """Point-set -> box transform (reference ``points2bbox``): 'moment'
    (mean +- std * exp(learnable)), 'minmax' (bounding box of all points),
    'partial_minmax' (bounding box of the first 4 points).
    pts_xy (P, n, 2) image coords -> (P, 4) boxes."""
    if method in ("minmax", "partial_minmax"):
        pts = pts_xy[:, :4] if method == "partial_minmax" else pts_xy
        lo = jnp.min(pts, axis=1)
        hi = jnp.max(pts, axis=1)
        return jnp.concatenate([lo, hi], axis=-1)
    mean = jnp.mean(pts_xy, axis=1)  # (P, 2)
    # torch .std() is unbiased
    n = pts_xy.shape[1]
    var = jnp.sum((pts_xy - mean[:, None]) ** 2, axis=1) / max(n - 1, 1)
    std = jnp.sqrt(var)  # (P, 2)
    mm = moment * moment_mul + jax.lax.stop_gradient(moment) * (
        1 - moment_mul
    )
    half = std * jnp.exp(mm)[None, :]
    return jnp.concatenate([mean - half, mean + half], axis=-1)


def offsets_to_pts(offsets: jnp.ndarray, centers: jnp.ndarray,
                   strides: jnp.ndarray, num_points: int) -> jnp.ndarray:
    """(P, 2n) y-first stride-unit offsets + (P, 2) centers -> (P, n, 2)
    image-coordinate xy points (reference ``offset_to_pts``)."""
    p = offsets.shape[0]
    o = offsets.reshape(p, num_points, 2)
    y = o[..., 0] * strides[:, None]
    x = o[..., 1] * strides[:, None]
    return jnp.stack(
        [centers[:, 0:1] + x, centers[:, 1:2] + y], axis=-1
    )


def reppoints_loss(
    cfg: RepPointsCfg,
    cls_logits: jnp.ndarray,  # (B, P, C)
    pts_init: jnp.ndarray,  # (B, P, 2n)
    pts_refine: jnp.ndarray,  # (B, P, 2n)
    moment: jnp.ndarray,  # (2,) learnable moment transfer
    points: jnp.ndarray,  # (P, 3) x, y, stride
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, p, c = cls_logits.shape
    centers = points[:, :2]
    strides = points[:, 2]
    g = gt_bboxes.shape[1]

    def decode(o):
        xy = offsets_to_pts(o, centers, strides, cfg.num_points)
        return points2bbox(xy, moment, cfg.moment_mul, cfg.transform_method)

    boxes_init = jax.vmap(decode)(pts_init)  # (B, P, 4)
    boxes_refine = jax.vmap(decode)(pts_refine)

    # init stage: PointAssigner
    def init_targets(gb, gm, gl):
        a = point_assign(points, gb, gm, gt_labels=gl,
                         scale=cfg.assigner_scale, pos_num=cfg.init_pos_num)
        pos = a.gt_inds > 0
        safe = jnp.clip(a.gt_inds - 1, 0, g - 1)
        return pos, box_ops.take_small_table(gb, safe)

    pos_i, match_i = jax.vmap(init_targets)(gt_bboxes, gt_mask, gt_labels)

    # refine stage: MaxIoU over init boxes
    def refine_targets(db, gb, gm, gl):
        a = max_iou_assign(
            jax.lax.stop_gradient(db), jnp.ones((p,), bool), gb, gm,
            gt_labels=gl, pos_iou_thr=cfg.refine_pos_iou,
            neg_iou_thr=cfg.refine_pos_iou, min_pos_iou=0.0,
            match_low_quality=True,
        )
        pos = a.gt_inds > 0
        safe = jnp.clip(a.gt_inds - 1, 0, g - 1)
        labels = jnp.where(pos, a.labels, cfg.num_classes)
        return pos, box_ops.take_small_table(gb, safe), labels

    pos_r, match_r, labels_r = jax.vmap(refine_targets)(
        boxes_init, gt_bboxes, gt_mask, gt_labels
    )

    norm = (cfg.point_base_scale * strides)[None, :, None]  # (1, P, 1)

    def stage_loss(boxes, pos, matched, weight):
        posf = pos.reshape(-1).astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(posf), 1.0)
        if axis_name is not None:
            num_pos = jax.lax.pmean(num_pos, axis_name)
        elem = L.smooth_l1_loss(
            boxes / norm, jax.lax.stop_gradient(matched) / norm,
            beta=cfg.smooth_l1_beta, reduction="none",
        ).reshape(-1, 4)
        return weight * jnp.sum(elem * posf[:, None]) / (num_pos * 4.0)

    loss_init = stage_loss(boxes_init, pos_i, match_i, cfg.init_loss_weight)
    loss_refine = stage_loss(boxes_refine, pos_r, match_r,
                             cfg.refine_loss_weight)

    posf = pos_r.reshape(-1).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(posf), 1.0)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    onehot = jax.nn.one_hot(labels_r.reshape(-1), c, dtype=jnp.float32)
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_logits.reshape(-1, c), onehot,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_pos,
    )
    return {"loss_cls": loss_cls, "loss_pts_init": loss_init,
            "loss_pts_refine": loss_refine}


def reppoints_get_bboxes(
    cfg: RepPointsCfg,
    cls_logits: jnp.ndarray,  # (P, C) one image
    pts_refine: jnp.ndarray,  # (P, 2n)
    moment: jnp.ndarray,
    points: jnp.ndarray,  # (P, 3)
    num_level_points: Tuple[int, ...],
    img_shape, scale_factor, rescale: bool,
    nms_pre: int = 1000, score_thr: float = 0.05,
    nms_iou_thr: float = 0.5, max_per_img: int = 100,
):
    centers = points[:, :2]
    strides = points[:, 2]
    xy = offsets_to_pts(pts_refine, centers, strides, cfg.num_points)
    boxes_all = points2bbox(xy, moment, cfg.moment_mul, cfg.transform_method)
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    sel_s, sel_b = [], []
    start = 0
    for np_ in num_level_points:
        s = jax.lax.dynamic_slice_in_dim(scores_all, start, np_)
        bx = jax.lax.dynamic_slice_in_dim(boxes_all, start, np_)
        k = min(nms_pre, np_)
        _, ti = jax.lax.top_k(jnp.max(s, axis=-1), k)
        sel_s.append(s[ti])
        sel_b.append(box_ops.clip_boxes(bx[ti], img_shape))
        start += np_
    scores = jnp.concatenate(sel_s)
    boxes = jnp.concatenate(sel_b)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
