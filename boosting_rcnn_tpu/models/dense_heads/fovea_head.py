"""FoveaBox head (anchor-free, per-level scale assignment).

Spec: reference ``mmdet/models/dense_heads/fovea_head.py`` +
``configs/foveabox``: each FPN level owns a sqrt-area range; a gt stamps its
class over the sigma-shrunk "fovea" of its box projected to the grid
(smaller gts stamped last, i.e. they win overlaps); box targets are
log((stride*pt - x1)/base_len) clamped to [1/16, 16]; losses are sigmoid
focal (alpha 0.4, gamma 1.5, avg num_pos + num_imgs) and smooth-L1
(beta 0.11) on the log-space targets; decode is exp then
stride*pt -/+ base_len * pred with multiclass NMS.

TPU form: the reference's per-gt python stamping loop becomes a per-level
(G, N) in-region mask with an argmin-over-area winner per point (exactly
reproducing the smallest-gt-wins overwrite order).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.nms import multiclass_nms_padded

# reuse the Retina tower: 4 stacked convs + cls/reg preds per level
from .retina_head import RetinaConvs  # noqa: F401  (builder uses it)


class FoveaAlignConvs(nn.Module):
    """FoveaBox ``with_deform`` tower (reference fovea_head.py
    ``FeatureAlign`` + the fovea_align configs): the reg branch predicts
    first; a 1x1 conv maps exp(bbox_pred) to deformable offsets that align
    the cls features before classification (deform_groups=4, GN towers)."""

    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    deform_groups: int = 4
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ...ops.deform_conv import deform_conv2d
        from ..layers import ConvModule

        cls_tower = [
            ConvModule(self.feat_channels, 3, norm_cfg=self.norm_cfg,
                       act="relu", dtype=self.dtype, name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            ConvModule(self.feat_channels, 3, norm_cfg=self.norm_cfg,
                       act="relu", dtype=self.dtype, name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="conv_reg")
        conv_offset = nn.Conv(
            self.deform_groups * 18, (1, 1), use_bias=False,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset",
        )
        align_kernel = self.param(
            "align_kernel", nn.initializers.lecun_normal(),
            (3, 3, self.feat_channels, self.feat_channels),
            jnp.float32,
        )
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="conv_cls",
        )
        cls_out, reg_out = [], []
        for x in feats:
            cf, rf = x, x
            for c in reg_tower:
                rf = c(rf)
            bbox_pred = conv_reg(rf).astype(jnp.float32)
            for c in cls_tower:
                cf = c(cf)
            offset = conv_offset(
                jnp.exp(jnp.clip(bbox_pred, -10.0, 10.0)).astype(cf.dtype))
            aligned = nn.relu(deform_conv2d(
                cf, offset, align_kernel.astype(cf.dtype),
                stride=1, padding=1, deform_groups=self.deform_groups,
            ))
            cls_out.append(conv_cls(aligned))
            reg_out.append(bbox_pred)
        return cls_out, reg_out, None


@dataclasses.dataclass(frozen=True)
class FoveaCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edge_list: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scale_ranges: Tuple[Tuple[int, int], ...] = (
        (1, 64), (32, 128), (64, 256), (128, 512), (256, 2048),
    )
    sigma: float = 0.4
    focal_gamma: float = 1.5
    focal_alpha: float = 0.4
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    smooth_l1_beta: float = 0.11


def fovea_points(featmap_sizes, strides, base_edges, scale_ranges):
    """Flat per-point geometry: (x+.5, y+.5), stride, base_len, lo, hi and
    integer grid coords + per-level widths for region tests."""
    xs, ys, ss, bs, los, his, cols, rows = [], [], [], [], [], [], [], []
    for (h, w), s, b, (lo, hi) in zip(featmap_sizes, strides, base_edges,
                                      scale_ranges):
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        xs.append(xx.ravel() + 0.5)
        ys.append(yy.ravel() + 0.5)
        cols.append(xx.ravel())
        rows.append(yy.ravel())
        n = h * w
        ss.append(np.full(n, s, np.float32))
        bs.append(np.full(n, b, np.float32))
        los.append(np.full(n, lo, np.float32))
        his.append(np.full(n, hi, np.float32))
    cat = lambda a: np.concatenate(a, 0)
    return tuple(map(cat, (xs, ys, ss, bs, los, his, cols, rows)))


def fovea_targets(cfg, pack, widths, heights, gt_bboxes, gt_labels, gt_mask):
    """Single image: (labels (N,), bbox_t (N, 4) log-space, pos (N,))."""
    x, y, s, b, lo, hi, col, row = pack
    areas = jnp.sqrt(
        jnp.maximum(gt_bboxes[:, 2] - gt_bboxes[:, 0], 0)
        * jnp.maximum(gt_bboxes[:, 3] - gt_bboxes[:, 1], 0)
    )
    hit = (areas[:, None] >= lo[None]) & (areas[:, None] <= hi[None]) & gt_mask[:, None]

    gb = gt_bboxes[:, None, :] / s[None, :, None]  # (G, N, 4) level coords
    half_w = 0.5 * (gb[..., 2] - gb[..., 0])
    half_h = 0.5 * (gb[..., 3] - gb[..., 1])
    sig = cfg.sigma
    px1 = jnp.clip(jnp.ceil(gb[..., 0] + (1 - sig) * half_w - 0.5), 0, widths[None] - 1)
    px2 = jnp.clip(jnp.floor(gb[..., 0] + (1 + sig) * half_w - 0.5), 0, widths[None] - 1)
    py1 = jnp.clip(jnp.ceil(gb[..., 1] + (1 - sig) * half_h - 0.5), 0, heights[None] - 1)
    py2 = jnp.clip(jnp.floor(gb[..., 1] + (1 + sig) * half_h - 0.5), 0, heights[None] - 1)
    in_region = (
        hit
        & (col[None] >= px1) & (col[None] <= px2)
        & (row[None] >= py1) & (row[None] <= py2)
    )  # (G, N)

    # smallest-area gt wins overlaps (reference stamps descending by area)
    key = jnp.where(in_region, areas[:, None], jnp.inf)
    winner = jnp.argmin(key, axis=0)  # (N,)
    pos = jnp.any(in_region, axis=0)
    wl = gt_labels[winner]
    labels = jnp.where(pos, wl, cfg.num_classes)
    wb = gt_bboxes[winner]  # (N, 4) image coords
    t = jnp.stack(
        [
            (s * x - wb[:, 0]) / b,
            (s * y - wb[:, 1]) / b,
            (wb[:, 2] - s * x) / b,
            (wb[:, 3] - s * y) / b,
        ],
        -1,
    )
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    return labels, t, pos


def fovea_loss(cfg, cls, reg, pack, widths, heights,
               gt_bboxes, gt_labels, gt_mask, axis_name=None):
    """cls (B, N, C); reg (B, N, 4)."""
    b = cls.shape[0]
    labels, bbox_t, pos = jax.vmap(
        lambda gb, gl, gm: fovea_targets(cfg, pack, widths, heights, gb, gl, gm)
    )(gt_bboxes, gt_labels, gt_mask)
    num_pos = jnp.sum(pos.astype(jnp.float32))
    num_imgs = float(b)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
        num_imgs = jax.lax.pmean(num_imgs, axis_name)
    onehot = jax.nn.one_hot(labels, cfg.num_classes)
    loss_cls = L.sigmoid_focal_loss(
        cls.reshape(-1, cfg.num_classes), onehot.reshape(-1, cfg.num_classes),
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        avg_factor=num_pos + num_imgs,
    )
    loss_bbox = L.smooth_l1_loss(
        reg, bbox_t, weight=pos[..., None].astype(jnp.float32),
        beta=cfg.smooth_l1_beta, avg_factor=jnp.maximum(num_pos, 1.0) * 4,
    )
    return {
        "loss_cls": loss_cls * cfg.loss_cls_weight,
        "loss_bbox": loss_bbox * cfg.loss_bbox_weight,
    }


def fovea_get_bboxes(cfg, cls, reg, pack, img_shape, scale_factor,
                     rescale=True, score_thr=0.05, nms_iou_thr=0.5,
                     max_per_img=100):
    """Single image decode."""
    x, y, s, b = pack[0], pack[1], pack[2], pack[3]
    scores = jax.nn.sigmoid(cls)
    pred = jnp.exp(jnp.clip(reg, -10.0, 10.0))
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    x1 = jnp.clip(s * x - b * pred[:, 0], 0, w - 1)
    y1 = jnp.clip(s * y - b * pred[:, 1], 0, h - 1)
    x2 = jnp.clip(s * x + b * pred[:, 2], 0, w - 1)
    y2 = jnp.clip(s * y + b * pred[:, 3], 0, h - 1)
    boxes = jnp.stack([x1, y1, x2, y2], -1)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
