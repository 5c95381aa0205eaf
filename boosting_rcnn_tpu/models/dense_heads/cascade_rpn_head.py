"""Cascade RPN (reference ``mmdet/models/dense_heads/cascade_rpn_head.py``
+ ``cascade_head.py``; config ``configs/cascade_rpn/crpn_*``).

Two RPN stages over one square anchor per location:

  * **stage 1** — reg-only, features adapted by a dilation-3 3x3 conv
    (``AdaptiveConv`` 'dilation' mode), RegionAssigner targets, linear IoU
    loss on decoded boxes; its regressed boxes become stage-2's anchors and
    its adapted feature is *bridged* forward.
  * **stage 2** — features adapted by a 3x3 deformable conv whose offsets
    are derived analytically from the refined anchors
    (``anchor_offset:127``: shape term from anchor w/h vs the dilated
    kernel footprint + center term from anchor center vs the grid point),
    then 1x1 cls + reg; MaxIoU(0.7) + random-256 sampling, BCE + linear
    IoU loss.

Proposals decode stage-2 deltas from the refined anchors (NMS 0.8, top
300).  All per-image work is vmapped; offsets are computed as flat (A, 18)
tensors and reshaped per level for the deformable conv.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops
from ...ops import losses as L
from ...ops.assigners import max_iou_assign, region_assign
from ...ops.deform_conv import deform_conv2d
from ...ops.nms import batched_nms_padded
from ...ops.samplers import random_sample


@dataclasses.dataclass(frozen=True)
class CascadeRPNCfg:
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scale: float = 8.0
    stage1_stds: Tuple[float, ...] = (0.1, 0.1, 0.5, 0.5)
    stage2_stds: Tuple[float, ...] = (0.05, 0.05, 0.1, 0.1)
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.7
    min_pos_iou: float = 0.3
    num_samples: int = 256
    pos_fraction: float = 0.5
    loss_bbox_weight: float = 7.0  # 10.0 * rpn_weight(0.7)
    loss_cls_weight: float = 0.7


class CascadeRPNConvs(nn.Module):
    """Both stages' convs.  The detector drives the two stages explicitly
    (stage-2 deform offsets depend on stage-1's refined anchors)."""

    feat_channels: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        self.s1_adapt = nn.Conv(
            self.feat_channels, (3, 3), padding=[(3, 3), (3, 3)],
            kernel_dilation=(3, 3), use_bias=False, dtype=self.dtype)
        self.s1_reg_conv = nn.Conv(4, (1, 1), dtype=self.dtype)
        self.s2_kernel = self.param(
            "s2_adapt_kernel", nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        self.s2_cls_conv = nn.Conv(1, (1, 1), dtype=self.dtype)
        self.s2_reg_conv = nn.Conv(4, (1, 1), dtype=self.dtype)

    def stage1(self, feats):
        bridged = [nn.relu(self.s1_adapt(f)) for f in feats]
        return bridged, [self.s1_reg_conv(y) for y in bridged]

    def stage2(self, feats, offsets):
        cls_out, reg_out = [], []
        for f, off in zip(feats, offsets):
            y = nn.relu(deform_conv2d(
                f, off, self.s2_kernel.astype(f.dtype)))
            cls_out.append(self.s2_cls_conv(y))
            reg_out.append(self.s2_reg_conv(y))
        return cls_out, reg_out

    def __call__(self, feats, offsets=None):
        bridged, s1_reg = self.stage1(feats)
        if offsets is None:  # init path: zero offsets
            offsets = [
                jnp.zeros(f.shape[:3] + (18,), f.dtype) for f in bridged
            ]
        cls, s2_reg = self.stage2(bridged, offsets)
        return s1_reg, cls, s2_reg


def square_anchors_crpn(cfg: CascadeRPNCfg, featmap_sizes):
    out, nla = [], []
    for (h, w), s in zip(featmap_sizes, cfg.strides):
        base = cfg.anchor_scale * s
        xs = (jnp.arange(w) + 0.5) * s
        ys = (jnp.arange(h) + 0.5) * s
        cx, cy = jnp.meshgrid(xs, ys)
        half = base / 2.0
        out.append(jnp.stack(
            [cx - half, cy - half, cx + half, cy + half], -1).reshape(-1, 4))
        nla.append(h * w)
    return jnp.concatenate(out, 0), nla


def anchor_offsets(cfg: CascadeRPNCfg, anchors_flat, featmap_sizes):
    """(A, 4) refined anchors -> per-level (H, W, 18) deform offsets
    (reference ``anchor_offset:127``, ks=3 dilation=1; our deform op takes
    interleaved (dy, dx) per tap)."""
    outs = []
    start = 0
    for (h, w), s in zip(featmap_sizes, cfg.strides):
        na = h * w
        a = jax.lax.dynamic_slice_in_dim(anchors_flat, start, na)
        start += na
        aw = (a[:, 2] - a[:, 0]) / s
        ah = (a[:, 3] - a[:, 1]) / s
        cx = (a[:, 0] + a[:, 2]) / 2 / s
        cy = (a[:, 1] + a[:, 3]) / 2 / s
        xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h) + 0.5
        ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w) + 0.5
        # kernel grid yy/xx in {-1, 0, 1}
        ky, kx = jnp.meshgrid(jnp.arange(3.0) - 1, jnp.arange(3.0) - 1,
                              indexing="ij")
        kx = kx.reshape(-1)
        ky = ky.reshape(-1)
        half_w = aw / 2.0 - 1.0  # w/(ks-1) - dilation
        half_h = ah / 2.0 - 1.0
        off_x = half_w[:, None] * kx[None] + (cx - xs)[:, None]
        off_y = half_h[:, None] * ky[None] + (cy - ys)[:, None]
        off = jnp.stack([off_y, off_x], axis=-1).reshape(na, 18)
        outs.append(off.reshape(h, w, 18))
    return outs


def crpn_loss(cfg: CascadeRPNCfg, s1_reg, cls, s2_reg, anchors, refined,
              nla, gt_bboxes, gt_mask, rng=None, axis_name=None):
    """s1_reg/s2_reg (B, A, 4); cls (B, A); anchors (A, 4) static;
    refined (B, A, 4) = stage-1 decode (stop-grad for stage-2 targets)."""
    b, a = cls.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, b)

    # ---- stage 1: region assignment, linear IoU on decoded boxes ----
    def s1_targets(gb, gm):
        res = region_assign(
            anchors, nla, cfg.strides, cfg.anchor_scale, gb, gm,
            center_ratio=cfg.center_ratio, ignore_ratio=cfg.ignore_ratio)
        pos = res.gt_inds > 0
        safe = jnp.clip(res.gt_inds - 1, 0, gb.shape[0] - 1)
        return pos, jnp.where(pos[:, None], box_ops.take_small_table(gb, safe), 1.0)

    pos1, tgt1 = jax.vmap(s1_targets)(gt_bboxes, gt_mask)
    dec1 = jax.vmap(
        lambda r: box_ops.delta2bbox(anchors, r, (0.0,) * 4,
                                     cfg.stage1_stds)
    )(s1_reg.astype(jnp.float32))
    iou1 = box_ops.bbox_overlaps_aligned(
        dec1.reshape(-1, 4), tgt1.reshape(-1, 4))
    p1 = pos1.reshape(-1).astype(jnp.float32)
    n1 = jnp.sum(p1)
    if axis_name is not None:
        n1 = jax.lax.pmean(n1, axis_name)
    loss_s1 = ((1.0 - iou1) * p1).sum() / jnp.maximum(n1, 1.0)

    # ---- stage 2: standard RPN on refined anchors ----
    def s2_targets(r_, anc, gb, gm):
        assign = max_iou_assign(
            anc, jnp.ones((a,), bool), gb, gm,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, match_low_quality=True)
        res = random_sample(r_, assign, jnp.ones((a,), bool),
                            num=cfg.num_samples,
                            pos_fraction=cfg.pos_fraction)
        w = jnp.zeros((a,)).at[res.inds].add(res.valid.astype(jnp.float32))
        pos = jnp.zeros((a,), bool).at[res.inds].set(res.is_pos)
        safe = jnp.clip(assign.gt_inds - 1, 0, gb.shape[0] - 1)
        return pos, jnp.minimum(w, 1.0), jnp.where(
            pos[:, None], box_ops.take_small_table(gb, safe), 1.0)

    pos2, w2, tgt2 = jax.vmap(s2_targets)(
        rngs, refined, gt_bboxes, gt_mask)
    dec2 = jax.vmap(
        lambda anc, r: box_ops.delta2bbox(anc, r, (0.0,) * 4,
                                          cfg.stage2_stds)
    )(refined, s2_reg.astype(jnp.float32))
    iou2 = box_ops.bbox_overlaps_aligned(
        dec2.reshape(-1, 4), tgt2.reshape(-1, 4))
    p2 = pos2.reshape(-1).astype(jnp.float32)
    n2 = jnp.maximum(jnp.sum(w2), 1.0)
    if axis_name is not None:
        n2 = jnp.maximum(jax.lax.pmean(jnp.sum(w2), axis_name), 1.0)
    loss_s2_reg = ((1.0 - iou2) * p2).sum() / n2
    loss_s2_cls = L.binary_cross_entropy_loss(
        cls.astype(jnp.float32).reshape(-1),
        pos2.reshape(-1).astype(jnp.float32),
        weight=w2.reshape(-1), reduction="sum") / n2
    return {
        "loss_rpn_s0_bbox": cfg.loss_bbox_weight * loss_s1,
        "loss_rpn_s1_cls": cfg.loss_cls_weight * loss_s2_cls,
        "loss_rpn_s1_bbox": cfg.loss_bbox_weight * loss_s2_reg,
    }


def crpn_proposals(cfg: CascadeRPNCfg, cls, s2_reg, refined, nla, img_shape,
                   nms_pre=2000, max_per_img=300, nms_iou_thr=0.8,
                   min_bbox_size=0.0):
    """Single-image proposals from stage 2 (reference
    ``StageCascadeRPNHead.get_bboxes``)."""
    scores = jax.nn.sigmoid(cls.astype(jnp.float32))
    sel_s, sel_b, sel_a, sel_i = [], [], [], []
    start = 0
    for lvl, na in enumerate(nla):
        s = jax.lax.dynamic_slice_in_dim(scores, start, na)
        bp = jax.lax.dynamic_slice_in_dim(s2_reg, start, na)
        an = jax.lax.dynamic_slice_in_dim(refined, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        ts, ti = jax.lax.top_k(s, k)
        sel_s.append(ts)
        sel_b.append(bp[ti])
        sel_a.append(an[ti])
        sel_i.append(jnp.full((k,), lvl, jnp.int32))
        start += na
    s = jnp.concatenate(sel_s)
    d = jnp.concatenate(sel_b).astype(jnp.float32)
    an = jnp.concatenate(sel_a)
    ids = jnp.concatenate(sel_i)
    props = box_ops.delta2bbox(an, d, (0.0,) * 4, cfg.stage2_stds,
                               max_shape=img_shape)
    wv = props[:, 2] - props[:, 0]
    hv = props[:, 3] - props[:, 1]
    ok = (wv > min_bbox_size) & (hv > min_bbox_size)
    boxes, out_s, valid, _ = batched_nms_padded(
        props, s, ids, nms_iou_thr, max_per_img, valid=ok)
    return boxes, jnp.where(valid, out_s, 0.0), valid
