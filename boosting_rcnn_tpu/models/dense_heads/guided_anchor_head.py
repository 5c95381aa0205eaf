"""Guided Anchoring (reference
``mmdet/models/dense_heads/guided_anchor_head.py`` + ``ga_rpn_head.py``).

Each location carries one *square* anchor (scale = octave base) and nine
*approx* anchors (3 scales x 3 ratios).  Two extra branches predict
  * **location** (objectness; focal loss on center/ignore/negative region
    targets, ``ga_loc_targets:375``), and
  * **shape** (dw, dh deltas; bounded-IoU loss against the best-matching
    GT via the approx-max-IoU assignment, ``ga_shape_targets:540``).
Guided anchors = squares grown by the predicted shape; a deformable-conv
feature adaption (offsets from the shape prediction,
``FeatureAdaption:34``) conditions the cls/reg features on the anchor
geometry.  The reference's test-time MaskedConv2d is an arithmetic no-op
on TPU (dense conv + mask gives identical outputs; dense is faster on the
MXU), realised by the loc-filter mask applied to the scores.

Everything is fixed-shape: region rasterisation is per-pixel comparisons,
the approx assignment is one (G, A) matrix max over the 9-approx axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops
from ...ops import losses as L
from ...ops.assigners import assign_wrt_overlaps
from ...ops.box_ops import bbox_overlaps
from ...ops.deform_conv import deform_conv2d


@dataclasses.dataclass(frozen=True)
class GACfg:
    octave_base_scale: int = 8
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_coder_stds: Tuple[float, ...] = (0.07, 0.07, 0.14, 0.14)
    bbox_coder_stds: Tuple[float, ...] = (0.07, 0.07, 0.11, 0.11)
    loc_filter_thr: float = 0.01
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    ga_pos_iou_thr: float = 0.7
    ga_neg_iou_thr: float = 0.3
    ga_min_pos_iou: float = 0.3
    # cls/reg assignment on the guided anchors (GA-RPN train_cfg)
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    num_samples: int = 256
    pos_fraction: float = 0.5
    loc_loss_weight: float = 1.0
    shape_loss_weight: float = 1.0
    loss_loc_gamma: float = 2.0
    loss_loc_alpha: float = 0.25


def square_anchors(cfg: GACfg, featmap_sizes) -> Tuple[jnp.ndarray, list]:
    """One square anchor per location, concatenated over levels -> (A, 4)."""
    out, nla = [], []
    for (h, w), s in zip(featmap_sizes, cfg.strides):
        base = cfg.octave_base_scale * s
        xs = (jnp.arange(w) + 0.5) * s
        ys = (jnp.arange(h) + 0.5) * s
        cx, cy = jnp.meshgrid(xs, ys)
        half = base / 2.0
        a = jnp.stack([cx - half, cy - half, cx + half, cy + half], -1)
        out.append(a.reshape(-1, 4))
        nla.append(h * w)
    return jnp.concatenate(out, axis=0), nla


def approx_anchors(cfg: GACfg, featmap_sizes) -> jnp.ndarray:
    """Nine approxs per location -> (A, 9, 4) aligned with the squares."""
    octave = [2 ** (i / cfg.scales_per_octave)
              for i in range(cfg.scales_per_octave)]
    out = []
    for (h, w), s in zip(featmap_sizes, cfg.strides):
        xs = (jnp.arange(w) + 0.5) * s
        ys = (jnp.arange(h) + 0.5) * s
        cx, cy = jnp.meshgrid(xs, ys)
        boxes = []
        for o in octave:
            base = cfg.octave_base_scale * s * o
            for r in cfg.ratios:
                hw = base * (r ** -0.5) / 2.0
                hh = base * (r ** 0.5) / 2.0
                boxes.append(jnp.stack(
                    [cx - hw, cy - hh, cx + hw, cy + hh], -1))
        a = jnp.stack(boxes, axis=2)  # (H, W, 9, 4)
        out.append(a.reshape(-1, len(boxes), 4))
    return jnp.concatenate(out, axis=0)


def guided_anchors(cfg: GACfg, squares, shape_pred):
    """squares (A, 4) + shape deltas (A, 2) -> anchors (A, 4)
    (``anchor_coder.decode`` with zero-center deltas, wh_ratio_clip 1e-6)."""
    deltas = jnp.concatenate(
        [jnp.zeros_like(shape_pred), shape_pred], axis=-1)
    return box_ops.delta2bbox(
        squares, deltas, means=(0.0,) * 4, stds=cfg.anchor_coder_stds,
        wh_ratio_clip=1e-6)


def _region(gt, r, h, w):
    """calc_region (reference ``mmdet/core/anchor/utils.py``): the centred
    sub-box with half-ratio r, in feature pixels, clamped to the map."""
    x1 = jnp.clip(jnp.round(gt[..., 0] * (1 - r) + gt[..., 2] * r), 0, w - 1)
    y1 = jnp.clip(jnp.round(gt[..., 1] * (1 - r) + gt[..., 3] * r), 0, h - 1)
    x2 = jnp.clip(jnp.round(gt[..., 0] * r + gt[..., 2] * (1 - r)), 0, w - 1)
    y2 = jnp.clip(jnp.round(gt[..., 1] * r + gt[..., 3] * (1 - r)), 0, h - 1)
    return x1, y1, x2, y2


def ga_loc_targets(cfg: GACfg, gt_bboxes, gt_mask, featmap_sizes):
    """Single image -> (loc_targets (A,), loc_weights (A,), avg_factor).

    Center region -> target 1 / weight 1; ignore ring (own level and the
    two adjacent levels) -> weight 0; elsewhere weight 0.1
    (``ga_loc_targets:375-476``)."""
    num_lvls = len(featmap_sizes)
    scale = jnp.sqrt(
        jnp.maximum((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                    * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1e-6))
    min_size = float(cfg.octave_base_scale * cfg.strides[0])
    lvl = jnp.floor(jnp.log2(scale) - jnp.log2(min_size) + 0.5)
    lvl = jnp.clip(lvl, 0, num_lvls - 1).astype(jnp.int32)
    r1 = (1 - cfg.center_ratio) / 2
    r2 = (1 - cfg.ignore_ratio) / 2

    targets, weights = [], []
    total = 0
    for li, ((h, w), s) in enumerate(zip(featmap_sizes, cfg.strides)):
        g = gt_bboxes / s
        yy = jnp.arange(h)[:, None, None]  # (h, 1, 1)
        xx = jnp.arange(w)[None, :, None]  # (1, w, 1)

        def inside(region_mask_gts):
            x1, y1, x2, y2 = region_mask_gts
            return ((xx >= x1[None, None]) & (xx <= x2[None, None])
                    & (yy >= y1[None, None]) & (yy <= y2[None, None]))

        own = gt_mask & (lvl == li)
        ctr = inside(_region(g, r1, h, w)) & own[None, None]
        ign = inside(_region(g, r2, h, w)) & own[None, None]
        adj = gt_mask & ((lvl == li - 1) | (lvl == li + 1))
        ign_adj = inside(_region(g, r2, h, w)) & adj[None, None]
        ctr_any = jnp.any(ctr, -1)
        ign_any = jnp.any(ign | ign_adj, -1)
        t = ctr_any.astype(jnp.float32)
        wgt = jnp.where(ctr_any, 1.0, jnp.where(ign_any, 0.0, 0.1))
        targets.append(t.reshape(-1))
        weights.append(wgt.reshape(-1))
        total += h * w
    return (jnp.concatenate(targets), jnp.concatenate(weights),
            total / 200.0)


def ga_shape_targets(cfg: GACfg, approxs, squares, gt_bboxes, gt_mask):
    """Single image -> (bbox_anchors (A,4), bbox_gts (A,4), weight (A,)).

    Approx-max-IoU assignment (``approx_max_iou_assigner.py``): each
    square's IoU with a GT is the max over its 9 approxs; positives keep
    (square, matched gt) pairs for the bounded-IoU shape loss."""
    a = squares.shape[0]
    g = gt_bboxes.shape[0]
    iou = bbox_overlaps(
        gt_bboxes, approxs.reshape(a * approxs.shape[1], 4))
    iou = iou.reshape(g, a, -1).max(axis=-1)  # (G, A)
    res = assign_wrt_overlaps(
        iou, squares, jnp.ones((a,), bool), gt_bboxes, gt_mask,
        pos_iou_thr=cfg.ga_pos_iou_thr, neg_iou_thr=cfg.ga_neg_iou_thr,
        min_pos_iou=cfg.ga_min_pos_iou,
    )
    pos = res.gt_inds > 0
    safe = jnp.clip(res.gt_inds - 1, 0, g - 1)
    bbox_gts = jnp.where(pos[:, None], box_ops.take_small_table(gt_bboxes, safe), 0.0)
    return squares, bbox_gts, pos.astype(jnp.float32)


def bounded_iou_loss(pred, target, beta: float = 0.2, eps: float = 1e-3):
    """(N, 4) boxes -> (N, 4) elementwise (reference
    ``losses/iou_loss.py::bounded_iou_loss``)."""
    pcx = (pred[:, 0] + pred[:, 2]) * 0.5
    pcy = (pred[:, 1] + pred[:, 3]) * 0.5
    pw = pred[:, 2] - pred[:, 0]
    ph = pred[:, 3] - pred[:, 1]
    t = jax.lax.stop_gradient(target)
    tcx = (t[:, 0] + t[:, 2]) * 0.5
    tcy = (t[:, 1] + t[:, 3]) * 0.5
    tw = t[:, 2] - t[:, 0]
    th = t[:, 3] - t[:, 1]
    dx = tcx - pcx
    dy = tcy - pcy
    lx = 1 - jnp.maximum((tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx)
                                                   + eps), 0.0)
    ly = 1 - jnp.maximum((th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy)
                                                   + eps), 0.0)
    lw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    lh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([lx, ly, lw, lh], axis=-1)
    return jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)


class FeatureAdaption(nn.Module):
    """1x1 conv on the (detached) shape pred -> 3x3 deform-conv offsets
    (reference ``FeatureAdaption:34``)."""

    channels: int
    deform_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shape_pred):
        off = nn.Conv(self.deform_groups * 18, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.normal(0.1),
                      dtype=self.dtype, name="conv_offset")(
                          jax.lax.stop_gradient(shape_pred))
        w = self.param("adapt_kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.channels))
        y = deform_conv2d(x, off, w.astype(x.dtype),
                          deform_groups=self.deform_groups)
        return nn.relu(y)


class GARPNConvs(nn.Module):
    """GA-RPN head convs (reference ``ga_rpn_head.py``): shared 3x3, then
    loc/shape branches, feature adaption, cls/reg on adapted features."""

    feat_channels: int = 256
    deform_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.feat_channels, (3, 3),
                       padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="rpn_conv")
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(-4.595),
                           name="conv_loc")  # focal-init prior 0.01
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape")
        adaption = FeatureAdaption(self.feat_channels, self.deform_groups,
                                   dtype=self.dtype, name="adaption")
        conv_cls = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), dtype=self.dtype, name="conv_reg")
        locs, shapes, clss, regs = [], [], [], []
        for f in feats:
            y = nn.relu(conv(f))
            loc = conv_loc(y)
            shp = conv_shape(y)
            adapted = adaption(y, shp)
            locs.append(loc)
            shapes.append(shp)
            clss.append(conv_cls(adapted))
            regs.append(conv_reg(adapted))
        return clss, regs, shapes, locs


def ga_rpn_loss(
    cfg: GACfg,
    cls_logits: jnp.ndarray,  # (B, A)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    shape_preds: jnp.ndarray,  # (B, A, 2)
    loc_logits: jnp.ndarray,  # (B, A)
    squares: jnp.ndarray,  # (A, 4)
    approxs: jnp.ndarray,  # (A, 9, 4)
    featmap_sizes,
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
):
    """Full GA-RPN loss (reference ``guided_anchor_head.py::loss:643``):
    loc focal + shape bounded-IoU + standard cls/reg on guided anchors."""
    from ...ops.samplers import random_sample

    from ...ops.assigners import max_iou_assign

    b, a = cls_logits.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, b)

    # ---- loc branch ----
    loc_t, loc_w, loc_avg = jax.vmap(
        lambda gb, gm: ga_loc_targets(cfg, gb, gm, featmap_sizes)
    )(gt_bboxes, gt_mask)
    fl = L.sigmoid_focal_loss(
        loc_logits.astype(jnp.float32).reshape(-1), loc_t.reshape(-1),
        gamma=cfg.loss_loc_gamma, alpha=cfg.loss_loc_alpha,
        reduction="none",
    )
    loc_avg_f = jnp.sum(loc_avg) / b * b  # total/200 across batch
    loss_loc = (fl * loc_w.reshape(-1)).sum() / jnp.maximum(loc_avg_f, 1.0)

    # ---- shape branch ----
    ba, bg, bw = jax.vmap(
        lambda gb, gm: ga_shape_targets(cfg, approxs, squares, gb, gm)
    )(gt_bboxes, gt_mask)
    pred_anchors = jax.vmap(
        lambda sp: guided_anchors(cfg, squares, sp)
    )(shape_preds.astype(jnp.float32))
    n_pos = jnp.maximum(jnp.sum(bw), 1.0)
    if axis_name is not None:
        n_pos = jnp.maximum(jax.lax.pmean(jnp.sum(bw), axis_name), 1.0)
    elem = bounded_iou_loss(
        pred_anchors.reshape(-1, 4),
        jnp.where(bw.reshape(-1, 1) > 0, bg.reshape(-1, 4), 1.0),
    )
    loss_shape = (elem * bw.reshape(-1, 1)).sum() / (4.0 * n_pos) * 4.0

    # ---- cls/reg on guided anchors (standard RPN recipe) ----
    g_anchors = jax.lax.stop_gradient(pred_anchors)  # (B, A, 4)

    def targets(r_, anc, gb, gm):
        assign = max_iou_assign(
            anc, jnp.ones((a,), bool), gb, gm,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, match_low_quality=True,
        )
        res = random_sample(
            r_, assign, jnp.ones((a,), bool),
            num=cfg.num_samples, pos_fraction=cfg.pos_fraction,
        )
        w = jnp.zeros((a,)).at[res.inds].add(res.valid.astype(jnp.float32))
        pos = jnp.zeros((a,), bool).at[res.inds].set(res.is_pos)
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        enc = box_ops.bbox2delta(
            anc, box_ops.take_small_table(gb, safe), (0.0,) * 4, cfg.bbox_coder_stds, eps=1e-6
        )
        return pos, jnp.minimum(w, 1.0), jnp.where(pos[:, None], enc, 0.0)

    pos, w, bt = jax.vmap(targets)(rngs, g_anchors, gt_bboxes, gt_mask)
    num_total = jnp.maximum(jnp.sum(w), 1.0)
    if axis_name is not None:
        num_total = jnp.maximum(jax.lax.pmean(jnp.sum(w), axis_name), 1.0)
    loss_cls = (
        L.binary_cross_entropy_loss(
            cls_logits.astype(jnp.float32).reshape(-1),
            pos.reshape(-1).astype(jnp.float32),
            weight=w.reshape(-1), reduction="sum",
        ) / num_total
    )
    posf = pos.astype(jnp.float32)
    l1 = jnp.abs(bbox_preds.astype(jnp.float32) - bt)
    beta = 1.0
    sm = jnp.where(l1 < beta, 0.5 * l1 * l1 / beta, l1 - 0.5 * beta)
    loss_bbox = (sm * posf[..., None]).sum() / num_total
    return {
        "loss_rpn_cls": loss_cls,
        "loss_rpn_bbox": loss_bbox,
        "loss_anchor_loc": cfg.loc_loss_weight * loss_loc,
        "loss_anchor_shape": cfg.shape_loss_weight * loss_shape,
    }


def ga_rpn_proposals(
    cfg: GACfg,
    cls_logits: jnp.ndarray,  # (A,) single image
    bbox_preds: jnp.ndarray,  # (A, 4)
    shape_preds: jnp.ndarray,  # (A, 2)
    loc_logits: jnp.ndarray,  # (A,)
    squares: jnp.ndarray,
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,
    nms_pre: int = 1000,
    max_per_img: int = 1000,
    nms_iou_thr: float = 0.7,
    min_bbox_size: float = 0.0,
):
    """Single-image GA-RPN proposals (reference ``ga_rpn_head.py:
    _get_bboxes_single``): scores masked by the loc filter, decode against
    the guided anchors, per-level topk, NMS."""
    from ...ops.nms import batched_nms_padded

    anchors = guided_anchors(cfg, squares, shape_preds.astype(jnp.float32))
    keep = jax.nn.sigmoid(loc_logits.astype(jnp.float32)) \
        >= cfg.loc_filter_thr
    scores = jnp.where(
        keep, jax.nn.sigmoid(cls_logits.astype(jnp.float32)), -1.0)
    sel_s, sel_b, sel_a, sel_i = [], [], [], []
    start = 0
    for lvl, na in enumerate(num_level_anchors):
        s = jax.lax.dynamic_slice_in_dim(scores, start, na)
        bp = jax.lax.dynamic_slice_in_dim(bbox_preds, start, na)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, na)
        k = min(nms_pre, na) if nms_pre > 0 else na
        ts, ti = jax.lax.top_k(s, k)
        sel_s.append(ts)
        sel_b.append(bp[ti])
        sel_a.append(an[ti])
        sel_i.append(jnp.full((k,), lvl, jnp.int32))
        start += na
    s = jnp.concatenate(sel_s)
    d = jnp.concatenate(sel_b)
    an = jnp.concatenate(sel_a)
    ids = jnp.concatenate(sel_i)
    props = box_ops.delta2bbox(
        an, d, (0.0,) * 4, cfg.bbox_coder_stds, max_shape=img_shape)
    wv = props[:, 2] - props[:, 0]
    hv = props[:, 3] - props[:, 1]
    ok = (wv > min_bbox_size) & (hv > min_bbox_size) & (s > 0)
    boxes, out_s, valid, _ = batched_nms_padded(
        props, s, ids, nms_iou_thr, max_per_img, valid=ok
    )
    return boxes, jnp.where(valid, out_s, 0.0), valid


class GARetinaConvs(nn.Module):
    """GA-RetinaNet head (reference ``ga_retina_head.py``): cls/reg towers,
    loc from the cls tower, shape from the reg tower, per-branch feature
    adaption, then cls/reg heads (MaskedConv == dense conv + loc mask on
    TPU)."""

    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    deform_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cls_t = [nn.Conv(self.feat_channels, (3, 3),
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         name=f"cls_conv{i}")
                 for i in range(self.stacked_convs)]
        reg_t = [nn.Conv(self.feat_channels, (3, 3),
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         name=f"reg_conv{i}")
                 for i in range(self.stacked_convs)]
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(-4.595),
                           name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape")
        adapt_cls = FeatureAdaption(self.feat_channels, self.deform_groups,
                                    dtype=self.dtype, name="adapt_cls")
        adapt_reg = FeatureAdaption(self.feat_channels, self.deform_groups,
                                    dtype=self.dtype, name="adapt_reg")
        head_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           bias_init=nn.initializers.constant(-4.595),
                           dtype=self.dtype, name="retina_cls")
        head_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="retina_reg")
        clss, regs, shapes, locs = [], [], [], []
        for f in feats:
            c, r = f, f
            for conv in cls_t:
                c = nn.relu(conv(c))
            for conv in reg_t:
                r = nn.relu(conv(r))
            loc = conv_loc(c)
            shp = conv_shape(r)
            clss.append(head_cls(adapt_cls(c, shp)))
            regs.append(head_reg(adapt_reg(r, shp)))
            shapes.append(shp)
            locs.append(loc)
        return clss, regs, shapes, locs


def ga_retina_loss(
    cfg: GACfg,
    num_classes: int,
    cls_logits,  # (B, A, C)
    bbox_preds,  # (B, A, 4)
    shape_preds,  # (B, A, 2)
    loc_logits,  # (B, A)
    squares,
    approxs,
    featmap_sizes,
    gt_bboxes,
    gt_labels,
    gt_mask,
    smooth_l1_beta: float = 0.04,
    axis_name=None,
):
    """GA-RetinaNet loss: loc/shape branches as GA-RPN, multi-class focal
    cls + smooth-L1 reg on the guided anchors (no sampling — focal)."""
    from ...ops.assigners import max_iou_assign

    b, a, c = cls_logits.shape

    loc_t, loc_w, loc_avg = jax.vmap(
        lambda gb, gm: ga_loc_targets(cfg, gb, gm, featmap_sizes)
    )(gt_bboxes, gt_mask)
    fl = L.sigmoid_focal_loss(
        loc_logits.astype(jnp.float32).reshape(-1), loc_t.reshape(-1),
        gamma=cfg.loss_loc_gamma, alpha=cfg.loss_loc_alpha,
        reduction="none")
    loss_loc = (fl * loc_w.reshape(-1)).sum() / jnp.maximum(
        jnp.sum(loc_avg), 1.0)

    ba, bg, bw = jax.vmap(
        lambda gb, gm: ga_shape_targets(cfg, approxs, squares, gb, gm)
    )(gt_bboxes, gt_mask)
    pred_anchors = jax.vmap(
        lambda sp: guided_anchors(cfg, squares, sp)
    )(shape_preds.astype(jnp.float32))
    n_pos_s = jnp.maximum(jnp.sum(bw), 1.0)
    elem = bounded_iou_loss(
        pred_anchors.reshape(-1, 4),
        jnp.where(bw.reshape(-1, 1) > 0, bg.reshape(-1, 4), 1.0))
    loss_shape = (elem * bw.reshape(-1, 1)).sum() / n_pos_s

    g_anchors = jax.lax.stop_gradient(pred_anchors)

    def targets(anc, gb, gl, gm):
        assign = max_iou_assign(
            anc, jnp.ones((a,), bool), gb, gm, gl,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, match_low_quality=True)
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0
        safe = jnp.clip(assign.gt_inds - 1, 0, gb.shape[0] - 1)
        enc = box_ops.bbox2delta(anc, box_ops.take_small_table(gb, safe), (0.0,) * 4,
                                 cfg.bbox_coder_stds, eps=1e-6)
        labels = jnp.where(pos, assign.labels, num_classes)
        return pos, (pos | neg).astype(jnp.float32), labels, \
            jnp.where(pos[:, None], enc, 0.0)

    pos, lw, labels, bt = jax.vmap(targets)(g_anchors, gt_bboxes,
                                            gt_labels, gt_mask)
    num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
    if axis_name is not None:
        num_pos = jnp.maximum(
            jax.lax.pmean(jnp.sum(pos.astype(jnp.float32)), axis_name), 1.0)
    onehot = jax.nn.one_hot(labels, c)
    fl2 = L.sigmoid_focal_loss(
        cls_logits.astype(jnp.float32).reshape(-1, c),
        onehot.reshape(-1, c), gamma=2.0, alpha=0.25, reduction="none")
    loss_cls = (fl2.sum(-1) * lw.reshape(-1)).sum() / num_pos
    diff = jnp.abs(bbox_preds.astype(jnp.float32) - bt)
    sm = jnp.where(diff < smooth_l1_beta,
                   0.5 * diff * diff / smooth_l1_beta,
                   diff - 0.5 * smooth_l1_beta)
    loss_bbox = (sm * pos[..., None].astype(jnp.float32)).sum() / num_pos
    return {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "loss_anchor_loc": cfg.loc_loss_weight * loss_loc,
        "loss_anchor_shape": cfg.shape_loss_weight * loss_shape,
    }


def ga_retina_get_bboxes(cfg: GACfg, cls_logits, bbox_preds, shape_preds,
                         loc_logits, squares, img_shape, scale_factor,
                         rescale=True, score_thr=0.05, nms_iou_thr=0.5,
                         max_per_img=100):
    """Single-image decode: guided anchors + loc filter + multiclass NMS."""
    from ...ops.nms import multiclass_nms_padded

    anchors = guided_anchors(cfg, squares, shape_preds.astype(jnp.float32))
    keep = jax.nn.sigmoid(loc_logits.astype(jnp.float32)) \
        >= cfg.loc_filter_thr
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    scores = scores * keep[:, None]
    boxes = box_ops.delta2bbox(
        anchors, bbox_preds.astype(jnp.float32), (0.0,) * 4,
        cfg.bbox_coder_stds, max_shape=img_shape)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img)
