"""SOLO: Segmenting Objects by Locations (reference
``mmdet/models/detectors/solo.py`` + ``dense_heads/solo_head.py:16``).

Grid-cell instance segmentation: each FPN level predicts an S_l x S_l
category grid and S_l^2 mask channels (coord-conv conditioned).  Targets
assign each gt to a level by sqrt-area range and to the grid cells covered
by the ``pos_scale``-shrunk center region; the cell's mask channel learns
the instance mask (Dice loss), categories use focal loss.  Inference
thresholds category scores, gathers the cells' mask channels and soft-
suppresses with matrix NMS.

TPU design: the reference's per-gt python loops become vectorised
last-writer-wins coverage assignment over the padded gt axis; positive
cells are gathered to a fixed ``max_pos`` cap per (image, level); masks
stay at each level's prediction resolution for the loss and are resized to
the common 1/4 canvas only for the (capped) selected cells at test time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ...ops.matrix_nms import mask_matrix_nms
from ..layers import ConvModule


def coord_features(h: int, w: int, dtype=jnp.float32):
    """CoordConv features in [-1, 1] (reference ``generate_coordinate``)."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    return jnp.stack([xx, yy], axis=-1)  # (H, W, 2)


class SOLOHeadConvs(nn.Module):
    """Mask + category towers (reference ``SOLOHead._init_layers``)."""

    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    num_grids: Tuple[int, ...] = (40, 36, 24, 16, 12)
    cls_down_index: int = 0
    norm_groups: int = 32
    # DecoupledSOLOHead (reference ``decoupled_solo_head.py``): separate
    # x/y mask towers emit S channels each; instance (i, j)'s mask is
    # sigmoid(mx[..., j]) * sigmoid(my[..., i]).  The product is folded
    # back into S^2 logits so the coupled loss/decode path is shared.
    decoupled: bool = False
    # DecoupledSOLOLightHead (reference ``solo_head.py:1043``): ONE shared
    # mask tower (first conv sees both coords) feeding separate per-level
    # 3x3 x/y output convs — the light variant saves a full conv tower.
    decoupled_light: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: 5 x (B, H_l, W_l, C) FPN maps.  Returns per-level
        (mask_pred (B, 2*H_l, 2*W_l, S_l^2), cls_pred (B, S_l, S_l, C))."""
        nl = len(feats)
        # resize: first level 0.5x, last level to second-last's size
        resized = list(feats)
        b, h0, w0, _ = feats[0].shape
        resized[0] = jax.image.resize(
            feats[0], (b, h0 // 2, w0 // 2, feats[0].shape[-1]), "bilinear"
        )
        tgt = feats[nl - 2].shape
        resized[nl - 1] = jax.image.resize(
            feats[nl - 1], (b, tgt[1], tgt[2], feats[nl - 1].shape[-1]),
            "bilinear",
        )

        def tower(prefix):
            return [
                ConvModule(
                    self.feat_channels, 3,
                    norm_cfg={"type": "GN", "num_groups": self.norm_groups},
                    act="relu", dtype=self.dtype, name=f"{prefix}_{i}",
                )
                for i in range(self.stacked_convs)
            ]

        if self.decoupled and not self.decoupled_light:
            mask_convs_x = tower("mask_conv_x")
            mask_convs_y = tower("mask_conv_y")
        else:
            mask_convs = tower("mask_conv")
        cls_convs = [
            ConvModule(
                self.feat_channels, 3,
                norm_cfg={"type": "GN", "num_groups": self.norm_groups},
                act="relu", dtype=self.dtype, name=f"cls_conv_{i}",
            )
            for i in range(self.stacked_convs)
        ]
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="conv_cls",
        )

        mask_out, cls_out = [], []
        for lvl, x in enumerate(resized):
            bb, hh, ww, _ = x.shape
            coords = jnp.broadcast_to(
                coord_features(hh, ww, x.dtype)[None], (bb, hh, ww, 2)
            )
            s = self.num_grids[lvl]
            if self.decoupled:
                up = (bb, hh * 2, ww * 2, self.feat_channels)
                if self.decoupled_light:
                    # light: one shared tower over [x, both coords]; the
                    # x/y split happens only at the per-level output convs
                    m = jnp.concatenate([x, coords], axis=-1)
                    for conv in mask_convs:
                        m = conv(m)
                    mx = my = jax.image.resize(m, up, "bilinear")
                else:
                    # x branch sees the x coord, y branch the y coord
                    mx = jnp.concatenate([x, coords[..., 0:1]], axis=-1)
                    my = jnp.concatenate([x, coords[..., 1:2]], axis=-1)
                    for cx_, cy_ in zip(mask_convs_x, mask_convs_y):
                        mx = cx_(mx)
                        my = cy_(my)
                    mx = jax.image.resize(mx, up, "bilinear")
                    my = jax.image.resize(my, up, "bilinear")
                lx = nn.Conv(
                    s, (3, 3), padding=[(1, 1), (1, 1)],
                    bias_init=nn.initializers.constant(-4.595),
                    dtype=self.dtype, name=f"conv_mask_x_{lvl}",
                )(mx).astype(jnp.float32)
                ly = nn.Conv(
                    s, (3, 3), padding=[(1, 1), (1, 1)],
                    bias_init=nn.initializers.constant(-4.595),
                    dtype=self.dtype, name=f"conv_mask_y_{lvl}",
                )(my).astype(jnp.float32)
                # grid cell (i, j) -> channel i*s + j: p = sig(y_i)*sig(x_j),
                # folded back to a logit for the shared loss/decode path
                p = (jax.nn.sigmoid(ly)[..., :, None]
                     * jax.nn.sigmoid(lx)[..., None, :])
                p = p.reshape(bb, hh * 2, ww * 2, s * s)
                p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
                mask_pred = jnp.log(p) - jnp.log1p(-p)
            else:
                m = jnp.concatenate([x, coords], axis=-1)
                for conv in mask_convs:
                    m = conv(m)
                m = jax.image.resize(
                    m, (bb, hh * 2, ww * 2, m.shape[-1]), "bilinear"
                )
                mask_pred = nn.Conv(
                    s * s, (1, 1),
                    bias_init=nn.initializers.constant(-4.595),
                    dtype=self.dtype, name=f"conv_mask_{lvl}",
                )(m).astype(jnp.float32)

            c = x
            for j, conv in enumerate(cls_convs):
                if j == self.cls_down_index:
                    c = jax.image.resize(
                        c, (bb, s, s, c.shape[-1]), "bilinear"
                    )
                c = conv(c)
            cls_pred = conv_cls(c).astype(jnp.float32)
            mask_out.append(mask_pred)
            cls_out.append(cls_pred)
        return mask_out, cls_out


@dataclasses.dataclass(frozen=True)
class SOLOCfg:
    num_classes: int = 80
    num_grids: Tuple[int, ...] = (40, 36, 24, 16, 12)
    strides: Tuple[int, ...] = (8, 8, 16, 32, 32)
    scale_ranges: Tuple[Tuple[int, int], ...] = (
        (1, 96), (48, 192), (96, 384), (192, 768), (384, 2048),
    )
    pos_scale: float = 0.2
    max_pos: int = 64  # fixed cap on positive cells per (image, level)
    dice_loss_weight: float = 3.0
    cls_gamma: float = 2.0
    cls_alpha: float = 0.25
    # test cfg
    score_thr: float = 0.1
    mask_thr: float = 0.5
    pre_nms_per_level: int = 100
    max_per_img: int = 100
    nms_sigma: float = 2.0
    filter_thr: float = 0.05


def _crop_to_grid(crop, gt_box, gh, gw, stride_y, stride_x):
    """Rasterise a box-relative gt mask crop onto a (gh, gw) feature grid
    whose pixel (i, j) has image-space center ((j+.5)*sx, (i+.5)*sy)."""
    from ...ops.point_sample import point_sample

    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * stride_y
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * stride_x
    gwd = jnp.maximum(gt_box[2] - gt_box[0], 1e-3)
    ghd = jnp.maximum(gt_box[3] - gt_box[1], 1e-3)
    nx = (xs - gt_box[0]) / gwd
    ny = (ys - gt_box[1]) / ghd
    pts = jnp.stack(
        [jnp.tile(nx, gh), jnp.repeat(ny, gw)], axis=-1
    )  # (gh*gw, 2)
    inside = (
        (pts[:, 0] >= 0) & (pts[:, 0] <= 1) & (pts[:, 1] >= 0)
        & (pts[:, 1] <= 1)
    )
    vals = point_sample(crop.astype(jnp.float32)[..., None], pts)[..., 0]
    return ((vals >= 0.5) & inside).astype(jnp.float32).reshape(gh, gw)


def solo_targets_level(
    cfg: SOLOCfg,
    lvl: int,
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,)
    gt_mask: jnp.ndarray,  # (G,)
    gt_crops: jnp.ndarray,  # (G, S, S) box-relative mask crops
    feat_hw: Tuple[int, int],  # mask-pred resolution of this level
    canvas_hw: Tuple[int, int],
):
    """One image, one level.  Returns (labels (S, S), cell_gt (S*S) int,
    pos (S*S) bool, gt_masks_feat (G, fh, fw))."""
    s = cfg.num_grids[lvl]
    lo, hi = cfg.scale_ranges[lvl]
    g = gt_bboxes.shape[0]
    fh, fw = feat_hw
    ch, cw = canvas_hw

    w = gt_bboxes[:, 2] - gt_bboxes[:, 0]
    h = gt_bboxes[:, 3] - gt_bboxes[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 0.0))
    crop_area = jnp.sum(gt_crops.astype(jnp.float32), axis=(1, 2))
    include = gt_mask & (scale >= lo) & (scale <= hi) & (crop_area > 0)

    # center of mass of each gt mask, in image coords (from the crop)
    s_crop = gt_crops.shape[-1]
    ii = (jnp.arange(s_crop, dtype=jnp.float32) + 0.5) / s_crop
    cm = gt_crops.astype(jnp.float32)
    tot = jnp.maximum(jnp.sum(cm, axis=(1, 2)), 1e-6)
    com_y = jnp.sum(cm * ii[None, :, None], axis=(1, 2)) / tot
    com_x = jnp.sum(cm * ii[None, None, :], axis=(1, 2)) / tot
    cy = gt_bboxes[:, 1] + com_y * h
    cx = gt_bboxes[:, 0] + com_x * w

    coord_w = jnp.floor(cx / cw * s).astype(jnp.int32)
    coord_h = jnp.floor(cy / ch * s).astype(jnp.int32)
    half_h = 0.5 * h * cfg.pos_scale
    half_w = 0.5 * w * cfg.pos_scale
    top = jnp.maximum(
        jnp.floor((cy - half_h) / ch * s).astype(jnp.int32), 0
    )
    down = jnp.minimum(
        jnp.floor((cy + half_h) / ch * s).astype(jnp.int32), s - 1
    )
    left = jnp.maximum(
        jnp.floor((cx - half_w) / cw * s).astype(jnp.int32), 0
    )
    right = jnp.minimum(
        jnp.floor((cx + half_w) / cw * s).astype(jnp.int32), s - 1
    )
    # at most +-1 cell around the center cell (reference clamp)
    top = jnp.maximum(top, coord_h - 1)
    down = jnp.minimum(down, coord_h + 1)
    left = jnp.maximum(left, coord_w - 1)
    right = jnp.minimum(right, coord_w + 1)

    gi = jnp.arange(s)
    cover = (
        include[:, None, None]
        & (gi[None, :, None] >= top[:, None, None])
        & (gi[None, :, None] <= down[:, None, None])
        & (gi[None, None, :] >= left[:, None, None])
        & (gi[None, None, :] <= right[:, None, None])
    )  # (G, S, S)
    # last-writer-wins like the reference's per-gt loop
    rev = cover[::-1]
    any_cover = jnp.any(cover, axis=0)
    assigned_rev = jnp.argmax(rev, axis=0)
    assigned = (g - 1) - assigned_rev
    labels = jnp.where(
        any_cover, gt_labels[assigned], cfg.num_classes
    ).astype(jnp.int32)
    out_sy = ch / fh
    out_sx = cw / fw
    gt_masks_feat = jax.vmap(
        lambda crop, box: _crop_to_grid(crop, box, fh, fw, out_sy, out_sx)
    )(gt_crops, gt_bboxes)
    return labels, assigned.reshape(-1), any_cover.reshape(-1), gt_masks_feat


def dice_loss(pred_logits, target, eps: float = 1e-3):
    """Dice loss on sigmoid(pred) (reference ``dice_loss.py``)."""
    p = jax.nn.sigmoid(pred_logits)
    num = 2.0 * jnp.sum(p * target, axis=(-2, -1))
    den = jnp.sum(p * p, axis=(-2, -1)) + jnp.sum(
        target * target, axis=(-2, -1)
    )
    return 1.0 - (num + eps) / (den + eps)


def solo_loss(
    cfg: SOLOCfg,
    mask_preds: Sequence[jnp.ndarray],  # L x (B, fh, fw, S^2)
    cls_preds: Sequence[jnp.ndarray],  # L x (B, S, S, C)
    gt_bboxes, gt_labels, gt_mask, gt_crops,  # batched gt tensors
    canvas_hw: Tuple[int, int],
    axis_name: Optional[str] = None,
):
    b = gt_bboxes.shape[0]
    total_pos = 0.0
    mask_loss_sum = 0.0
    cls_elems = []
    label_elems = []
    for lvl, (mp, cp) in enumerate(zip(mask_preds, cls_preds)):
        fh, fw = mp.shape[1], mp.shape[2]
        s = cfg.num_grids[lvl]
        labels, cell_gt, pos, gt_feat = jax.vmap(
            lambda bb_, ll_, mm_, cc_: solo_targets_level(
                cfg, lvl, bb_, ll_, mm_, cc_, (fh, fw), canvas_hw
            )
        )(gt_bboxes, gt_labels, gt_mask, gt_crops)
        # fixed-cap positive gather
        k = min(cfg.max_pos, s * s)
        _, idx = jax.lax.top_k(pos.astype(jnp.float32), k)  # (B, k)
        sel_valid = jnp.take_along_axis(pos, idx, axis=1)
        sel_gt = jnp.take_along_axis(cell_gt, idx, axis=1)
        mp_cells = mp.reshape(b, fh * fw, s * s).transpose(0, 2, 1)
        sel_pred = jnp.take_along_axis(
            mp_cells, idx[..., None], axis=1
        ).reshape(b, k, fh, fw)
        sel_tgt = jnp.take_along_axis(
            gt_feat, sel_gt[..., None, None], axis=1
        ).reshape(b, k, fh, fw)
        d = dice_loss(sel_pred, sel_tgt) * sel_valid.astype(jnp.float32)
        mask_loss_sum = mask_loss_sum + jnp.sum(d)
        total_pos = total_pos + jnp.sum(pos.astype(jnp.float32))
        cls_elems.append(cp.reshape(-1, cfg.num_classes))
        label_elems.append(labels.reshape(-1))

    if axis_name is not None:
        total_pos = jax.lax.pmean(total_pos, axis_name)
    flat_cls = jnp.concatenate(cls_elems, axis=0)
    flat_lab = jnp.concatenate(label_elems, axis=0)
    onehot = L.one_hot_targets(flat_lab, cfg.num_classes)
    loss_cls = L.sigmoid_focal_loss(
        flat_cls, onehot, gamma=cfg.cls_gamma, alpha=cfg.cls_alpha,
        reduction="mean", avg_factor=total_pos + 1.0,
    )
    loss_mask = (
        cfg.dice_loss_weight * mask_loss_sum / jnp.maximum(total_pos, 1.0)
    )
    return {"loss_cls": loss_cls, "loss_mask": loss_mask}


def solo_decode_single(
    cfg: SOLOCfg,
    mask_preds: Sequence[jnp.ndarray],  # L x (fh_l, fw_l, S_l^2) one image
    cls_preds: Sequence[jnp.ndarray],  # L x (S_l, S_l, C)
    out_hw: Tuple[int, int],  # common 1/4-canvas resolution
):
    """Single-image decode (reference ``_get_results_single`` with a fixed
    per-level pre-NMS cap): returns (scores (K,), labels (K,), masks
    (K, oh, ow) binary, valid (K,))."""
    oh, ow = out_hw
    sel_scores, sel_labels, sel_masks, sel_valid = [], [], [], []
    for lvl, (mp, cp) in enumerate(zip(mask_preds, cls_preds)):
        s = cfg.num_grids[lvl]
        c = cp.shape[-1]
        prob = jax.nn.sigmoid(cp)
        # point local-max keep (reference maxpool(2, s1, p1) trick)
        pad = jnp.pad(prob, ((1, 0), (1, 0), (0, 0)), constant_values=-1.0)
        lm = jax.lax.reduce_window(
            pad, -jnp.inf, jax.lax.max, (2, 2, 1), (1, 1, 1), "VALID"
        )
        prob = jnp.where(lm == prob, prob, 0.0)
        flat = prob.reshape(-1)  # (S*S*C,)
        k = min(cfg.pre_nms_per_level, flat.shape[0])
        sc, idx = jax.lax.top_k(flat, k)
        cell = idx // c
        lab = idx % c
        ok = sc > cfg.score_thr
        mp_cells = mp.reshape(-1, s * s).T  # (S^2, fh*fw)
        m = mp_cells[cell].reshape(k, mp.shape[0], mp.shape[1])
        m = jax.nn.sigmoid(m)
        m = jax.image.resize(m, (k, oh, ow), "bilinear")
        binary = m > cfg.mask_thr
        area = jnp.sum(binary.astype(jnp.float32), axis=(1, 2))
        ok = ok & (area > cfg.strides[lvl])
        mask_score = jnp.sum(
            m * binary.astype(m.dtype), axis=(1, 2)
        ) / jnp.maximum(area, 1e-6)
        sel_scores.append(jnp.where(ok, sc * mask_score, 0.0))
        sel_labels.append(lab)
        sel_masks.append(binary)
        sel_valid.append(ok)
    scores = jnp.concatenate(sel_scores)
    labels = jnp.concatenate(sel_labels)
    masks = jnp.concatenate(sel_masks, axis=0)
    valid = jnp.concatenate(sel_valid)
    sc2, lab2, m2, v2, _ = mask_matrix_nms(
        masks, labels, scores, valid,
        kernel="gaussian", sigma=cfg.nms_sigma,
        filter_thr=cfg.filter_thr, max_num=cfg.max_per_img,
    )
    sc2 = jnp.where(v2, sc2, 0.0)
    return sc2, lab2, m2, v2
