"""CentripetalNet head (reference
``mmdet/models/dense_heads/centripetal_head.py``).

CornerNet with the associative embedding replaced by geometry: each corner
predicts a *guiding shift* (raw feature-pixel vector toward the box
center, supervised with SmoothL1 x0.05) that also drives a deform-conv
feature adaption, and a *centripetal shift* (log-scale distance to the
center, SmoothL1 x1) used at decode time — a tl/br pair is kept only when
both corners' shifted centers land inside the central region of the
candidate box (``decode_heatmap`` with_centripetal_shift branch).  All
corner machinery (pools, gaussian targets, offsets, top-k matching) is
shared with ``corner_head.py``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_conv import deform_conv2d
from ...ops import losses as L
from .corner_head import (
    CornerCfg,
    CornerPoolBranch,
    _ConvBN,
    _local_max,
    corner_targets,
)


@dataclasses.dataclass(frozen=True)
class CentripetalCfg(CornerCfg):
    guiding_weight: float = 0.05
    centripetal_weight: float = 1.0
    centre_region_ratio: float = 0.5  # central-region half-extent factor


class CentripetalConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        outs = []
        for si, x in enumerate(feats):
            out = {}
            for corner in ("tl", "br"):
                f = CornerPoolBranch(
                    self.feat_channels, corner, dtype=self.dtype,
                    name=f"s{si}_{corner}_pool")(x)

                def head(src, ch, name, bias=0.0):
                    y = _ConvBN(self.feat_channels, dtype=self.dtype,
                                name=f"{name}_feat")(src)
                    return nn.Conv(
                        ch, (1, 1),
                        bias_init=nn.initializers.constant(bias),
                        dtype=self.dtype, name=f"{name}_out",
                    )(y).astype(jnp.float32)

                out[f"{corner}_heat"] = head(
                    f, self.num_classes, f"s{si}_{corner}_heat", -4.595)
                out[f"{corner}_off"] = head(f, 2, f"s{si}_{corner}_off")
                guiding = head(f, 2, f"s{si}_{corner}_guiding")
                out[f"{corner}_guiding"] = guiding
                dcn_off = nn.Conv(
                    18, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"s{si}_{corner}_dcn_off",
                )(jax.lax.stop_gradient(guiding).astype(self.dtype))
                w = self.param(f"s{si}_{corner}_adapt",
                               nn.initializers.he_normal(),
                               (3, 3, self.feat_channels,
                                self.feat_channels))
                adapted = nn.relu(deform_conv2d(
                    f, dcn_off, w.astype(f.dtype)))
                out[f"{corner}_centripetal"] = head(
                    adapted, 2, f"s{si}_{corner}_centripetal")
            outs.append(out)
        return outs


def centripetal_targets(cfg, gt_bboxes, gt_labels, gt_mask, feat_hw):
    """Corner targets + guiding (raw) / centripetal (log) shift targets at
    the integer corner cells (reference ``corner_head.get_targets``
    with_guiding_shift/with_centripetal_shift branches)."""
    tl_heat, br_heat, (itly, itlx), (ibry, ibrx), tl_off, br_off = \
        corner_targets(cfg, gt_bboxes, gt_labels, gt_mask, feat_hw)
    s = float(cfg.stride)
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0 / s
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0 / s
    tl_guide = jnp.stack([cx - itlx, cy - itly], -1)  # (G, 2)
    br_guide = jnp.stack([ibrx - cx, ibry - cy], -1)
    eps = 1e-4
    tl_centr = jnp.log(jnp.maximum(tl_guide, eps))
    br_centr = jnp.log(jnp.maximum(br_guide, eps))
    return (tl_heat, br_heat, (itly, itlx), (ibry, ibrx), tl_off, br_off,
            tl_guide, br_guide, tl_centr, br_centr)


def centripetal_loss_single(cfg, out, gt_bboxes, gt_labels, gt_mask):
    """One image, one stack."""
    fh, fw = out["tl_heat"].shape[:2]
    (tl_heat_t, br_heat_t, tl_ij, br_ij, tl_off_t, br_off_t,
     tl_g_t, br_g_t, tl_c_t, br_c_t) = centripetal_targets(
        cfg, gt_bboxes, gt_labels, gt_mask, (fh, fw))
    gmf = gt_mask.astype(jnp.float32)
    n_pos = jnp.maximum(gmf.sum(), 1.0)

    npos_tl = jnp.maximum(jnp.sum((tl_heat_t == 1.0).astype(jnp.float32)),
                          1.0)
    npos_br = jnp.maximum(jnp.sum((br_heat_t == 1.0).astype(jnp.float32)),
                          1.0)
    loss_heat = (
        L.gaussian_focal_loss(jax.nn.sigmoid(out["tl_heat"]), tl_heat_t,
                              reduction="mean", avg_factor=npos_tl)
        + L.gaussian_focal_loss(jax.nn.sigmoid(out["br_heat"]), br_heat_t,
                                reduction="mean", avg_factor=npos_br)
    ) / 2.0

    def at(field, ij):
        iy, ix = ij
        return field[iy, ix]  # (G, ch)

    def sl1(pred, tgt, beta=1.0):
        d = jnp.abs(pred - tgt)
        e = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        return (e.sum(-1) * gmf).sum() / (2.0 * n_pos)

    loss_off = (sl1(at(out["tl_off"], tl_ij), tl_off_t)
                + sl1(at(out["br_off"], br_ij), br_off_t)) / 2.0
    loss_guide = (sl1(at(out["tl_guiding"], tl_ij), tl_g_t)
                  + sl1(at(out["br_guiding"], br_ij), br_g_t)) / 2.0
    loss_centr = (sl1(at(out["tl_centripetal"], tl_ij), tl_c_t)
                  + sl1(at(out["br_centripetal"], br_ij), br_c_t)) / 2.0
    return {
        "loss_heatmap": loss_heat,
        "loss_offset": cfg.offset_weight * loss_off,
        "loss_guiding_shift": cfg.guiding_weight * loss_guide,
        "loss_centripetal_shift": cfg.centripetal_weight * loss_centr,
    }


def centripetal_decode_single(cfg, out, img_shape, scale_factor,
                              rescale: bool):
    """Pair corners by centripetal geometry: both predicted centers must
    lie in the central region of the candidate box."""
    fh, fw = out["tl_heat"].shape[:2]
    k = cfg.corner_topk
    s = float(cfg.stride)

    def corners(heat, off, centr):
        h = _local_max(jax.nn.sigmoid(heat))
        flat = h.reshape(-1)
        sc, idx = jax.lax.top_k(flat, k)
        cell = idx // cfg.num_classes
        cls = idx % cfg.num_classes
        cy = (cell // fw).astype(jnp.float32)
        cx = (cell % fw).astype(jnp.float32)
        o = off.reshape(-1, 2)[cell]
        ce = centr.reshape(-1, 2)[cell]
        x = (cx + o[:, 0]) * s
        y = (cy + o[:, 1]) * s
        return sc, cls, x, y, jnp.exp(ce) * s  # shift in image px

    tl_s, tl_c, tl_x, tl_y, tl_sh = corners(
        out["tl_heat"], out["tl_off"], out["tl_centripetal"])
    br_s, br_c, br_x, br_y, br_sh = corners(
        out["br_heat"], out["br_off"], out["br_centripetal"])
    tl_ctx = tl_x + tl_sh[:, 0]
    tl_cty = tl_y + tl_sh[:, 1]
    br_ctx = br_x - br_sh[:, 0]
    br_cty = br_y - br_sh[:, 1]

    score = (tl_s[:, None] + br_s[None, :]) / 2.0
    same = tl_c[:, None] == br_c[None, :]
    geom = (tl_x[:, None] < br_x[None, :]) & (tl_y[:, None] < br_y[None, :])
    # central region of the candidate box
    bw = br_x[None, :] - tl_x[:, None]
    bh = br_y[None, :] - tl_y[:, None]
    ctx1 = tl_x[:, None] + bw * (1 - cfg.centre_region_ratio) / 2
    ctx2 = br_x[None, :] - bw * (1 - cfg.centre_region_ratio) / 2
    cty1 = tl_y[:, None] + bh * (1 - cfg.centre_region_ratio) / 2
    cty2 = br_y[None, :] - bh * (1 - cfg.centre_region_ratio) / 2
    tl_in = ((tl_ctx[:, None] >= ctx1) & (tl_ctx[:, None] <= ctx2)
             & (tl_cty[:, None] >= cty1) & (tl_cty[:, None] <= cty2))
    br_in = ((br_ctx[None, :] >= ctx1) & (br_ctx[None, :] <= ctx2)
             & (br_cty[None, :] >= cty1) & (br_cty[None, :] <= cty2))
    valid = same & geom & tl_in & br_in
    score = jnp.where(valid, score, 0.0)
    flat = score.reshape(-1)
    topv, topi = jax.lax.top_k(flat, cfg.max_per_img)
    ti = topi // k
    bi = topi % k
    boxes = jnp.stack([tl_x[ti], tl_y[ti], br_x[bi], br_y[bi]], -1)
    from ...ops.box_ops import clip_boxes

    boxes = clip_boxes(boxes, img_shape)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    keep = topv > cfg.score_thr
    dets = jnp.concatenate([boxes, topv[:, None]], -1)
    return dets, tl_c[ti].astype(jnp.int32), keep
