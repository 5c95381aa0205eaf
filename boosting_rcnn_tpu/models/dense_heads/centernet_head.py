"""CenterNet head (spec: reference ``mmdet/models/dense_heads/
centernet_head.py`` + ``mmdet/models/necks/ct_resnet_neck.py``): 3 deconv
upsampling stages to stride 4, then heatmap / wh / offset branches; gaussian
focal heatmap loss, L1 on wh and sub-pixel offset at object centers; decode
by 3x3 local-maximum suppression + top-k (NMS-free)."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ...ops.gaussian_target import gaussian2d, gaussian_radius


class CTResNetNeck(nn.Module):
    """Deconv upsampling neck (reference ``CTResNetNeck``: 3x3 ConvModule
    with BN + 4x4 deconv with BN per level; CenterNet trains from scratch,
    so the BN is live — stats update when the train step applies with
    ``mutable=['batch_stats']``)."""

    channels: Tuple[int, ...] = (256, 128, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ..layers import LiveBatchNorm

        x = feats[-1]  # C5
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = LiveBatchNorm(dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype,
                                 name=f"deconv{i}")(x)
            x = LiveBatchNorm(dtype=self.dtype, name=f"deconv_bn{i}")(x)
            x = nn.relu(x)
        return (x,)


class CenterNetConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[0]

        def branch(out_ch, name, bias=0.0):
            y = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"{name}_conv")(x)
            y = nn.relu(y)
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(bias),
                           name=f"{name}_out")(y)

        heat = branch(self.num_classes, "heatmap", bias=-4.595)
        wh = branch(2, "wh")
        offset = branch(2, "offset")
        return heat.astype(jnp.float32), wh.astype(jnp.float32), offset.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class CenterNetCfg:
    num_classes: int = 80
    stride: int = 4
    loss_heatmap_weight: float = 1.0
    loss_wh_weight: float = 0.1
    loss_offset_weight: float = 1.0


def centernet_targets(cfg, feat_hw, gt_bboxes, gt_labels, gt_mask):
    """Single image: (heatmap (H, W, C), wh/offset targets packed per gt)."""
    h, w = feat_hw
    s = float(cfg.stride)
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2 / s
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2 / s
    bw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) / s
    bh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) / s
    ix = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
    radius = jax.vmap(lambda hh, ww: gaussian_radius((hh, ww), 0.3))(bh, bw)
    # reference clamps to int >= 0 and a 0-radius gt still stamps its center
    # pixel; radius 0.5 gives sigma 1/3 -> center exactly 1, neighbours ~0.011
    radius = jnp.maximum(jnp.floor(radius), 0.5)
    ok = gt_mask & (bw > 0) & (bh > 0)

    sigma = (2 * radius + 1) / 6.0
    bumps = jax.vmap(
        lambda s, jx, jy: gaussian2d((h, w), s, s, jx, jy)
    )(sigma, ix.astype(jnp.float32), iy.astype(jnp.float32))  # (G, H, W)
    bumps = jnp.where(ok[:, None, None], bumps, 0.0)
    labels = jnp.clip(gt_labels, 0, cfg.num_classes - 1)
    heat = jnp.zeros((cfg.num_classes, h, w)).at[labels].max(bumps)
    heat = heat.transpose(1, 2, 0)
    return heat, (ix, iy, bw, bh, cx - ix, cy - iy)


def centernet_loss(cfg, heat_logits, wh_pred, off_pred,
                   gt_bboxes, gt_labels, gt_mask, axis_name=None):
    """heat (B, H, W, C); wh/off (B, H, W, 2)."""
    b, h, w, c = heat_logits.shape

    heat_t, packs = jax.vmap(
        lambda gb, gl, gm: centernet_targets(cfg, (h, w), gb, gl, gm)
    )(gt_bboxes, gt_labels, gt_mask)
    ix, iy, bw, bh, ox, oy = packs

    num_pos = jnp.maximum(jnp.sum(gt_mask.astype(jnp.float32)), 1.0)
    if axis_name is not None:
        num_pos = jnp.maximum(
            jax.lax.pmean(jnp.sum(gt_mask.astype(jnp.float32)), axis_name), 1.0
        )
    pred = jax.nn.sigmoid(heat_logits)
    loss_heat = L.gaussian_focal_loss(pred, heat_t, avg_factor=num_pos)

    # gather wh/offset predictions at gt centers
    def gather(pred_map, jx, jy):
        return pred_map[jy, jx]  # (G, 2)

    wh_at = jax.vmap(gather)(wh_pred, ix, iy)
    off_at = jax.vmap(gather)(off_pred, ix, iy)
    mw = gt_mask.astype(jnp.float32)[..., None]
    wh_t = jnp.stack([bw, bh], -1)
    off_t = jnp.stack([ox, oy], -1)
    loss_wh = L.l1_loss(wh_at, wh_t, weight=mw, avg_factor=num_pos * 2)
    loss_off = L.l1_loss(off_at, off_t, weight=mw, avg_factor=num_pos * 2)
    return {
        "loss_center_heatmap": loss_heat * cfg.loss_heatmap_weight,
        "loss_wh": loss_wh * cfg.loss_wh_weight,
        "loss_offset": loss_off * cfg.loss_offset_weight,
    }


def centernet_decode(cfg, heat_logits, wh_pred, off_pred, img_shape,
                     scale_factor, rescale=True, topk=100):
    """Single image: local-max + top-k decode (reference get_bboxes)."""
    h, w, c = heat_logits.shape
    heat = jax.nn.sigmoid(heat_logits)
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1),
        [(1, 1), (1, 1), (0, 0)],
    )
    heat = jnp.where(hmax == heat, heat, 0.0)
    flat = heat.reshape(-1)
    scores, idx = jax.lax.top_k(flat, topk)
    cls = (idx % c).astype(jnp.int32)
    pix = idx // c
    py = (pix // w).astype(jnp.float32)
    px = (pix % w).astype(jnp.float32)
    wh = wh_pred.reshape(-1, 2)[pix]
    off = off_pred.reshape(-1, 2)[pix]
    cx = (px + off[:, 0]) * cfg.stride
    cy = (py + off[:, 1]) * cfg.stride
    bw = wh[:, 0] * cfg.stride
    bh = wh[:, 1] * cfg.stride
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    from ...ops.box_ops import clip_boxes

    boxes = clip_boxes(boxes, img_shape)
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    dets = jnp.concatenate([boxes, scores[:, None]], -1)
    return dets, cls, scores > 0.0
