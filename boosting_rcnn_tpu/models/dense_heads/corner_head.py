"""CornerNet head (reference ``mmdet/models/dense_heads/corner_head.py`` +
``mmdet/models/detectors/cornernet.py`` + ``losses/ae_loss.py``).

Detects objects as (top-left, bottom-right) corner pairs on the stride-4
hourglass map: each corner branch fuses directional corner pools, predicts
a per-class gaussian heatmap, a 1-d associative embedding and a sub-pixel
offset.  Training: gaussian-focal heatmap loss, pull/push AE loss (fixed-
shape masked formulation of ``ae_loss_per_image``), L1 offsets.  Decode:
3x3 local-max corners, top-k per map, all-pairs matching by class +
geometry + embedding distance."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L
from ...ops.corner_pool import bottom_pool, left_pool, right_pool, top_pool
from ...ops.gaussian_target import gaussian2d, gaussian_radius
from ..layers import LiveBatchNorm


class _ConvBN(nn.Module):
    ch: int
    k: int = 3
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) // 2
        x = nn.Conv(self.ch, (self.k, self.k), padding=[(pad, pad)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = LiveBatchNorm(dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class CornerPoolBranch(nn.Module):
    """Reference ``BiCornerPool``: two directional pools fused + residual."""

    ch: int
    corner: str  # 'tl' | 'br'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p1 = _ConvBN(128, dtype=self.dtype, name="p1_conv")(x)
        p2 = _ConvBN(128, dtype=self.dtype, name="p2_conv")(x)
        if self.corner == "tl":
            pooled = top_pool(p1) + left_pool(p2)
        else:
            pooled = bottom_pool(p1) + right_pool(p2)
        y = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="p_conv")(pooled)
        y = LiveBatchNorm(dtype=self.dtype, name="p_bn")(y)
        idt = nn.Conv(self.ch, (1, 1), use_bias=False, dtype=self.dtype,
                      name="idt_conv")(x)
        idt = LiveBatchNorm(dtype=self.dtype, name="idt_bn")(idt)
        y = nn.relu(y + idt)
        return _ConvBN(self.ch, dtype=self.dtype, name="out_conv")(y)


class CornerHeadConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """Per hourglass stack: dict of tl/br heat (B,H,W,C), emb (B,H,W,1),
        off (B,H,W,2)."""
        outs = []
        for si, x in enumerate(feats):
            out = {}
            for corner in ("tl", "br"):
                f = CornerPoolBranch(
                    self.feat_channels, corner, dtype=self.dtype,
                    name=f"s{si}_{corner}_pool",
                )(x)

                def head(ch, name, bias=0.0):
                    y = _ConvBN(self.feat_channels, dtype=self.dtype,
                                name=f"{name}_feat")(f)
                    return nn.Conv(
                        ch, (1, 1),
                        bias_init=nn.initializers.constant(bias),
                        dtype=self.dtype, name=f"{name}_out",
                    )(y).astype(jnp.float32)

                out[f"{corner}_heat"] = head(
                    self.num_classes, f"s{si}_{corner}_heat", bias=-4.595
                )
                out[f"{corner}_emb"] = head(1, f"s{si}_{corner}_emb")
                out[f"{corner}_off"] = head(2, f"s{si}_{corner}_off")
            outs.append(out)
        return outs


@dataclasses.dataclass(frozen=True)
class CornerCfg:
    num_classes: int = 80
    stride: int = 4
    pull_weight: float = 0.1
    push_weight: float = 0.1
    offset_weight: float = 1.0
    # test cfg
    corner_topk: int = 100
    max_per_img: int = 100
    score_thr: float = 0.05
    distance_thr: float = 0.5


def corner_targets(
    cfg: CornerCfg,
    gt_bboxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    feat_hw: Tuple[int, int],
):
    """Per-image corner heatmaps + integer corner coords + offsets."""
    fh, fw = feat_hw
    g = gt_bboxes.shape[0]
    s = float(cfg.stride)
    tlx = gt_bboxes[:, 0] / s
    tly = gt_bboxes[:, 1] / s
    brx = gt_bboxes[:, 2] / s
    bry = gt_bboxes[:, 3] / s
    itlx = jnp.clip(jnp.floor(tlx), 0, fw - 1).astype(jnp.int32)
    itly = jnp.clip(jnp.floor(tly), 0, fh - 1).astype(jnp.int32)
    ibrx = jnp.clip(jnp.floor(brx), 0, fw - 1).astype(jnp.int32)
    ibry = jnp.clip(jnp.floor(bry), 0, fh - 1).astype(jnp.int32)
    w = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) / s
    h = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) / s
    radius = jnp.maximum(gaussian_radius((h, w), min_overlap=0.3), 0.0)

    ys = jnp.arange(fh, dtype=jnp.float32)
    xs = jnp.arange(fw, dtype=jnp.float32)

    def heat_for(cy, cx):
        # (G, fh, fw) gaussian bumps
        d2 = (ys[None, :, None] - cy[:, None, None]) ** 2 + (
            xs[None, None, :] - cx[:, None, None]
        ) ** 2
        sigma = jnp.maximum((2 * radius + 1) / 6.0, 1e-3)
        bump = jnp.exp(-d2 / (2 * sigma[:, None, None] ** 2))
        bump = jnp.where(gt_mask[:, None, None], bump, 0.0)
        onehot = jax.nn.one_hot(gt_labels, cfg.num_classes)  # (G, C)
        return jnp.max(
            bump[:, :, :, None] * onehot[:, None, None, :], axis=0
        )  # (fh, fw, C)

    tl_heat = heat_for(itly.astype(jnp.float32), itlx.astype(jnp.float32))
    br_heat = heat_for(ibry.astype(jnp.float32), ibrx.astype(jnp.float32))
    tl_off = jnp.stack([tlx - itlx, tly - itly], -1)  # (G, 2) x, y
    br_off = jnp.stack([brx - ibrx, bry - ibry], -1)
    return tl_heat, br_heat, (itly, itlx), (ibry, ibrx), tl_off, br_off


def ae_loss(tl_emb_at, br_emb_at, gt_mask):
    """Fixed-shape pull/push (reference ``ae_loss_per_image``)."""
    n = jnp.maximum(jnp.sum(gt_mask.astype(jnp.float32)), 1.0)
    mean = (tl_emb_at + br_emb_at) / 2.0
    m = gt_mask.astype(jnp.float32)
    pull = jnp.sum(
        ((tl_emb_at - mean) ** 2 + (br_emb_at - mean) ** 2) * m
    ) / n
    diff = jnp.abs(mean[:, None] - mean[None, :])
    off_diag = 1.0 - jnp.eye(mean.shape[0])
    pair_m = m[:, None] * m[None, :] * off_diag
    push = jnp.sum(jax.nn.relu(1.0 - diff) * pair_m) / jnp.maximum(
        n * (n - 1.0), 1.0
    )
    return pull, push


def corner_loss_single(cfg: CornerCfg, out, gt_bboxes, gt_labels, gt_mask):
    """One image, one stack."""
    fh, fw = out["tl_heat"].shape[:2]
    tl_t, br_t, tl_ij, br_ij, tl_off_t, br_off_t = corner_targets(
        cfg, gt_bboxes, gt_labels, gt_mask, (fh, fw)
    )
    npos_tl = jnp.maximum(jnp.sum((tl_t == 1.0).astype(jnp.float32)), 1.0)
    npos_br = jnp.maximum(jnp.sum((br_t == 1.0).astype(jnp.float32)), 1.0)
    l_tl = L.gaussian_focal_loss(
        jax.nn.sigmoid(out["tl_heat"]), tl_t, reduction="mean",
        avg_factor=npos_tl,
    )
    l_br = L.gaussian_focal_loss(
        jax.nn.sigmoid(out["br_heat"]), br_t, reduction="mean",
        avg_factor=npos_br,
    )

    tl_emb_at = out["tl_emb"][tl_ij[0], tl_ij[1], 0]  # (G,)
    br_emb_at = out["br_emb"][br_ij[0], br_ij[1], 0]
    pull, push = ae_loss(tl_emb_at, br_emb_at, gt_mask)

    m = gt_mask.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(gt_mask.astype(jnp.float32)), 1.0)
    off_l = (
        jnp.sum(jnp.abs(out["tl_off"][tl_ij[0], tl_ij[1]] - tl_off_t) * m)
        + jnp.sum(jnp.abs(out["br_off"][br_ij[0], br_ij[1]] - br_off_t) * m)
    ) / (2.0 * n)
    return {
        "loss_heatmap": (l_tl + l_br) / 2.0,
        "loss_pull": cfg.pull_weight * pull,
        "loss_push": cfg.push_weight * push,
        "loss_offset": cfg.offset_weight * off_l,
    }


def _local_max(heat):
    pad = jnp.pad(heat, ((1, 1), (1, 1), (0, 0)), constant_values=-1.0)
    mx = jax.lax.reduce_window(
        pad, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "VALID"
    )
    return jnp.where(mx == heat, heat, 0.0)


def corner_decode_single(cfg: CornerCfg, out, img_shape, scale_factor,
                         rescale: bool):
    """One image: top-k corners per map, all-pairs match (class + geometry +
    embedding distance), score = mean corner heat."""
    fh, fw = out["tl_heat"].shape[:2]
    k = cfg.corner_topk
    s = float(cfg.stride)

    def corners(heat, emb, off):
        h = _local_max(jax.nn.sigmoid(heat))
        flat = h.reshape(-1)
        sc, idx = jax.lax.top_k(flat, k)
        cell = idx // cfg.num_classes
        cls = idx % cfg.num_classes
        cy = (cell // fw).astype(jnp.float32)
        cx = (cell % fw).astype(jnp.float32)
        o = off.reshape(-1, 2)[cell]
        e = emb.reshape(-1)[cell]
        x = (cx + o[:, 0]) * s
        y = (cy + o[:, 1]) * s
        return sc, cls, x, y, e

    tl_s, tl_c, tl_x, tl_y, tl_e = corners(
        out["tl_heat"], out["tl_emb"], out["tl_off"]
    )
    br_s, br_c, br_x, br_y, br_e = corners(
        out["br_heat"], out["br_emb"], out["br_off"]
    )
    score = (tl_s[:, None] + br_s[None, :]) / 2.0  # (k, k)
    same = tl_c[:, None] == br_c[None, :]
    geom = (tl_x[:, None] < br_x[None, :]) & (tl_y[:, None] < br_y[None, :])
    dist_ok = jnp.abs(tl_e[:, None] - br_e[None, :]) < cfg.distance_thr
    valid = same & geom & dist_ok
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
