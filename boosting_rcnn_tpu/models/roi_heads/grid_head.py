"""Grid R-CNN grid-point head (reference
``mmdet/models/roi_heads/mask_heads/grid_head.py``).

A 3x3 grid of box-boundary keypoints is predicted as 9 heatmaps from the
14x14 RoI features: 8 convs (first stride-2), first+second-order neighbor
fusion (depthwise 5x5 + 1x1 per grid-graph edge, ``grid_head.py:160-175``),
two grouped 4x4 stride-2 deconvs to a 28x28 map per point (half of the
56 whole-map, the Grid R-CNN Plus sub-region crop, ``calc_sub_regions``).
Targets and the boundary-voting box decode are pure fixed-shape functions
(reference ``get_targets:224`` / ``get_bboxes:301``); everything batches
over RoIs with no python-per-roi loops.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvModule


def _neighbor_points(grid_size: int) -> List[Tuple[int, ...]]:
    pts = []
    for i in range(grid_size):
        for j in range(grid_size):
            nb = []
            if i > 0:
                nb.append((i - 1) * grid_size + j)
            if j > 0:
                nb.append(i * grid_size + j - 1)
            if j < grid_size - 1:
                nb.append(i * grid_size + j + 1)
            if i < grid_size - 1:
                nb.append((i + 1) * grid_size + j)
            pts.append(tuple(nb))
    return pts


def sub_regions(grid_points: int, whole_map: int) -> List[Tuple[int, ...]]:
    """Grid-R-CNN-Plus half-size crop windows (``calc_sub_regions:196``)."""
    gs = int(grid_points ** 0.5)
    half = whole_map // 4 * 2
    regs = []
    for i in range(grid_points):
        xi, yi = i // gs, i % gs
        def edge(idx):
            if idx == 0:
                return 0
            if idx == gs - 1:
                return half
            return max(int((idx / (gs - 1) - 0.25) * whole_map), 0)
        x1, y1 = edge(xi), edge(yi)
        regs.append((x1, y1, x1 + half, y1 + half))
    return regs


class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    point_feat_channels: int = 64
    norm_groups: int = 36
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gp = self.grid_points
        c = self.point_feat_channels
        out_ch = c * gp
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = ConvModule(
                out_ch, 3, stride=stride,
                norm_cfg={"type": "GN", "num_groups": self.norm_groups},
                act="relu", bias=True, dtype=self.dtype, name=f"conv{i}",
            )(x)

        def trans(name):
            def f(t):
                t = nn.Conv(c, (5, 5), padding=[(2, 2), (2, 2)],
                            feature_group_count=c, dtype=self.dtype,
                            name=f"{name}_dw")(t)
                return nn.Conv(c, (1, 1), dtype=self.dtype,
                               name=f"{name}_pw")(t)
            return f

        nbrs = _neighbor_points(int(gp ** 0.5))
        parts = [x[..., i * c:(i + 1) * c] for i in range(gp)]
        x_fo = []
        for i, points in enumerate(nbrs):
            acc = parts[i]
            for j, p in enumerate(points):
                acc = acc + trans(f"fo_{i}_{j}")(parts[p])
            x_fo.append(acc)
        x_so = []
        for i, points in enumerate(nbrs):
            acc = parts[i]
            for j, p in enumerate(points):
                acc = acc + trans(f"so_{i}_{j}")(x_fo[p])
            x_so.append(acc)

        # grouped deconv1 (out c per point) -> GN(gp) -> relu -> grouped
        # deconv2 (out 1 per point); groups realised as gp parallel slices
        # (groups=gp in torch).  Modules built once, shared by the fused
        # and unfused decode passes (the reference shares them too).
        deconv1 = [
            nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name=f"deconv1_{i}")
            for i in range(gp)
        ]
        norm1 = nn.GroupNorm(num_groups=gp, epsilon=1e-5, dtype=self.dtype,
                             name="norm1")
        deconv2 = [
            nn.ConvTranspose(
                1, (4, 4), strides=(2, 2), padding="SAME",
                bias_init=nn.initializers.constant(-jnp.log(0.99 / 0.01)),
                dtype=self.dtype, name=f"deconv2_{i}")
            for i in range(gp)
        ]

        def decode(feats):
            y = jnp.concatenate(
                [deconv1[i](f) for i, f in enumerate(feats)], axis=-1)
            y = nn.relu(norm1(y))
            outs = [
                deconv2[i](y[..., i * c:(i + 1) * c]) for i in range(gp)
            ]
            return jnp.concatenate(outs, axis=-1)  # (N, 28, 28, gp)

        fused = decode(x_so)
        unfused = decode(parts) if train else fused
        return fused, unfused


@dataclasses.dataclass(frozen=True)
class GridCfg:
    grid_points: int = 9
    whole_map: int = 56
    pos_radius: int = 1
    loss_weight: float = 15.0
    jitter_amplitude: float = 0.15


def jitter_boxes(boxes, rng, amplitude, img_shape):
    """Random jitter of positive proposals (``grid_roi_head.py:28-51``)."""
    off = jax.random.uniform(rng, boxes.shape, minval=-amplitude,
                             maxval=amplitude)
    cxcy = (boxes[..., 2:4] + boxes[..., :2]) / 2
    wh = jnp.abs(boxes[..., 2:4] - boxes[..., :2])
    new_c = cxcy + wh * off[..., :2]
    new_wh = wh * (1 + off[..., 2:])
    out = jnp.concatenate([new_c - new_wh / 2, new_c + new_wh / 2], -1)
    h, w = img_shape[..., 0:1], img_shape[..., 1:2]
    return jnp.stack([
        jnp.clip(out[..., 0], 0, w[..., 0] - 1),
        jnp.clip(out[..., 1], 0, h[..., 0] - 1),
        jnp.clip(out[..., 2], 0, w[..., 0] - 1),
        jnp.clip(out[..., 3], 0, h[..., 0] - 1),
    ], -1)


def expand_2x(boxes):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack([
        boxes[..., 0] - w / 2, boxes[..., 1] - h / 2,
        boxes[..., 2] + w / 2, boxes[..., 3] + h / 2,
    ], -1)


def grid_targets(cfg: GridCfg, pos_boxes, pos_gt, pos_valid):
    """(R,4),(R,4),(R,) -> targets (R, half, half, gp), weight (R,).

    Vectorised form of ``get_targets:224``: mark a radius-``pos_radius``
    circle at each grid point of the GT box inside the 2x-expanded proposal
    window at ``whole_map`` resolution, then crop each point's sub-region.
    """
    gp, wm = cfg.grid_points, cfg.whole_map
    gs = int(gp ** 0.5)
    ex = expand_2x(pos_boxes)
    ws = (ex[:, 2] - ex[:, 0])[:, None]
    hs = (ex[:, 3] - ex[:, 1])[:, None]
    # grid point j at (factor interpolation of gt corners); j = xi * gs + yi
    xi = jnp.arange(gp) // gs
    yi = jnp.arange(gp) % gs
    fx = 1.0 - xi / (gs - 1)
    fy = 1.0 - yi / (gs - 1)
    gx = fx[None] * pos_gt[:, 0:1] + (1 - fx)[None] * pos_gt[:, 2:3]
    gy = fy[None] * pos_gt[:, 1:2] + (1 - fy)[None] * pos_gt[:, 3:4]
    cx = jnp.floor((gx - ex[:, 0:1]) / ws * wm).astype(jnp.int32)
    cy = jnp.floor((gy - ex[:, 1:2]) / hs * wm).astype(jnp.int32)
    xx = jnp.arange(wm)
    yy = jnp.arange(wm)
    d2 = ((xx[None, None, None, :] - cx[:, :, None, None]) ** 2
          + (yy[None, None, :, None] - cy[:, :, None, None]) ** 2)
    full = (d2 <= cfg.pos_radius ** 2).astype(jnp.float32)  # (R,gp,wm,wm)
    crops = []
    for i, (x1, y1, x2, y2) in enumerate(sub_regions(gp, wm)):
        crops.append(full[:, i, y1:y2, x1:x2])
    tgt = jnp.stack(crops, axis=-1)  # (R, half, half, gp)
    small = (ws[:, 0] <= gs) | (hs[:, 0] <= gs)
    weight = pos_valid.astype(jnp.float32) * (1.0 - small.astype(jnp.float32))
    return tgt, weight


def grid_loss(cfg: GridCfg, fused, unfused, targets, weight):
    """Sigmoid BCE on both maps (``grid_head.py:loss``), masked mean over
    valid rois."""
    def bce(logits):
        l = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        per_roi = l.mean(axis=(1, 2, 3))
        return (per_roi * weight).sum() / jnp.maximum(weight.sum(), 1.0)

    return cfg.loss_weight * (bce(fused) + bce(unfused))


def grid_refine_boxes(cfg: GridCfg, det_boxes, heatmaps, img_shape):
    """Boundary-point voting decode (``get_bboxes:301``).

    det_boxes (R, 4); heatmaps (R, half, half, gp) logits -> refined (R, 4).
    """
    gp, wm = cfg.grid_points, cfg.whole_map
    gs = int(gp ** 0.5)
    half = wm // 4 * 2
    probs = jax.nn.sigmoid(heatmaps.astype(jnp.float32))
    r = probs.shape[0]
    flat = probs.transpose(0, 3, 1, 2).reshape(r, gp, half * half)
    scores = flat.max(axis=-1)
    pos = jnp.argmax(flat, axis=-1)
    xs = (pos % half).astype(jnp.float32)
    ys = (pos // half).astype(jnp.float32)
    regs = jnp.asarray(sub_regions(gp, wm), jnp.float32)  # (gp, 4)
    xs = xs + regs[None, :, 0]
    ys = ys + regs[None, :, 1]
    ex = expand_2x(det_boxes)
    w = (ex[:, 2] - ex[:, 0])[:, None]
    h = (ex[:, 3] - ex[:, 1])[:, None]
    abs_x = (xs + 0.5) / wm * w + ex[:, 0:1]
    abs_y = (ys + 0.5) / wm * h + ex[:, 1:2]
    x1_i = jnp.arange(gs)
    y1_i = jnp.arange(gs) * gs
    x2_i = gp - gs + jnp.arange(gs)
    y2_i = (jnp.arange(gs) + 1) * gs - 1

    def vote(vals, sc, idx):
        s = sc[:, idx]
        return (vals[:, idx] * s).sum(-1) / jnp.maximum(s.sum(-1), 1e-6)

    out = jnp.stack([
        jnp.clip(vote(abs_x, scores, x1_i), 0, img_shape[1]),
        jnp.clip(vote(abs_y, scores, y1_i), 0, img_shape[0]),
        jnp.clip(vote(abs_x, scores, x2_i), 0, img_shape[1]),
        jnp.clip(vote(abs_y, scores, y2_i), 0, img_shape[0]),
    ], -1)
    return out
