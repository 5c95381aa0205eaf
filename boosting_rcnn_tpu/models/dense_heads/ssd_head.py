"""SSD head (spec: reference ``mmdet/models/dense_heads/ssd_head.py``):
per-level 3x3 convs to (A*(C+1)) softmax class logits and (A*4) deltas;
MaxIoU(0.5/0.5/min 0.2 in mmdet's ssd300 config) assignment over all
anchors; CE cls loss with 3:1 hard-negative mining; SmoothL1 box loss.

SSD anchor generation (reference ``SSDAnchorGenerator``): per-level
min/max sizes from ``basesize_ratio_range``; scales [1, sqrt(max/min)] at
ratio 1 plus each extra ratio r and 1/r.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.anchors import AnchorGenerator
from ...ops.assigners import max_iou_assign
from ...ops.nms import multiclass_nms_padded


def ssd_anchor_generator(
    input_size: int = 300,
    strides: Sequence[int] = (8, 16, 32, 64, 100, 300),
    ratios: Sequence[Sequence[float]] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9),
    min_sizes: Sequence[int] = None,
    max_sizes: Sequence[int] = None,
) -> List[AnchorGenerator]:
    """Per-level anchor generators with SSD's size progression, or explicit
    ``min_sizes``/``max_sizes`` (the SSDLite config sets them manually)."""
    if min_sizes is None:
        min_ratio, max_ratio = basesize_ratio_range
        min_ratio, max_ratio = int(min_ratio * 100), int(max_ratio * 100)
        step = int(np.floor(max_ratio - min_ratio) / (len(strides) - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        # first-level size (reference SSDAnchorGenerator input_size/ratio
        # table: 300-COCO 7/15, 300-VOC 10/20, 512-COCO 4/10, 512-VOC 7/15)
        if input_size == 512:
            lo, hi = (4, 10) if basesize_ratio_range[0] == 0.1 else (7, 15)
        else:
            lo, hi = (7, 15) if basesize_ratio_range[0] == 0.15 else (10, 20)
        min_sizes.insert(0, int(input_size * lo / 100))
        max_sizes.insert(0, int(input_size * hi / 100))
    else:
        min_sizes, max_sizes = list(min_sizes), list(max_sizes)

    gens = []
    for lvl, stride in enumerate(strides):
        scales = [1.0, float(np.sqrt(max_sizes[lvl] / min_sizes[lvl]))]
        lvl_ratios = [1.0]
        for r in ratios[lvl]:
            lvl_ratios += [1.0 / r, r]
        # reference keeps scale[1] (the sqrt step) only for ratio 1
        gen = AnchorGenerator(
            strides=[stride],
            ratios=lvl_ratios,
            scales=scales,
            base_sizes=[min_sizes[lvl]],
            scale_major=False,
            center_offset=0.5,
        )
        # prune: ratio-1 keeps both scales; other ratios keep scale 1 only
        base = gen.base_anchors[0]
        keep = [0, len(lvl_ratios)]  # (scale0, ratio0), (scale1, ratio0)
        for ri in range(1, len(lvl_ratios)):
            keep.append(ri)  # scale0 with ratio ri
        gen.base_anchors[0] = base[np.array(keep)]
        gens.append(gen)
    return gens


class SSDConvs(nn.Module):
    num_classes: int = 80
    num_anchors: Tuple[int, ...] = (4, 6, 6, 6, 4, 4)
    # SSDLite (reference SSDHead use_depthwise): each prediction conv is a
    # depthwise 3x3 + BN + ReLU6 followed by a 1x1 projection
    use_depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        from ..layers import LiveBatchNorm

        def dw_block(x, lvl, branch):
            c = x.shape[-1]
            y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                        feature_group_count=c, use_bias=False,
                        dtype=self.dtype, name=f"{branch}_dw_{lvl}")(x)
            y = LiveBatchNorm(dtype=self.dtype,
                              name=f"{branch}_dwbn_{lvl}")(y)
            return jnp.clip(nn.relu(y), 0.0, 6.0)

        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            a = self.num_anchors[lvl]
            if self.use_depthwise:
                xc = dw_block(x, lvl, "cls")
                xr = dw_block(x, lvl, "reg")
                cls_out.append(
                    nn.Conv(a * (self.num_classes + 1), (1, 1),
                            dtype=self.dtype, name=f"cls_conv_{lvl}")(xc))
                reg_out.append(
                    nn.Conv(a * 4, (1, 1), dtype=self.dtype,
                            name=f"reg_conv_{lvl}")(xr).astype(jnp.float32))
                continue
            cls_out.append(
                nn.Conv(a * (self.num_classes + 1), (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"cls_conv_{lvl}")(x)
            )
            reg_out.append(
                nn.Conv(a * 4, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"reg_conv_{lvl}")(x).astype(
                    jnp.float32
                )
            )
        return cls_out, reg_out, None


@dataclasses.dataclass(frozen=True)
class SSDCfg:
    num_classes: int = 80
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    neg_pos_ratio: int = 3
    smooth_l1_beta: float = 1.0
    loss_bbox_weight: float = 1.0  # YOLACT uses 1.5
    # PISA (reference pisa_ssd_head.py): ISR-P + CARL on top of OHEM
    pisa: bool = False
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2


def ssd_loss(
    cfg: SSDCfg,
    cls_logits: jnp.ndarray,  # (B, A, C+1)
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,
    valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
):
    b, a, c1 = cls_logits.shape

    def targets(v, gb, gl, gm):
        assign = max_iou_assign(
            anchors, v, gb, gm, gt_labels=gl,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, match_low_quality=True,
        )
        pos = assign.gt_inds > 0
        neg = assign.gt_inds == 0
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        enc = box_ops.bbox2delta(
            anchors, box_ops.take_small_table(gb, safe), cfg.target_means, cfg.target_stds, eps=1e-6
        )
        bt = jnp.where(pos[:, None], enc, 0.0)
        labels = jnp.where(pos, assign.labels, cfg.num_classes)
        return pos, neg, bt, labels, jnp.clip(assign.gt_inds - 1, 0, g - 1)

    pos, neg, bt, labels, gt_idx = jax.vmap(targets)(
        valid, gt_bboxes, gt_labels, gt_mask)
    num_pos = jnp.sum(pos.astype(jnp.float32))
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_total = jnp.maximum(num_pos, 1.0)

    ce = jax.vmap(
        lambda lg, lb: L.cross_entropy_loss(lg, lb, reduction="none")
    )(cls_logits.astype(jnp.float32), labels)  # (B, A)

    # hard negative mining per image: keep the 3*num_pos highest-loss negs
    def mine(ce_i, pos_i, neg_i):
        k = jnp.minimum(
            cfg.neg_pos_ratio * jnp.sum(pos_i.astype(jnp.int32)),
            jnp.sum(neg_i.astype(jnp.int32)),
        )
        neg_ce = jnp.where(neg_i, ce_i, -jnp.inf)
        order = jnp.argsort(-neg_ce)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(a))
        return neg_i & (rank < k)

    hard_neg = jax.vmap(mine)(ce, pos, neg)
    w = (pos | hard_neg).astype(jnp.float32)
    if cfg.pisa:
        # ISR-P reweighting of positives (reference ``pisa_ssd_head.py``).
        from ...ops.pisa import isr_p_weights

        g = gt_bboxes.shape[1]
        gt_global = gt_idx + jnp.arange(b, dtype=gt_idx.dtype)[:, None] * g
        dec_p = jax.vmap(
            lambda r: box_ops.delta2bbox(anchors, r, cfg.target_means,
                                         cfg.target_stds)
        )(bbox_preds.astype(jnp.float32))
        dec_t = jax.vmap(
            lambda r: box_ops.delta2bbox(anchors, r, cfg.target_means,
                                         cfg.target_stds)
        )(bt)
        ious = box_ops.bbox_overlaps_aligned(
            dec_p.reshape(-1, 4), dec_t.reshape(-1, 4))
        w = isr_p_weights(
            labels.reshape(-1), gt_global.reshape(-1),
            jax.lax.stop_gradient(ious), w.reshape(-1), pos.reshape(-1),
            jax.lax.stop_gradient(ce).reshape(-1),
            k=cfg.isr_k, bias=cfg.isr_bias,
        ).reshape(b, a)
    loss_cls = jnp.sum(ce * w) / num_total
    posf = pos.reshape(-1, 1).astype(jnp.float32)
    loss_bbox = L.smooth_l1_loss(
        bbox_preds.reshape(-1, 4), bt.reshape(-1, 4), weight=posf,
        beta=cfg.smooth_l1_beta, avg_factor=num_total,
    )
    out = {"loss_cls": loss_cls,
           "loss_bbox": loss_bbox * cfg.loss_bbox_weight}
    if cfg.pisa:
        from ...ops.pisa import carl_loss

        reg_elem = jnp.abs(bbox_preds.reshape(-1, 4) - bt.reshape(-1, 4))
        out["loss_carl"] = carl_loss(
            cls_logits.reshape(-1, c1)[:, :-1], labels.reshape(-1),
            pos.reshape(-1), reg_elem, k=cfg.carl_k, bias=cfg.carl_bias,
            avg_factor=num_total, sigmoid=False,
        )
    return out


def ssd_get_bboxes(
    cfg: SSDCfg,
    cls_logits: jnp.ndarray,  # (A, C+1)
    bbox_preds: jnp.ndarray,
    anchors: jnp.ndarray,
    num_level_anchors: Sequence[int],
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,
    rescale: bool,
    nms_pre: int = 1000,
    score_thr: float = 0.02,
    nms_iou_thr: float = 0.45,
    max_per_img: int = 200,
):
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, : cfg.num_classes]
    boxes = box_ops.delta2bbox(
        anchors, bbox_preds, cfg.target_means, cfg.target_stds, max_shape=img_shape
    )
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )


class SSDNeck(nn.Module):
    """SSDLite extra pyramid (reference ``necks/ssd_neck.py``
    use_depthwise): each extra level is 1x1 (out//2) + BN + ReLU6, then a
    stride-2 depthwise 3x3 + BN + ReLU6, then 1x1 (out) + BN + ReLU6.
    The backbone's own maps pass through unchanged."""

    out_channels: Tuple[int, ...] = (96, 1280, 512, 256, 256, 128)
    num_backbone_levels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ..layers import LiveBatchNorm

        def bn_act(y, name):
            y = LiveBatchNorm(dtype=self.dtype, name=name)(y)
            return jnp.clip(nn.relu(y), 0.0, 6.0)

        outs = list(feats[: self.num_backbone_levels])
        x = outs[-1]
        for i, ch in enumerate(self.out_channels[self.num_backbone_levels:]):
            mid = ch // 2
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"extra_{i}_conv1")(x)
            y = bn_act(y, f"extra_{i}_bn1")
            y = nn.Conv(mid, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                        feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, name=f"extra_{i}_dw")(y)
            y = bn_act(y, f"extra_{i}_dwbn")
            y = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"extra_{i}_conv2")(y)
            y = bn_act(y, f"extra_{i}_bn2")
            outs.append(y)
            x = y
        return tuple(outs)
