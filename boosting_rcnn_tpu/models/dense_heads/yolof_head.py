"""YOLOF (reference ``mmdet/models/detectors/yolof.py`` +
``necks/dilated_encoder.py`` + ``dense_heads/yolof_head.py``).

You Only Look One-level Feature: C5 through a DilatedEncoder (lateral 1x1 +
3x3, then 4 dilated residual bottlenecks) feeds a single-level anchor head
with an implicit-objectness branch; classification scores fuse cls and
objectness in log space; UniformAssigner picks each gt's closest anchors
and closest predictions.  BN in neck/head is live (YOLOF trains from
scratch norms)."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import uniform_assign
from ...ops.nms import multiclass_nms_padded
from ..layers import LiveBatchNorm

INF = 1e8


class DilatedBottleneck(nn.Module):
    mid_channels: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = LiveBatchNorm(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        d = self.dilation
        y = nn.Conv(self.mid_channels, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = LiveBatchNorm(dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = LiveBatchNorm(dtype=self.dtype, name="bn3")(y)
        y = nn.relu(y)
        return x + y


class DilatedEncoder(nn.Module):
    """Reference ``necks/dilated_encoder.py:52``."""

    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Tuple[int, ...] = (2, 4, 6, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]  # C5
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="lateral_conv")(x)
        x = LiveBatchNorm(dtype=self.dtype, name="lateral_norm")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="fpn_conv")(x)
        x = LiveBatchNorm(dtype=self.dtype, name="fpn_norm")(x)
        for i in range(self.num_residual_blocks):
            x = DilatedBottleneck(
                self.block_mid_channels, self.block_dilations[i],
                dtype=self.dtype, name=f"dilated_block_{i}",
            )(x)
        return (x,)


class YOLOFConvs(nn.Module):
    """Reference ``yolof_head.py`` ``_init_layers``/``forward_single``."""

    num_classes: int = 80
    num_anchors: int = 5
    feat_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        x = feats[0]
        c = x
        for i in range(self.num_cls_convs):
            c = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"cls_conv_{i}")(c)
            c = LiveBatchNorm(dtype=self.dtype, name=f"cls_bn_{i}")(c)
            c = nn.relu(c)
        r = x
        for i in range(self.num_reg_convs):
            r = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"reg_conv_{i}")(r)
            r = LiveBatchNorm(dtype=self.dtype, name=f"reg_bn_{i}")(r)
            r = nn.relu(r)
        a = self.num_anchors
        cls_score = nn.Conv(
            a * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="cls_score",
        )(c).astype(jnp.float32)
        bbox_reg = nn.Conv(a * 4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="bbox_pred")(r).astype(
            jnp.float32
        )
        objectness = nn.Conv(a, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype, name="object_pred")(r).astype(
            jnp.float32
        )
        # implicit objectness fusion (reference forward_single):
        # cls + obj - log(1 + exp(cls) + exp(obj))
        b, h, w, _ = cls_score.shape
        cs = cls_score.reshape(b, h, w, a, self.num_classes)
        ob = objectness.reshape(b, h, w, a, 1)
        fused = cs + ob - jnp.log(
            1.0
            + jnp.clip(jnp.exp(cs), None, INF)
            + jnp.clip(jnp.exp(ob), None, INF)
        )
        return (
            [fused.reshape(b, h, w, a * self.num_classes)],
            [bbox_reg],
        )


@dataclasses.dataclass(frozen=True)
class YOLOFCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = (32,)
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    delta_clip: float = 32.0  # reference DeltaXYWHBBoxCoder add_ctr_clamp
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0


def yolof_loss(
    cfg: YOLOFCfg,
    cls_logits: jnp.ndarray,  # (B, A, C) fused scores
    bbox_preds: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    valid: jnp.ndarray,  # (B, A)
    gt_bboxes, gt_labels, gt_mask,
    axis_name: Optional[str] = None,
):
    b, a, c = cls_logits.shape
    g = gt_bboxes.shape[1]
    anchors_b = jnp.broadcast_to(anchors[None], (b, a, 4))
    decoded = jax.vmap(
        lambda an, bp: box_ops.delta2bbox(
            an, bp, cfg.target_means, cfg.target_stds
        )
    )(anchors_b, bbox_preds)

    def targets(db, v, gb, gm, gl):
        return uniform_assign(
            jax.lax.stop_gradient(db), anchors, v, gb, gm, gt_labels=gl,
            match_times=cfg.match_times, pos_ignore_thr=cfg.pos_ignore_thr,
            neg_ignore_thr=cfg.neg_ignore_thr,
        )
    assign = jax.vmap(targets)(decoded, valid, gt_bboxes, gt_mask, gt_labels)
    pos = assign.gt_inds > 0
    neg = assign.gt_inds == 0
    safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
    matched = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)

    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.sum(posf)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    labels = jnp.where(pos, assign.labels, cfg.num_classes)
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=jnp.float32)
    w = (pos | neg).reshape(-1).astype(jnp.float32)
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_logits.reshape(-1, c), onehot, weight=w,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_pos,
    )
    dflat = decoded.reshape(-1, 4)
    safe_t = jnp.where(posf[:, None] > 0, matched.reshape(-1, 4), dflat)
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        dflat, jax.lax.stop_gradient(safe_t), weight=posf,
        avg_factor=num_pos,
    )
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


def yolof_get_bboxes(
    cfg: YOLOFCfg,
    cls_logits: jnp.ndarray,  # (A, C) one image (fused)
    bbox_preds: jnp.ndarray,
    anchors: jnp.ndarray,
    img_shape, scale_factor, rescale: bool,
    nms_pre: int = 1000, score_thr: float = 0.05,
    nms_iou_thr: float = 0.6, max_per_img: int = 100,
):
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    k = min(nms_pre, scores.shape[0])
    _, ti = jax.lax.top_k(jnp.max(scores, axis=-1), k)
    boxes = box_ops.delta2bbox(
        anchors[ti], bbox_preds[ti], cfg.target_means, cfg.target_stds,
        max_shape=img_shape,
    )
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, scores[ti], score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
