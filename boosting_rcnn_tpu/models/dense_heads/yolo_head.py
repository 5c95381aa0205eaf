"""YOLOv3 neck + head (spec: reference ``mmdet/models/necks/yolo_neck.py``
+ ``mmdet/models/dense_heads/yolo_head.py``).

Neck: 3 DetectionBlocks (5 alternating 1x1/3x3 convs); between levels a 1x1
conv + 2x upsample feeds the concat with the next backbone feature.
Head: per level 3x3 conv + 1x1 to A*(5+C) raw predictions.
Loss: per-anchor MaxIoU assignment against gt (best-anchor forced positive),
BCE objectness with IoU>0.5 neighbours ignored, BCE xy (sigmoid cell
offsets), MSE wh (log space), BCE class.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.anchors import AnchorGenerator
from ...ops.assigners import max_iou_assign
from ...ops.coders import yolo_decode, yolo_encode
from ...ops.nms import multiclass_nms_padded
from ..backbones.darknet import ConvBNLeaky

YOLO_ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),  # stride 32
    ((30, 61), (62, 45), (59, 119)),  # stride 16
    ((10, 13), (16, 30), (33, 23)),  # stride 8
)
YOLO_STRIDES = (32, 16, 8)


class YOLOV3Neck(nn.Module):
    out_channels: Tuple[int, ...] = (512, 256, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """feats: (C3, C4, C5) low->high stride; returns 3 maps high->low
        stride (like the reference: level 0 = stride 32)."""
        c3, c4, c5 = feats
        outs = []
        x = c5
        for i, (skip, ch) in enumerate(
            [(None, self.out_channels[0]), (c4, self.out_channels[1]),
             (c3, self.out_channels[2])]
        ):
            if skip is not None:
                x = ConvBNLeaky(ch, 1, dtype=self.dtype, name=f"reduce{i}")(x)
                x = jax.image.resize(
                    x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[3]),
                    method="nearest",
                )
                x = jnp.concatenate([x, skip], axis=-1)
            for j in range(5):
                k = 1 if j % 2 == 0 else 3
                cch = ch if j % 2 == 0 else ch * 2
                x = ConvBNLeaky(cch, k, dtype=self.dtype, name=f"det{i}_conv{j}")(x)
            outs.append(x)
        return tuple(outs)


class YOLOV3HeadConvs(nn.Module):
    num_classes: int = 80
    in_channels: Tuple[int, ...] = (512, 256, 128)
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs = []
        for i, x in enumerate(feats):
            x = ConvBNLeaky(
                self.in_channels[i] * 2, 3, dtype=self.dtype, name=f"conv_bridge{i}"
            )(x)
            x = nn.Conv(
                self.num_anchors * (5 + self.num_classes), (1, 1),
                dtype=self.dtype, name=f"conv_pred{i}",
            )(x)
            outs.append(x.astype(jnp.float32))
        return outs


@dataclasses.dataclass(frozen=True)
class YOLOCfg:
    num_classes: int = 80
    strides: Tuple[int, ...] = YOLO_STRIDES
    ignore_iou_thr: float = 0.5


def yolo_anchor_generators():
    """One generator per level with the canonical YOLOv3 (w, h) anchor
    shapes, centered on cell centers (reference ``YOLOAnchorGenerator``)."""
    gens = []
    for lvl, stride in enumerate(YOLO_STRIDES):
        sizes = YOLO_ANCHORS[lvl]
        gen = AnchorGenerator(
            strides=[stride], ratios=[1.0], scales=[1.0], base_sizes=[stride],
        )
        c = stride / 2.0
        gen.base_anchors[0] = np.array(
            [[c - w / 2, c - h / 2, c + w / 2, c + h / 2] for (w, h) in sizes],
            np.float32,
        )
        gens.append(gen)
    return gens


def yolo_loss(
    cfg: YOLOCfg,
    preds: jnp.ndarray,  # (B, A, 5 + C) raw
    anchors: jnp.ndarray,  # (A, 4)
    anchor_strides: jnp.ndarray,  # (A,)
    valid: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
):
    b, a, _ = preds.shape
    c = cfg.num_classes

    def targets(v, gb, gl, gm):
        assign = max_iou_assign(
            anchors, v, gb, gm, gt_labels=gl,
            pos_iou_thr=1.1,  # positives only via best-match (below)
            neg_iou_thr=cfg.ignore_iou_thr,
            min_pos_iou=0.0, match_low_quality=True,
        )
        pos = assign.gt_inds > 0
        ignore = assign.gt_inds == -1  # iou > thr but not best match
        g = gb.shape[0]
        safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
        return pos, ignore, box_ops.take_small_table(gb, safe), jnp.where(pos, assign.labels, 0)

    pos, ignore, matched, labels = jax.vmap(targets)(
        valid, gt_bboxes, gt_labels, gt_mask
    )
    posf = pos.reshape(-1).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(posf), 1.0)
    if axis_name is not None:
        num_pos = jnp.maximum(jax.lax.pmean(jnp.sum(posf), axis_name), 1.0)

    anchors_b = jnp.broadcast_to(anchors, (b, a, 4)).reshape(-1, 4)
    strides_b = jnp.broadcast_to(anchor_strides, (b, a)).reshape(-1)
    flat = preds.reshape(-1, 5 + c)
    gt_flat = matched.reshape(-1, 4)
    safe_gt = jnp.where(posf[:, None] > 0, gt_flat, anchors_b)
    t_xywh = yolo_encode(anchors_b, safe_gt, strides_b)

    obj_t = posf
    neg_w = (~(pos | ignore)).reshape(-1).astype(jnp.float32) + posf
    loss_obj = L.binary_cross_entropy_loss(
        flat[:, 4], obj_t, weight=neg_w, avg_factor=num_pos
    )
    loss_xy = L.binary_cross_entropy_loss(
        flat[:, 0:2], jax.nn.sigmoid(t_xywh[:, 0:2]),
        weight=posf[:, None], avg_factor=num_pos,
    )
    loss_wh = L.mse_loss(
        flat[:, 2:4], t_xywh[:, 2:4], weight=posf[:, None], avg_factor=num_pos
    )
    onehot = jax.nn.one_hot(labels.reshape(-1), c)
    loss_cls = L.binary_cross_entropy_loss(
        flat[:, 5:], onehot, weight=posf[:, None], avg_factor=num_pos
    )
    return {
        "loss_obj": loss_obj,
        "loss_xy": loss_xy,
        "loss_wh": loss_wh,
        "loss_cls": loss_cls,
    }


def yolo_get_bboxes(
    cfg: YOLOCfg,
    preds: jnp.ndarray,  # (A, 5 + C)
    anchors: jnp.ndarray,
    anchor_strides: jnp.ndarray,
    img_shape: jnp.ndarray,
    scale_factor: jnp.ndarray,
    rescale: bool,
    score_thr: float = 0.05,
    nms_iou_thr: float = 0.45,
    max_per_img: int = 100,
):
    c = cfg.num_classes
    boxes = yolo_decode(anchors, preds[:, :4], anchor_strides)
    boxes = box_ops.clip_boxes(boxes, img_shape)
    obj = jax.nn.sigmoid(preds[:, 4:5])
    cls = jax.nn.sigmoid(preds[:, 5:]) * obj
    if rescale:
        boxes = boxes / scale_factor.reshape(1, 4)
    return multiclass_nms_padded(
        boxes, cls, score_thr=score_thr, iou_threshold=nms_iou_thr,
        max_per_img=max_per_img,
    )
