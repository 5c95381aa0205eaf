"""SOLO detector (reference ``mmdet/models/detectors/solo.py``: single-stage
instance segmenter = backbone + FPN + SOLOHead).

API adaptation (documented deviation): the reference emits only masks; here
boxes are derived from the binary masks' extents so SOLO fits the common
``predict -> (dets, labels, valid, masks)`` surface (enabling both the
bbox and segm eval paths).  Masks are emitted at their native full-image
1/4-canvas resolution (reference ``solo_head.py:854`` ``get_results``
interpolates to the padded canvas and crops); the host-side eval adapter
(``data/mask_utils.full_masks_to_bitmaps``) upsamples to original image
coordinates directly — no lossy box-crop round trip.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dense_heads.solo_head import SOLOCfg, solo_decode_single, solo_loss
from ...ops.point_sample import point_sample


class SOLONet(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def features(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images):
        return self.head(self.features(images))


def masks_to_boxes(masks: jnp.ndarray, scale: float) -> jnp.ndarray:
    """(K, h, w) binary -> (K, 4) xyxy boxes in image coords (x ``scale``)."""
    k, h, w = masks.shape
    m = masks.astype(jnp.float32)
    any_row = jnp.any(masks, axis=2)  # (K, h)
    any_col = jnp.any(masks, axis=1)  # (K, w)
    big = jnp.float32(1e9)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    y1 = jnp.min(jnp.where(any_row, ys[None], big), axis=1)
    y2 = jnp.max(jnp.where(any_row, ys[None], -big), axis=1) + 1.0
    x1 = jnp.min(jnp.where(any_col, xs[None], big), axis=1)
    x2 = jnp.max(jnp.where(any_col, xs[None], -big), axis=1) + 1.0
    empty = ~jnp.any(any_row, axis=1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1) * scale
    return jnp.where(empty[:, None], 0.0, boxes)


def mask_to_box_crop(mask: jnp.ndarray, box: jnp.ndarray, size: int,
                     scale: float) -> jnp.ndarray:
    """Resample a (h, w) mask (1/``scale`` of image coords) into a
    (size, size) crop of ``box`` (image coords)."""
    h, w = mask.shape
    frac = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    xs = (box[0] + frac * (box[2] - box[0])) / scale
    ys = (box[1] + frac * (box[3] - box[1])) / scale
    pts = jnp.stack(
        [jnp.tile(xs / w, size), jnp.repeat(ys / h, size)], axis=-1
    )
    vals = point_sample(mask.astype(jnp.float32)[..., None], pts)[..., 0]
    return vals.reshape(size, size)


class SOLODetector:
    # masks from predict are full-image (1/mask_stride canvas) rasters —
    # run_eval converts them host-side via full_masks_to_bitmaps
    full_image_masks = True
    mask_stride = 4

    def __init__(self, net: SOLONet, cfg: SOLOCfg, crop_size: int = 56):
        self.net = net
        self.cfg = cfg
        self.crop_size = crop_size

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in (4, 8, 16, 32, 64)
        ]

    def anchors_for(self, canvas_hw):
        # grid-based: no anchors; keep the (pack, counts) API shape
        return jnp.zeros((0,)), tuple(g * g for g in self.cfg.num_grids)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        if "gt_mask_crops" not in batch:
            raise KeyError("SOLO training needs gt_mask_crops in the batch")
        images = batch["images"]
        canvas_hw = (float(images.shape[1]), float(images.shape[2]))
        mask_preds, cls_preds = self.net.apply(variables, images)
        return solo_loss(
            self.cfg, mask_preds, cls_preds,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            batch["gt_mask_crops"], canvas_hw, axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        images = batch["images"]
        b = images.shape[0]
        mask_preds, cls_preds = self.net.apply(variables, images)
        oh, ow = images.shape[1] // 4, images.shape[2] // 4

        def decode_one(mps, cps, sf):
            sc, lab, masks, valid = solo_decode_single(
                self.cfg, mps, cps, (oh, ow)
            )
            boxes = masks_to_boxes(masks, 4.0)  # padded-image coords
            if rescale:
                boxes = boxes / sf
            dets = jnp.concatenate([boxes, sc[:, None]], axis=-1)
            # native full-image masks at 1/4 canvas (reference get_results
            # emits image-size masks; the upsample happens host-side)
            return dets, lab, valid, masks.astype(jnp.uint8)

        return jax.vmap(decode_one)(
            mask_preds, cls_preds, batch["scale_factor"]
        )
