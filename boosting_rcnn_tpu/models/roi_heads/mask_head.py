"""FCN mask head + TPU-native mask targets.

Spec: reference ``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py``
(4x conv256 + 2x deconv + 1x1 per-class logits, BCE on the gt class) and
``mmdet/core/mask/mask_target.py`` (28x28 targets cropped from gt masks by
the sampled pos RoIs).

TPU design: gt masks arrive as fixed (G, S, S) *box-relative* crops (see
``data/mask_utils.py``); the per-RoI 28x28 target is a bilinear resample of
the matched gt's crop under the RoI<->gt-box affine map — one fixed-shape
gather instead of the reference's dynamic per-RoI cv2 crop-resize.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import losses as L


class _NormedConv1x1(nn.Module):
    """Weight- and feature-normalized 1x1 conv with temperature (reference
    mmdet ``NormedConv2d``, the seesaw_loss *_normed_mask configs).  The
    parameter keeps nn.Conv's ``kernel`` name/shape for the converter."""

    features: int
    temperature: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, cin, self.features), jnp.float32)
        wn = w / (jnp.sqrt(jnp.sum(w ** 2, axis=(0, 1, 2),
                                   keepdims=True)) + 1e-6)
        xn = x / (jnp.sqrt(jnp.sum(
            x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)) + 1e-6
        ).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xn, wn.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return self.temperature * y


class FCNMaskHead(nn.Module):
    num_classes: int = 80
    num_convs: int = 4
    conv_channels: int = 256
    norm_cfg: Any = None  # e.g. GN (configs/gn) / SyncBN (strong_baselines)
    predictor_cfg: Any = None  # dict(type='NormedConv2d', tempearture=20)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (R, 14, 14, C) -> (R, 28, 28, num_classes) logits."""
        from ..layers import ConvModule

        for i in range(self.num_convs):
            if self.norm_cfg is not None:
                x = ConvModule(
                    self.conv_channels, 3, norm_cfg=self.norm_cfg,
                    act="relu", dtype=self.dtype, name=f"conv_{i}",
                )(x)
                continue
            x = nn.Conv(
                self.conv_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.conv_channels, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="upsample",
        )(x)
        x = nn.relu(x)
        if (self.predictor_cfg or {}).get("type") == "NormedConv2d":
            return _NormedConv1x1(
                self.num_classes,
                # the reference config key is (sic) 'tempearture'
                temperature=self.predictor_cfg.get(
                    "tempearture", self.predictor_cfg.get("temperature", 20)),
                dtype=self.dtype, name="conv_logits",
            )(x).astype(jnp.float32)
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="conv_logits"
        )(x).astype(jnp.float32)


class HTCMaskHead(nn.Module):
    """HTC mask head (reference ``mask_heads/htc_mask_head.py``):
    FCNMaskHead + a 1x1 ``conv_res`` that fuses the previous stage's mask
    features (mask information flow)."""

    num_classes: int = 80
    num_convs: int = 4
    conv_channels: int = 256
    with_conv_res: bool = True
    predictor_cfg: Any = None  # NormedConv2d (seesaw normed_mask configs)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits=True,
                 return_feat=True):
        if res_feat is not None:
            assert self.with_conv_res
            # reference conv_res maps conv_out -> conv_out and adds to the
            # pooled input (equal channel counts in every shipping config);
            # target x's channels so shrunk test sizes also compose
            r = nn.Conv(
                x.shape[-1], (1, 1), dtype=self.dtype, name="conv_res"
            )(res_feat)
            x = x + nn.relu(r)
        for i in range(self.num_convs):
            x = nn.Conv(
                self.conv_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        feat = x
        outs = []
        if return_logits:
            y = nn.ConvTranspose(
                self.conv_channels, (2, 2), strides=(2, 2), dtype=self.dtype,
                name="upsample",
            )(x)
            y = nn.relu(y)
            if (self.predictor_cfg or {}).get("type") == "NormedConv2d":
                logits = _NormedConv1x1(
                    self.num_classes,
                    temperature=self.predictor_cfg.get(
                        "tempearture",
                        self.predictor_cfg.get("temperature", 20)),
                    dtype=self.dtype, name="conv_logits",
                )(y).astype(jnp.float32)
            else:
                logits = nn.Conv(
                    self.num_classes, (1, 1), dtype=self.dtype,
                    name="conv_logits",
                )(y).astype(jnp.float32)
            outs.append(logits)
        if return_feat:
            outs.append(feat)
        return outs[0] if len(outs) == 1 else tuple(outs)


class FusedSemanticHead(nn.Module):
    """HTC semantic branch (reference ``mask_heads/fused_semantic_head.py``):
    per-level lateral 1x1 convs fused (resized-sum) at ``fusion_level``,
    a conv tower, then a seg logit map and an embedding feature returned for
    RoI fusion."""

    num_classes: int = 183  # COCO-stuff
    fusion_level: int = 1
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ..layers import bilinear_resize

        ref = feats[self.fusion_level]
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{self.fusion_level}")(ref)
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"lateral_{i}")(f)
            x = x + bilinear_resize(y, ref.shape[-3:-1])
        for i in range(self.num_convs):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        embedding = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                            name="conv_embedding")(x)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="conv_seg")(x).astype(jnp.float32)
        return seg, embedding


def semantic_seg_loss(seg_logits, gt_seg, ignore_index: int = 255):
    """Pixel CE vs the stuff map (reference FusedSemanticHead.loss)."""
    c = seg_logits.shape[-1]
    gt = gt_seg.astype(jnp.int32)
    valid = (gt != ignore_index) & (gt >= 0) & (gt < c)
    safe = jnp.clip(gt, 0, c - 1)
    logp = jax.nn.log_softmax(seg_logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = -jnp.where(valid, ll, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def resample_mask_targets(
    gt_mask_crops: jnp.ndarray,  # (G, S, S) float/uint8 box-relative crops
    gt_boxes: jnp.ndarray,  # (G, 4) the boxes the crops are relative to
    roi_boxes: jnp.ndarray,  # (R, 4) sampled positive RoIs
    roi_gt_idx: jnp.ndarray,  # (R,) matched gt index
    out_size: int = 28,
) -> jnp.ndarray:
    """28x28 binary target for each RoI by bilinear-sampling its matched
    gt's box-relative crop."""
    g, s, _ = gt_mask_crops.shape
    r = roi_boxes.shape[0]
    crops = gt_mask_crops.astype(jnp.float32)[roi_gt_idx]  # (R, S, S)
    gb = gt_boxes[roi_gt_idx]  # (R, 4)
    gw = jnp.maximum(gb[:, 2] - gb[:, 0], 1e-3)
    gh = jnp.maximum(gb[:, 3] - gb[:, 1], 1e-3)
    # RoI pixel centers in image coords
    frac = (jnp.arange(out_size) + 0.5) / out_size
    rx = roi_boxes[:, 0:1] + frac[None, :] * (roi_boxes[:, 2:3] - roi_boxes[:, 0:1])
    ry = roi_boxes[:, 1:2] + frac[None, :] * (roi_boxes[:, 3:4] - roi_boxes[:, 1:2])
    # -> crop coords
    cx = (rx - gb[:, 0:1]) / gw[:, None] * s - 0.5  # (R, out)
    cy = (ry - gb[:, 1:2]) / gh[:, None] * s - 0.5

    def sample_one(crop, cxr, cyr):
        x = jnp.clip(cxr, 0.0, s - 1.0)
        y = jnp.clip(cyr, 0.0, s - 1.0)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, s - 1)
        y1 = jnp.minimum(y0 + 1, s - 1)
        lx = x - x0
        ly = y - y0
        # outer-product the per-axis samples: (out, out)
        v00 = crop[y0[:, None], x0[None, :]]
        v01 = crop[y0[:, None], x1[None, :]]
        v10 = crop[y1[:, None], x0[None, :]]
        v11 = crop[y1[:, None], x1[None, :]]
        w00 = (1 - ly)[:, None] * (1 - lx)[None, :]
        w01 = (1 - ly)[:, None] * lx[None, :]
        w10 = ly[:, None] * (1 - lx)[None, :]
        w11 = ly[:, None] * lx[None, :]
        return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11

    out = jax.vmap(sample_one)(crops, cx, cy)
    return (out >= 0.5).astype(jnp.float32)


def mask_loss(
    mask_logits: jnp.ndarray,  # (R, 28, 28, C)
    mask_targets: jnp.ndarray,  # (R, 28, 28)
    labels: jnp.ndarray,  # (R,)
    pos_mask: jnp.ndarray,  # (R,)
    loss_weight: float = 1.0,
):
    """BCE on the gt-class channel, averaged over positives (reference
    ``fcn_mask_head.py`` ``loss``)."""
    r, m, _, c = mask_logits.shape
    safe = jnp.clip(labels, 0, c - 1)
    logits = jnp.take_along_axis(
        mask_logits, safe[:, None, None, None].repeat(m, 1).repeat(m, 2), axis=-1
    )[..., 0]
    elem = L.binary_cross_entropy_loss(logits, mask_targets, reduction="none")
    posf = pos_mask.astype(jnp.float32)
    num = jnp.maximum(jnp.sum(posf), 1.0)
    return jnp.sum(elem * posf[:, None, None]) / (num * m * m) * loss_weight


class MaskIoUHead(nn.Module):
    """Mask-IoU head (Mask Scoring R-CNN; reference
    ``mmdet/models/roi_heads/mask_heads/maskiou_head.py``): predicts the IoU
    between each predicted mask and its gt, from the 14x14 RoI features
    concatenated with the 2x2-max-pooled mask prediction."""

    num_classes: int = 80
    num_convs: int = 4
    conv_channels: int = 256
    fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled, mask_pred):
        """pooled: (R, 14, 14, C); mask_pred: (R, 28, 28) sigmoid probs of
        the target class.  Returns (R, num_classes) IoU predictions."""
        mp = nn.max_pool(mask_pred[..., None], (2, 2), (2, 2))  # (R,14,14,1)
        x = jnp.concatenate([pooled, mp.astype(pooled.dtype)], -1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.Conv(
                self.conv_channels, (3, 3), (stride, stride),
                padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="fc_mask_iou")(x).astype(jnp.float32)


def mask_iou_targets(
    mask_pred: jnp.ndarray,  # (R, 28, 28) sigmoid probs of the gt class
    mask_targets: jnp.ndarray,  # (R, 28, 28) binary in-proposal gt masks
    crop_fracs: jnp.ndarray,  # (R,) fraction of the gt box covered by mask
    roi_boxes: jnp.ndarray,  # (R, 4)
    gt_boxes: jnp.ndarray,  # (R, 4) matched gt boxes
    thr: float = 0.5,
) -> jnp.ndarray:
    """IoU of the binarised prediction with the FULL gt instance
    (reference ``maskiou_head.py:get_targets``): the target grid only sees
    the in-proposal part, so the full gt area is recovered from the
    box-relative crop occupancy (``crop_fracs * gt_box_area``) converted to
    proposal-grid cells."""
    binary = (mask_pred > thr).astype(jnp.float32)
    pred_area = binary.sum((-1, -2))
    overlap = (binary * mask_targets).sum((-1, -2))
    cells = mask_pred.shape[-1] * mask_pred.shape[-2]
    roi_area = jnp.maximum(
        (roi_boxes[:, 2] - roi_boxes[:, 0]) * (roi_boxes[:, 3] - roi_boxes[:, 1]),
        1e-3,
    )
    gt_area = jnp.maximum(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]),
        1e-3,
    )
    px_per_cell = roi_area / cells
    gt_full_cells = crop_fracs * gt_area / px_per_cell
    return overlap / jnp.maximum(pred_area + gt_full_cells - overlap, 1e-7)
