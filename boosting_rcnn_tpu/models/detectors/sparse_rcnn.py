"""Sparse R-CNN: end-to-end detection with learnable proposals.

Spec (behavior re-derived, not ported): reference
``mmdet/models/detectors/sparse_rcnn.py`` +
``mmdet/models/dense_heads/embedding_rpn_head.py`` (learned (P, 4) cxcywh
boxes in [0, 1] scaled by the per-image valid w/h, plus (P, C) proposal
features) + ``mmdet/models/roi_heads/sparse_roi_head.py`` /
``bbox_heads/dii_head.py`` (6 iterative Dynamic Instance Interactive stages:
self-attention over proposal features, DynamicConv interaction with the 7x7
RoI features, FFN, then sigmoid-focal cls + class-agnostic box deltas decoded
with stds (0.5, 0.5, 1, 1) and no border clip) +
``models/utils/transformer.py:1055`` (DynamicConv).  Training matches
proposals to gts per stage with a Hungarian assigner (focal cls cost 2.0 +
normalised-xyxy L1 cost 5.0 + GIoU cost 2.0); losses are sigmoid focal (2.0),
L1 on whwh-normalised boxes (5.0) and GIoU (2.0), all averaged by the global
matched count.  Test is NMS-free top-k over the flattened sigmoid scores.

TPU notes: everything is static-shape by construction (P proposals, 6
unrolled stages); the per-stage compute is pure MXU matmuls (attention,
DynamicConv bmm's, FFN) over (B, P, C) with P=100 — the Hungarian match runs
in-jit via optax's solver on a fixed (P, G_max) cost with padded gts masked
by a prohibitive cost, exactly as the DETR head does.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import hungarian_assign
from ...ops.roi_align import multilevel_roi_align_fast


class BatchedMHA(nn.Module):
    """Self-attention over the proposal axis, batched over images."""

    dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, P, C)
        hd = self.dim // self.heads

        def proj(name):
            return nn.Dense(self.dim, dtype=self.dtype, name=name)(x).reshape(
                *x.shape[:2], self.heads, hd
            )

        q, k, v = proj("q"), proj("k"), proj("v")
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape[:2], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class DynamicConv(nn.Module):
    """Per-proposal generated 1x1 convs applied to the RoI feature as two
    bmm's (reference DynamicConv ``transformer.py:1111-1150``)."""

    in_channels: int = 256
    feat_channels: int = 64
    roi_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, param_feat, roi_feat):
        # param_feat (B, P, C); roi_feat (B, P, S*S, C)
        cin, f = self.in_channels, self.feat_channels
        params = nn.Dense(cin * f + f * cin, dtype=self.dtype, name="dynamic")(
            param_feat
        )
        p_in = params[..., : cin * f].reshape(*params.shape[:2], cin, f)
        p_out = params[..., cin * f :].reshape(*params.shape[:2], f, cin)
        y = jnp.einsum("bpsc,bpcf->bpsf", roi_feat, p_in)
        y = nn.relu(nn.LayerNorm(dtype=self.dtype, name="norm_in")(y))
        y = jnp.einsum("bpsf,bpfc->bpsc", y, p_out)
        y = nn.relu(nn.LayerNorm(dtype=self.dtype, name="norm_out")(y))
        y = y.reshape(*y.shape[:2], self.roi_size**2 * cin)
        y = nn.Dense(cin, dtype=self.dtype, name="fc")(y)
        return nn.relu(nn.LayerNorm(dtype=self.dtype, name="fc_norm")(y))


class DIIHead(nn.Module):
    """One Dynamic Instance Interactive stage (reference ``dii_head.py``)."""

    num_classes: int = 80
    dim: int = 256
    heads: int = 8
    ffn_dim: int = 2048
    dyn_feat_channels: int = 64
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    roi_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, prop_feat, roi_feat):
        x = prop_feat  # (B, P, C)
        x = nn.LayerNorm(dtype=self.dtype, name="attn_norm")(
            x + BatchedMHA(self.dim, self.heads, self.dtype, name="attn")(x)
        )
        iic = DynamicConv(
            self.dim, self.dyn_feat_channels, self.roi_size, self.dtype,
            name="dynamic_conv",
        )(x, roi_feat)
        x = nn.LayerNorm(dtype=self.dtype, name="iic_norm")(x + iic)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(nn.relu(h))
        x = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")(x + h)

        cls_feat, reg_feat = x, x
        for i in range(self.num_cls_fcs):
            cls_feat = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                name=f"cls_fc{i}")(cls_feat)
            cls_feat = nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"cls_ln{i}")(cls_feat))
        for i in range(self.num_reg_fcs):
            reg_feat = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                name=f"reg_fc{i}")(reg_feat)
            reg_feat = nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"reg_ln{i}")(reg_feat))
        cls = nn.Dense(
            self.num_classes, dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595), name="fc_cls",
        )(cls_feat)
        deltas = nn.Dense(4, dtype=self.dtype, name="fc_reg")(reg_feat)
        return cls.astype(jnp.float32), deltas.astype(jnp.float32), x


class SparseRCNNNet(nn.Module):
    """Full Sparse R-CNN forward: feats -> P learned proposals -> N DII
    stages, returning per-stage (cls logits, decoded boxes)."""

    backbone: nn.Module
    neck: nn.Module
    num_classes: int = 80
    num_proposals: int = 100
    num_stages: int = 6
    dim: int = 256
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    roi_size: int = 7
    target_stds: Tuple[float, ...] = (0.5, 0.5, 1.0, 1.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, img_shape):
        # img_shape (B, 2): valid (H, W) per image for proposal init
        feats = self.neck(self.backbone(images))
        b = images.shape[0]

        init_boxes = self.param(
            "init_proposal_bboxes",
            lambda k: jnp.tile(jnp.asarray([0.5, 0.5, 1.0, 1.0]),
                               (self.num_proposals, 1)),
        )  # (P, 4) cxcywh in [0, 1]
        init_feat = self.param(
            "init_proposal_features",
            nn.initializers.normal(1.0),
            (self.num_proposals, self.dim),
        )
        hs = img_shape[:, 0].astype(jnp.float32)
        ws = img_shape[:, 1].astype(jnp.float32)
        whwh = jnp.stack([ws, hs, ws, hs], -1)[:, None, :]  # (B, 1, 4)
        cx, cy, pw, ph = (init_boxes[:, i] for i in range(4))
        xyxy = jnp.stack(
            [cx - pw / 2, cy - ph / 2, cx + pw / 2, cy + ph / 2], -1
        )[None]  # (1, P, 4)
        boxes = xyxy * whwh  # (B, P, 4) absolute
        prop_feat = jnp.broadcast_to(
            init_feat[None], (b, self.num_proposals, self.dim)
        ).astype(self.dtype)

        stage_cls, stage_boxes = [], []
        for s in range(self.num_stages):
            roi = jax.vmap(
                lambda fl, rb: multilevel_roi_align_fast(
                    fl, rb, jnp.ones((rb.shape[0],), bool), self.roi_strides,
                    out_size=self.roi_size, finest_scale=56,
                )
            )(feats, boxes)  # (B, P, S, S, C)
            roi = roi.reshape(b, self.num_proposals, self.roi_size**2, -1)
            cls, deltas, prop_feat = DIIHead(
                num_classes=self.num_classes, dim=self.dim,
                roi_size=self.roi_size, dtype=self.dtype, name=f"stage{s}",
            )(prop_feat, roi.astype(self.dtype))
            boxes = box_ops.delta2bbox(
                boxes, deltas, stds=self.target_stds, clip_border=False
            )
            stage_cls.append(cls)
            stage_boxes.append(boxes)
            # the next stage consumes the refined boxes as constants
            # (reference detaches the per-stage proposal list)
            boxes = jax.lax.stop_gradient(boxes)
        return tuple(stage_cls), tuple(stage_boxes)


@dataclasses.dataclass(frozen=True)
class SparseRCNNCfg:
    num_classes: int = 80
    num_proposals: int = 100
    num_stages: int = 6
    cls_weight: float = 2.0
    bbox_weight: float = 5.0
    iou_weight: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


class SparseRCNNDetector:
    def __init__(self, net: SparseRCNNNet, cfg: SparseRCNNCfg,
                 max_per_img: int = 100):
        self.net = net
        self.cfg = cfg
        self.max_per_img = max_per_img

    def anchors_for(self, canvas_hw):
        return jnp.zeros((0,)), (self.cfg.num_proposals,)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        shp = jnp.tile(jnp.asarray([canvas_hw], jnp.int32), (batch_size, 1))
        return self.net.init(rng, images, shp)

    def _stage_loss(self, cls, boxes, batch, axis_name):
        """Hungarian match + focal/L1/GIoU losses for one stage."""
        cfg = self.cfg

        def assign_one(c, bx, gb, gl, gm, shp):
            return hungarian_assign(
                c, bx, gb, gl, gm, shp.astype(jnp.float32),
                cls_weight=cfg.cls_weight, bbox_weight=cfg.bbox_weight,
                iou_weight=cfg.iou_weight, cls_cost_type="focal",
                focal_alpha=cfg.focal_alpha, focal_gamma=cfg.focal_gamma,
            )

        assign = jax.vmap(assign_one)(
            cls, boxes, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_mask"], batch["img_shape"],
        )
        pos = assign.gt_inds > 0  # (B, P)
        safe = jnp.clip(assign.gt_inds - 1, 0, batch["gt_bboxes"].shape[1] - 1)
        tgt_boxes = jnp.take_along_axis(
            batch["gt_bboxes"], safe[..., None], axis=1
        )
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        if axis_name is not None:
            num_pos = jnp.maximum(
                jax.lax.pmean(jnp.sum(pos.astype(jnp.float32)), axis_name), 1.0
            )
        onehot = jax.nn.one_hot(
            jnp.where(pos, assign.labels, cfg.num_classes), cfg.num_classes
        )
        # cls averages over all proposals' matched count (reference
        # avg_factor=num matched), bbox terms over matched only
        loss_cls = L.sigmoid_focal_loss(
            cls.reshape(-1, cfg.num_classes), onehot.reshape(-1, cfg.num_classes),
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_pos,
        )
        hs = batch["img_shape"][:, 0].astype(jnp.float32)
        ws = batch["img_shape"][:, 1].astype(jnp.float32)
        whwh = jnp.stack([ws, hs, ws, hs], -1)[:, None, :]
        w = pos.astype(jnp.float32)[..., None]
        loss_bbox = L.l1_loss(boxes / whwh, tgt_boxes / whwh, weight=w,
                              avg_factor=num_pos * 4)
        giou = box_ops.bbox_overlaps_aligned(
            boxes.reshape(-1, 4), tgt_boxes.reshape(-1, 4), mode="giou"
        )
        loss_iou = jnp.sum((1 - giou) * pos.reshape(-1)) / num_pos
        return {
            "loss_cls": loss_cls * cfg.cls_weight,
            "loss_bbox": loss_bbox * cfg.bbox_weight,
            "loss_iou": loss_iou * cfg.iou_weight,
        }

    def loss(self, variables, rng, batch, pack, num_level, anchor_valid=None,
             axis_name=None):
        stage_cls, stage_boxes = self.net.apply(
            variables, batch["images"], batch["img_shape"]
        )
        out = {}
        for s, (c, bx) in enumerate(zip(stage_cls, stage_boxes)):
            for k, v in self._stage_loss(c, bx, batch, axis_name).items():
                out[f"s{s}.{k}"] = v
        return out

    def predict(self, variables, batch, pack, num_level, rescale=True):
        stage_cls, stage_boxes = self.net.apply(
            variables, batch["images"], batch["img_shape"]
        )
        cls, boxes = stage_cls[-1], stage_boxes[-1]
        cfg = self.cfg

        k = min(self.max_per_img, cfg.num_proposals * cfg.num_classes)

        def one(c, bx, sf):
            scores = jax.nn.sigmoid(c).reshape(-1)  # (P*C,)
            top, idx = jax.lax.top_k(scores, k)
            pidx = idx // cfg.num_classes
            labels = (idx % cfg.num_classes).astype(jnp.int32)
            b_sel = bx[pidx]
            if rescale:
                b_sel = b_sel / sf.reshape(1, 4)
            dets = jnp.concatenate([b_sel, top[:, None]], -1)
            return dets, labels, top > 0.0

        return jax.vmap(one)(cls, boxes, batch["scale_factor"])
