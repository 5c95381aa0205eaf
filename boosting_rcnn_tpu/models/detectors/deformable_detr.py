"""Deformable DETR (reference ``mmdet/models/detectors/deformable_detr.py``
+ ``models/utils/transformer.py`` DeformableDetrTransformer +
``dense_heads/deformable_detr_head.py``).

Multi-scale deformable attention replaces dense attention: the encoder
refines the flattened C3-C5(+extra) feature tokens with per-token
deformable self-attention (reference points = own pixel centers), the
decoder's 300 queries cross-attend via learned per-query reference points,
and per-layer FFN heads predict sigmoid-space cxcywh boxes refined around
the reference (inverse-sigmoid residual).  Losses: focal-cost Hungarian
matching + focal cls / normalised L1 / GIoU, with auxiliary losses on
every decoder layer.

Documented deviation: the padded-canvas valid-ratio machinery is dropped —
batches here share one padded canvas and sampling outside the image reads
zero padding (same effect as the reference's masked attention)."""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import hungarian_assign
from ...ops.ms_deform_attn import ms_deform_attn


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MSDeformAttnLayer(nn.Module):
    """Offset/weight projection + the sampling op (reference
    ``MultiScaleDeformableAttention``)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value, spatial_shapes, reference_points):
        """query (Lq, C); value (S, C); reference_points (Lq, L, 2)
        normalized."""
        h, lv, p = self.num_heads, self.num_levels, self.num_points
        lq = query.shape[0]
        off = nn.Dense(h * lv * p * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="sampling_offsets")(query)
        off = off.reshape(lq, h, lv, p, 2).astype(jnp.float32)
        aw = nn.Dense(h * lv * p, dtype=self.dtype,
                      name="attention_weights")(query)
        aw = jax.nn.softmax(
            aw.reshape(lq, h, lv * p).astype(jnp.float32), axis=-1
        ).reshape(lq, h, lv, p)
        v = nn.Dense(self.embed_dims, dtype=self.dtype, name="value_proj")(
            value
        )
        # offset normalizer: (w_l, h_l) per level
        normalizer = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], jnp.float32
        )  # (L, 2)
        locs = (
            reference_points[:, None, :, None, :]
            + off / normalizer[None, None, :, None, :]
        )  # (Lq, H, L, P, 2)
        out = ms_deform_attn(v, spatial_shapes, locs, aw, h)
        return nn.Dense(self.embed_dims, dtype=self.dtype,
                        name="output_proj")(out)


class FFN(nn.Module):
    embed_dims: int = 256
    ffn_dims: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.ffn_dims, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        return x + y


class EncoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    ffn_dims: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, spatial_shapes, reference_points):
        q = src + pos
        attn = MSDeformAttnLayer(
            self.embed_dims, self.num_heads, self.num_levels,
            self.num_points, dtype=self.dtype, name="self_attn",
        )(q, src, spatial_shapes, reference_points)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + attn)
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            FFN(self.embed_dims, self.ffn_dims, dtype=self.dtype,
                name="ffn")(src)
        )
        return src


class MHA(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="mha"
        )(q[None], k[None], v[None])[0]


class DecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    ffn_dims: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, qpos, memory, spatial_shapes, reference_points):
        q = tgt + qpos
        sa = MHA(self.embed_dims, self.num_heads, dtype=self.dtype,
                 name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + sa)
        refs = jnp.broadcast_to(
            reference_points[:, None, :],
            (reference_points.shape[0], self.num_levels, 2),
        )
        ca = MSDeformAttnLayer(
            self.embed_dims, self.num_heads, self.num_levels,
            self.num_points, dtype=self.dtype, name="cross_attn",
        )(tgt + qpos, memory, spatial_shapes, refs)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + ca)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            FFN(self.embed_dims, self.ffn_dims, dtype=self.dtype,
                name="ffn")(tgt)
        )
        return tgt


class DeformableDETRNet(nn.Module):
    backbone: nn.Module
    neck: nn.Module  # ChannelMapper to embed_dims over C3..C5
    num_classes: int = 80
    embed_dims: int = 256
    num_queries: int = 300
    num_heads: int = 8
    num_points: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dims: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """Returns per-decoder-layer (cls (B, Lr, Q, C), boxes_cxcywh_norm
        (B, Lr, Q, 4))."""
        from .detr import sine_positional_encoding

        feats = self.neck(self.backbone(images))
        # extra stride-2 level from the last map (reference ChannelMapper
        # extra conv on C5)
        extra = nn.Conv(
            self.embed_dims, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="extra_conv",
        )(feats[-1])
        feats = tuple(feats) + (extra,)
        nl = len(feats)
        b = images.shape[0]
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in feats]

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (nl, self.embed_dims), jnp.float32,
        )
        tokens, poss, refs = [], [], []
        for lvl, f in enumerate(feats):
            hh, ww = f.shape[1], f.shape[2]
            tokens.append(f.reshape(b, hh * ww, self.embed_dims))
            pos = sine_positional_encoding(hh, ww, self.embed_dims)
            poss.append(
                pos.reshape(hh * ww, self.embed_dims)
                + level_embed[lvl][None, :]
            )
            ys = (jnp.arange(hh) + 0.5) / hh
            xs = (jnp.arange(ww) + 0.5) / ww
            ref = jnp.stack(
                [jnp.tile(xs, hh), jnp.repeat(ys, ww)], axis=-1
            )
            refs.append(ref)
        src = jnp.concatenate(tokens, axis=1)  # (B, S, C)
        pos = jnp.concatenate(poss, axis=0)  # (S, C)
        ref_pts = jnp.concatenate(refs, axis=0)  # (S, 2)
        enc_refs = jnp.broadcast_to(
            ref_pts[:, None, :], (ref_pts.shape[0], nl, 2)
        )

        enc_layers = [
            EncoderLayer(self.embed_dims, self.num_heads, nl,
                         self.num_points, self.ffn_dims, dtype=self.dtype,
                         name=f"enc_{i}")
            for i in range(self.num_encoder_layers)
        ]
        dec_layers = [
            DecoderLayer(self.embed_dims, self.num_heads, nl,
                         self.num_points, self.ffn_dims, dtype=self.dtype,
                         name=f"dec_{i}")
            for i in range(self.num_decoder_layers)
        ]
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.embed_dims * 2), jnp.float32,
        )
        ref_proj = nn.Dense(2, dtype=self.dtype, name="reference_points")
        cls_head = nn.Dense(
            self.num_classes, dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595), name="cls_head",
        )
        box_fc1 = nn.Dense(self.embed_dims, dtype=self.dtype, name="box_fc1")
        box_fc2 = nn.Dense(self.embed_dims, dtype=self.dtype, name="box_fc2")
        box_out = nn.Dense(4, dtype=self.dtype, name="box_out")

        qpos = query_embed[:, : self.embed_dims].astype(self.dtype)
        tgt0 = query_embed[:, self.embed_dims :].astype(self.dtype)
        qref = jax.nn.sigmoid(ref_proj(qpos).astype(jnp.float32))  # (Q, 2)

        def single(tokens_i):
            mem = tokens_i
            for layer in enc_layers:
                mem = layer(mem, pos, spatial_shapes, enc_refs)
            tgt = tgt0
            outs_cls, outs_box = [], []
            for layer in dec_layers:
                tgt = layer(tgt, qpos, mem, spatial_shapes, qref)
                cls = cls_head(tgt).astype(jnp.float32)
                delta = box_out(
                    nn.relu(box_fc2(nn.relu(box_fc1(tgt))))
                ).astype(jnp.float32)
                xy = jax.nn.sigmoid(
                    delta[:, :2] + inverse_sigmoid(qref)
                )
                wh = jax.nn.sigmoid(delta[:, 2:])
                outs_cls.append(cls)
                outs_box.append(jnp.concatenate([xy, wh], axis=-1))
            return jnp.stack(outs_cls), jnp.stack(outs_box)

        cls_all, box_all = jax.vmap(single)(src)
        return cls_all, box_all  # (B, Lr, Q, C), (B, Lr, Q, 4)


@dataclasses.dataclass(frozen=True)
class DeformableDETRCfg:
    num_classes: int = 80
    cls_weight: float = 2.0
    bbox_weight: float = 5.0
    iou_weight: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25


def _cxcywh_to_xyxy(b, img_shape):
    h, w = img_shape[0], img_shape[1]
    cx = b[..., 0] * w
    cy = b[..., 1] * h
    bw = b[..., 2] * w
    bh = b[..., 3] * h
    return jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    )


class DeformableDETRDetector:
    def __init__(self, net: DeformableDETRNet, cfg: DeformableDETRCfg,
                 max_per_img: int = 100):
        self.net = net
        self.cfg = cfg
        self.max_per_img = max_per_img

    def anchors_for(self, canvas_hw):
        return jnp.zeros((0, 4)), ()

    def init(self, rng, canvas_hw, batch_size: int = 1):
        return self.net.init(
            rng, jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        )

    def loss(self, variables, rng, batch, anchors=None,
             num_level_anchors=None, anchor_valid=None, axis_name=None):
        cfg = self.cfg
        cls_all, box_all = self.net.apply(variables, batch["images"])
        b, nlayers, q, c = cls_all.shape

        def one_layer(cls_i, boxes_i, gb, gl, gm, shp):
            pred_xyxy = _cxcywh_to_xyxy(boxes_i, shp)
            assign = hungarian_assign(
                cls_i, pred_xyxy, gb, gl, gm, shp,
                cls_weight=cfg.cls_weight, bbox_weight=cfg.bbox_weight,
                iou_weight=cfg.iou_weight, cls_cost_type="focal",
            )
            pos = assign.gt_inds > 0
            g = gb.shape[0]
            safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
            labels = jnp.where(pos, assign.labels, cfg.num_classes)
            matched = gb[safe]
            onehot = L.one_hot_targets(labels, cfg.num_classes)
            focal = L.sigmoid_focal_loss(
                cls_i, onehot, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
                reduction="none",
            ).sum(-1)
            h, w = shp[0], shp[1]
            norm = jnp.stack([w, h, w, h]).astype(jnp.float32)
            safe_t = jnp.where(pos[:, None], matched, pred_xyxy)
            l1 = jnp.sum(
                jnp.abs(pred_xyxy / norm - safe_t / norm), -1
            ) * pos.astype(jnp.float32)
            giou = (
                1.0
                - box_ops.bbox_overlaps_aligned(
                    pred_xyxy, jax.lax.stop_gradient(safe_t), mode="giou"
                )
            ) * pos.astype(jnp.float32)
            return focal, l1, giou, pos

        losses = {}
        for li in range(nlayers):
            focal, l1, giou, pos = jax.vmap(one_layer)(
                cls_all[:, li], box_all[:, li], batch["gt_bboxes"],
                batch["gt_labels"], batch["gt_mask"], batch["img_shape"],
            )
            num_pos = jnp.sum(pos.astype(jnp.float32))
            if axis_name is not None:
                num_pos = jax.lax.pmean(num_pos, axis_name)
            num_pos = jnp.maximum(num_pos, 1.0)
            sfx = "" if li == nlayers - 1 else f"_aux{li}"
            losses[f"loss_cls{sfx}"] = (
                cfg.cls_weight * jnp.sum(focal) / num_pos
            )
            losses[f"loss_bbox{sfx}"] = (
                cfg.bbox_weight * jnp.sum(l1) / num_pos
            )
            losses[f"loss_iou{sfx}"] = (
                cfg.iou_weight * jnp.sum(giou) / num_pos
            )
        return losses

    def predict(self, variables, batch, anchors=None,
                num_level_anchors=None, rescale=True):
        cfg = self.cfg
        cls_all, box_all = self.net.apply(variables, batch["images"])
        cls = cls_all[:, -1]
        boxes_n = box_all[:, -1]
        probs = jax.nn.sigmoid(cls)

        def one(p, bx, shp, sf):
            flat = p.reshape(-1)
            k = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            qi = idx // cfg.num_classes
            li = idx % cfg.num_classes
            boxes = _cxcywh_to_xyxy(bx[qi], shp)
            boxes = box_ops.clip_boxes(boxes, shp)
            if rescale:
                boxes = boxes / sf.reshape(1, 4)
            dets = jnp.concatenate([boxes, top[:, None]], -1)
            return dets, li.astype(jnp.int32), jnp.ones((k,), bool)

        return jax.vmap(one)(
            probs, boxes_n, batch["img_shape"], batch["scale_factor"]
        )
