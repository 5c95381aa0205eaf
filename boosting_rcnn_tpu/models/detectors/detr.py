"""DETR: end-to-end set-prediction detector.

Spec: reference ``mmdet/models/detectors/detr.py`` +
``mmdet/models/dense_heads/detr_head.py`` + ``models/utils/transformer.py``
(standard, non-deformable attention): ResNet C5 -> 1x1 projection, sine
positional encoding, 6-layer transformer encoder + 6-layer decoder over 100
learned queries, FFN heads predicting class logits and normalised cxcywh
boxes, Hungarian-matched CE + L1 + GIoU loss, no NMS at test (top-k scores).

TPU notes: attention over the flattened C5 map (H/32 * W/32 tokens — e.g.
25*42=1050 at 800x1344) is a handful of plain MXU matmuls; the Hungarian
match runs per image inside jit via optax's bipartite matcher on a fixed
(Q, G_max) cost with padded gts masked by a prohibitive cost.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops, losses as L
from ...ops.assigners import hungarian_assign


def sine_positional_encoding(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2-D sine embedding (reference ``positional_encoding.py``)."""
    half = dim // 2
    y = np.arange(h, dtype=np.float32)[:, None, None] + 1.0
    x = np.arange(w, dtype=np.float32)[None, :, None] + 1.0
    scale = 2 * np.pi
    y = y / h * scale
    x = x / w * scale
    dim_t = temperature ** (2 * (np.arange(half, dtype=np.float32) // 2) / half)
    pos_x = x / dim_t
    pos_y = y / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], -1).reshape(
        1, w, -1
    )
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], -1).reshape(
        h, 1, -1
    )
    pos = np.concatenate(
        [np.broadcast_to(pos_y, (h, w, half)), np.broadcast_to(pos_x, (h, w, half))],
        axis=-1,
    )
    return pos.reshape(h * w, dim).astype(np.float32)


class MHA(nn.Module):
    dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        hd = self.dim // self.heads

        def proj(x, name):
            return nn.Dense(self.dim, dtype=self.dtype, name=name)(x).reshape(
                x.shape[0], self.heads, hd
            )

        qh, kh, vh = proj(q, "q"), proj(k, "k"), proj(v, "v")
        attn = jnp.einsum("qhd,khd->hqk", qh, kh) / jnp.sqrt(hd).astype(q.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("hqk,khd->qhd", attn, vh).reshape(q.shape[0], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class EncoderLayer(nn.Module):
    dim: int
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        y = MHA(self.dim, dtype=self.dtype, name="self_attn")(x + pos, x + pos, x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + y)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(jax.nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class DecoderLayer(nn.Module):
    dim: int
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, mem, qpos, mpos):
        y = MHA(self.dim, dtype=self.dtype, name="self_attn")(q + qpos, q + qpos, q)
        q = nn.LayerNorm(dtype=self.dtype, name="norm1")(q + y)
        y = MHA(self.dim, dtype=self.dtype, name="cross_attn")(
            q + qpos, mem + mpos, mem
        )
        q = nn.LayerNorm(dtype=self.dtype, name="norm2")(q + y)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(q)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(jax.nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(q + y)


class DETRNet(nn.Module):
    backbone: nn.Module
    num_classes: int = 80
    num_queries: int = 100
    dim: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """Returns (cls_logits (B, Q, C+1), boxes (B, Q, 4) normalised
        cxcywh in [0, 1])."""
        c5 = self.backbone(images)[-1]  # (B, H, W, C)
        b, h, w, _ = c5.shape
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="input_proj")(c5)
        tokens = x.reshape(b, h * w, self.dim)
        pos = jnp.asarray(sine_positional_encoding(h, w, self.dim), x.dtype)

        queries = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.dim), jnp.float32,
        ).astype(x.dtype)

        enc_layers = [
            EncoderLayer(self.dim, dtype=self.dtype, name=f"enc{i}")
            for i in range(self.enc_layers)
        ]
        dec_layers = [
            DecoderLayer(self.dim, dtype=self.dtype, name=f"dec{i}")
            for i in range(self.dec_layers)
        ]
        cls_head = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")
        box_mlp = [
            nn.Dense(self.dim, dtype=self.dtype, name=f"fc_reg{i}") for i in range(2)
        ] + [nn.Dense(4, dtype=self.dtype, name="fc_reg_out")]

        def single(tokens_i):
            mem = tokens_i
            for layer in enc_layers:
                mem = layer(mem, pos)
            q = jnp.zeros_like(queries)
            for layer in dec_layers:
                q = layer(q, mem, queries, pos)
            cls = cls_head(q)
            y = q
            for i, fc in enumerate(box_mlp):
                y = fc(jax.nn.relu(y) if i > 0 else y)
            boxes = jax.nn.sigmoid(y.astype(jnp.float32))
            return cls.astype(jnp.float32), boxes

        return jax.vmap(single)(tokens)


@dataclasses.dataclass(frozen=True)
class DETRCfg:
    num_classes: int = 80
    num_queries: int = 100
    cls_weight: float = 1.0
    bbox_weight: float = 5.0
    iou_weight: float = 2.0
    bg_cls_weight: float = 0.1


def _cxcywh_to_xyxy(b, img_shape):
    h = img_shape[..., 0:1]
    w = img_shape[..., 1:2]
    cx = b[..., 0] * w[..., 0]
    cy = b[..., 1] * h[..., 0]
    bw = b[..., 2] * w[..., 0]
    bh = b[..., 3] * h[..., 0]
    return jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)


class DETRDetector:
    def __init__(self, net: DETRNet, cfg: DETRCfg, max_per_img: int = 100):
        self.net = net
        self.cfg = cfg
        self.max_per_img = max_per_img

    def anchors_for(self, canvas_hw):
        return jnp.zeros((0, 4)), ()  # API parity; DETR has no priors

    def init(self, rng, canvas_hw, batch_size: int = 1):
        return self.net.init(rng, jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32))

    def loss(self, variables, rng, batch, anchors=None, num_level_anchors=None,
             anchor_valid=None, axis_name=None):
        cfg = self.cfg
        cls, boxes_n = self.net.apply(variables, batch["images"])
        b, q, c1 = cls.shape

        def one(cls_i, boxes_i, gb, gl, gm, shp):
            pred_xyxy = _cxcywh_to_xyxy(boxes_i, shp)
            assign = hungarian_assign(
                cls_i, pred_xyxy, gb, gl, gm, shp,
                cls_weight=cfg.cls_weight, bbox_weight=cfg.bbox_weight,
                iou_weight=cfg.iou_weight,
            )
            pos = assign.gt_inds > 0
            g = gb.shape[0]
            safe = jnp.clip(assign.gt_inds - 1, 0, g - 1)
            labels = jnp.where(pos, assign.labels, cfg.num_classes)
            matched = gb[safe]
            # CE with down-weighted background (reference bg_cls_weight 0.1)
            wts = jnp.where(pos, 1.0, cfg.bg_cls_weight)
            ce = L.cross_entropy_loss(cls_i, labels, weight=wts, reduction="none")
            # box losses on matched pairs, normalised coords for L1
            h, w = shp[0], shp[1]
            norm = jnp.stack([w, h, w, h]).astype(jnp.float32)
            safe_t = jnp.where(pos[:, None], matched, pred_xyxy)
            l1 = jnp.sum(
                jnp.abs(pred_xyxy / norm - safe_t / norm), -1
            ) * pos.astype(jnp.float32)
            giou = (
                1.0
                - box_ops.bbox_overlaps_aligned(pred_xyxy, safe_t, mode="giou")
            ) * pos.astype(jnp.float32)
            return ce, l1, giou, pos

        ce, l1, giou, pos = jax.vmap(one)(
            cls, boxes_n, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_mask"], batch["img_shape"],
        )
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        cls_avg = jnp.maximum(
            jnp.sum(jnp.where(pos, 1.0, cfg.bg_cls_weight)), 1.0
        )
        return {
            "loss_cls": jnp.sum(ce) / cls_avg * cfg.cls_weight,
            "loss_bbox": jnp.sum(l1) / num_pos * cfg.bbox_weight,
            "loss_iou": jnp.sum(giou) / num_pos * cfg.iou_weight,
        }

    def predict(self, variables, batch, anchors=None, num_level_anchors=None,
                rescale=True):
        cfg = self.cfg
        cls, boxes_n = self.net.apply(variables, batch["images"])
        b, q, c1 = cls.shape
        probs = jax.nn.softmax(cls, axis=-1)[..., : cfg.num_classes]

        def one(p, bx, shp, sf):
            flat = p.reshape(-1)
            k = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            qi = idx // cfg.num_classes
            li = idx % cfg.num_classes
            boxes = _cxcywh_to_xyxy(bx[qi], shp)
            if rescale:
                boxes = boxes / sf.reshape(1, 4)
            dets = jnp.concatenate([boxes, top[:, None]], -1)
            return dets, li.astype(jnp.int32), jnp.ones((k,), bool)

        return jax.vmap(one)(
            probs, boxes_n, batch["img_shape"], batch["scale_factor"]
        )
