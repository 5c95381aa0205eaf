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
import numpy as np
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
    def __call__(self, query, value, spatial_shapes, reference_points,
                 ref_wh=None):
        """query (Lq, C); value (S, C); reference_points (Lq, L, 2)
        normalized.  With ``ref_wh`` (Lq, 2) — 4-d box references, the
        two-stage variant — offsets are scaled by the box size instead of
        the level size (reference ``MultiScaleDeformableAttention``
        ``reference_points.shape[-1] == 4`` branch)."""
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
        if ref_wh is not None:
            locs = (
                reference_points[:, None, :, None, :]
                + off / p * ref_wh[:, None, None, None, :] * 0.5
            )
        else:
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
        """``reference_points``: (Q, 2) point refs, or (Q, 4) cxcywh box
        refs (the two-stage variant — sampling offsets scale by wh)."""
        q = tgt + qpos
        sa = MHA(self.embed_dims, self.num_heads, dtype=self.dtype,
                 name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + sa)
        refs = jnp.broadcast_to(
            reference_points[:, None, :2],
            (reference_points.shape[0], self.num_levels, 2),
        )
        ref_wh = (reference_points[:, 2:]
                  if reference_points.shape[-1] == 4 else None)
        ca = MSDeformAttnLayer(
            self.embed_dims, self.num_heads, self.num_levels,
            self.num_points, dtype=self.dtype, name="cross_attn",
        )(tgt + qpos, memory, spatial_shapes, refs, ref_wh=ref_wh)
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
    # iterative bounding-box refinement (reference deformable_detr_refine
    # config): per-layer heads, detached reference update after each layer
    with_box_refine: bool = False
    # encoder-proposal two-stage variant (deformable_detr_twostage_refine):
    # top-k encoder tokens become 4-d box references + query embeddings;
    # the encoder cls/box outputs join the loss stack as an extra aux layer
    as_two_stage: bool = False
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
        # per-layer heads when refining (the reference deep-copies the
        # branches for with_box_refine/two_stage); one shared set otherwise
        n_heads = (self.num_decoder_layers
                   if (self.with_box_refine or self.as_two_stage) else 1)

        def make_heads(i):
            cls_h = nn.Dense(
                self.num_classes, dtype=self.dtype,
                bias_init=nn.initializers.constant(-4.595),
                name=f"cls_head_{i}" if n_heads > 1 else "cls_head",
            )
            sfx = f"_{i}" if n_heads > 1 else ""
            fc1 = nn.Dense(self.embed_dims, dtype=self.dtype,
                           name=f"box_fc1{sfx}")
            fc2 = nn.Dense(self.embed_dims, dtype=self.dtype,
                           name=f"box_fc2{sfx}")
            out = nn.Dense(4, dtype=self.dtype, name=f"box_out{sfx}")
            return cls_h, (lambda t: out(
                nn.relu(fc2(nn.relu(fc1(t))))).astype(jnp.float32))

        heads = [make_heads(i) for i in range(n_heads)]

        if self.as_two_stage:
            # encoder-output proposal generation (reference
            # ``gen_encoder_output_proposals``): per-token base box with
            # level-scaled wh 0.05 * 2^lvl
            base_wh = jnp.concatenate([
                jnp.full((h_ * w_, 2), 0.05 * (2 ** lvl), jnp.float32)
                for lvl, (h_, w_) in enumerate(spatial_shapes)
            ])
            base4 = jnp.concatenate([ref_pts, base_wh], axis=-1)  # (S, 4)
            enc_norm = nn.LayerNorm(dtype=self.dtype, name="enc_output_norm")
            enc_proj = nn.Dense(self.embed_dims, dtype=self.dtype,
                                name="enc_output")
            enc_cls_head = nn.Dense(
                self.num_classes, dtype=self.dtype,
                bias_init=nn.initializers.constant(-4.595),
                name="enc_cls_head",
            )
            enc_fc1 = nn.Dense(self.embed_dims, dtype=self.dtype,
                               name="enc_box_fc1")
            enc_fc2 = nn.Dense(self.embed_dims, dtype=self.dtype,
                               name="enc_box_fc2")
            enc_out4 = nn.Dense(4, dtype=self.dtype, name="enc_box_out")
            pos_trans = nn.Dense(self.embed_dims * 2, dtype=self.dtype,
                                 name="pos_trans")
            pos_trans_norm = nn.LayerNorm(dtype=self.dtype,
                                          name="pos_trans_norm")
        else:
            query_embed = self.param(
                "query_embed", nn.initializers.normal(1.0),
                (self.num_queries, self.embed_dims * 2), jnp.float32,
            )
            ref_proj = nn.Dense(2, dtype=self.dtype, name="reference_points")
            qpos0 = query_embed[:, : self.embed_dims].astype(self.dtype)
            tgt00 = query_embed[:, self.embed_dims :].astype(self.dtype)
            qref0 = jax.nn.sigmoid(
                ref_proj(qpos0).astype(jnp.float32))  # (Q, 2)

        def proposal_pos_embed(props):
            """Sine embedding of a (Q, 4) normalized box, matching the
            reference ``get_proposal_pos_embed`` (embed_dims//2 per
            coordinate, temperature 10000)."""
            half = self.embed_dims // 2
            dim_t = jnp.arange(half // 2, dtype=jnp.float32)
            dim_t = 10000.0 ** (2 * (dim_t // 2) / (half // 2))
            x = props[:, :, None] * 2 * np.pi / dim_t[None, None, :]
            emb = jnp.stack(
                [jnp.sin(x[:, :, 0::2]), jnp.cos(x[:, :, 1::2])], axis=-1
            ).reshape(props.shape[0], -1)
            return emb  # (Q, 4 * half/2 * 2) = (Q, 2*embed)

        def single(tokens_i):
            mem = tokens_i
            for layer in enc_layers:
                mem = layer(mem, pos, spatial_shapes, enc_refs)

            enc_extra = None
            if self.as_two_stage:
                memp = enc_norm(enc_proj(mem))
                enc_cls = enc_cls_head(memp).astype(jnp.float32)  # (S, C)
                enc_delta = enc_out4(
                    nn.relu(enc_fc2(nn.relu(enc_fc1(memp))))
                ).astype(jnp.float32)
                props = jax.nn.sigmoid(enc_delta + inverse_sigmoid(base4))
                # reference: top-k by class-0 logit
                _, topk = jax.lax.top_k(enc_cls[:, 0], self.num_queries)
                sel = jax.lax.stop_gradient(props[topk])  # (Q, 4)
                qref = sel
                pe = proposal_pos_embed(sel.astype(jnp.float32))
                qmix = pos_trans_norm(pos_trans(pe.astype(self.dtype)))
                qpos = qmix[:, : self.embed_dims]
                tgt = qmix[:, self.embed_dims:]
                enc_extra = (enc_cls[topk], props[topk])
            else:
                qref = qref0
                qpos, tgt = qpos0, tgt00

            outs_cls, outs_box = [], []
            for li, layer in enumerate(dec_layers):
                tgt = layer(tgt, qpos, mem, spatial_shapes, qref)
                cls_h, box_fn = heads[li if n_heads > 1 else 0]
                cls = cls_h(tgt).astype(jnp.float32)
                delta = box_fn(tgt)
                inv = inverse_sigmoid(qref)
                xy = jax.nn.sigmoid(delta[:, :2] + inv[:, :2])
                if qref.shape[-1] == 4:
                    wh = jax.nn.sigmoid(delta[:, 2:] + inv[:, 2:])
                else:
                    wh = jax.nn.sigmoid(delta[:, 2:])
                box = jnp.concatenate([xy, wh], axis=-1)
                outs_cls.append(cls)
                outs_box.append(box)
                if self.with_box_refine or self.as_two_stage:
                    # detached iterative refinement (reference decoder
                    # ``reference_points = new_reference_points.detach()``)
                    qref = jax.lax.stop_gradient(
                        box if qref.shape[-1] == 4 else xy)
            if enc_extra is not None:
                # the encoder stage joins as the first (aux) layer of the
                # loss stack (mmdet weights enc losses like aux losses)
                outs_cls = [enc_extra[0]] + outs_cls
                outs_box = [enc_extra[1]] + outs_box
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
