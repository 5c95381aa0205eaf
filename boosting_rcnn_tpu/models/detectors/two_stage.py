"""Two-stage detector assembly (Boosting R-CNN / Faster R-CNN).

Reference surface being rebuilt: ``mmdet/models/detectors/two_stage.py``
(``extract_feat:65``, ``forward_train:90``, ``simple_test:171``) wired per
``configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py``.

TPU design: one flax module holds all networks; a thin orchestrator
(`TwoStageDetector`) owns the static anchor constants and the pure loss /
predict functions, each of which is a single jit-able fixed-shape program
over the whole batch (no per-image python loops).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.anchors import AnchorGenerator
from ...ops.roi_align import multilevel_roi_align, multilevel_roi_align_fast
from ..dense_heads.atss_rpn_head import (
    ATSSRPNCfg,
    ATSSRPNConvs,
    atss_rpn_loss,
    atss_rpn_proposals,
    flatten_levels,
)
from ..dense_heads.rpn_head import RPNConvs, rpn_loss, rpn_proposals, RPNCfg
from ..roi_heads.bbox_head import (
    BBoxHeadCfg,
    ConvFCBBoxHead,
    bbox_head_decode,
    bbox_head_loss,
    bbox_targets,
)
from ..roi_heads.prob_roi_head import (
    ProbRoICfg,
    RoISample,
    dynamic_rcnn_batch_stats,
    prob_fuse_scores,
    prob_roi_loss,
    sample_rois,
    sample_rois_dynamic,
)


@dataclasses.dataclass(frozen=True)
class ProposalCfg:
    nms_pre: int = 1000
    max_per_img: int = 256
    nms_iou_thr: float = 0.7
    min_bbox_size: float = 0.0
    # opt-in TPU approximate per-level top-nms_pre (ops/topk.py): a
    # documented deviation from the reference's exact top-k, measured
    # recall 0.9937 at target 0.95 (scripts/tpu_topk_microbench.py)
    approx_topk: bool = False
    # recall target for the approximate path (lax.approx_max_k); only
    # consulted when approx_topk is True
    topk_recall_target: float = 0.95


@dataclasses.dataclass(frozen=True)
class RCNNTestCfg:
    score_thr: float = 0.05
    nms_iou_thr: float = 0.7
    max_per_img: int = 100
    nms_type: str = "nms"  # 'nms' | 'soft_nms'
    # static cap on score-passing candidates entering NMS (exact mmdet keeps
    # all of them); raise via test_cfg for ultra-dense scenes
    pre_nms_top_k: int = 2048


class TwoStageNet(nn.Module):
    """All trainable networks of the two-stage detector."""

    backbone: nn.Module
    neck: nn.Module
    rpn: nn.Module
    bbox_head: Optional[nn.Module]
    mask_head: Optional[nn.Module] = None
    mask_iou_head: Optional[nn.Module] = None
    point_head: Optional[nn.Module] = None  # PointRend refinement MLP
    grid_head: Optional[nn.Module] = None  # Grid R-CNN grid-point branch
    # deformable RoI pooling (configs/dcn dpool/mdpool): replaces the
    # RoIAlign extraction with DeformRoIPoolPack
    roi_deform_pool: Optional[nn.Module] = None
    roi_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    roi_out_size: int = 7
    mask_roi_out_size: int = 14
    # C4 Mask R-CNN (reference mask_rcnn_r50_caffe_c4: mask_roi_extractor=
    # None + shared_head): the mask branch pools with the bbox extractor
    # geometry and runs the shared res5 stage before the FCN head
    mask_on_shared: bool = False
    roi_sample_num: int = 2
    roi_finest_scale: int = 56
    # 'route' (SingleRoIExtractor level routing) or GRoIE 'sum'/'concat'
    # (GenericRoIExtractor, reference generic_roi_extractor.py)
    roi_aggregation: str = "route"
    bridge: bool = False  # ProbTwoStage fusion (reference prob_two_stage.py)
    # EMAFasterRCNN (reference detectors/faster_rcnn.py:730): a shared
    # FP-EMAU applied to the neck outputs; its mu buffer self-updates in
    # batch_stats during mutable (train) applies
    emau: Optional[nn.Module] = None
    # DG wrappers (reference detectors/faster_rcnn.py:47,382; see
    # models/detectors/dg.py): DANN domain classifier on the backbone C3
    # behind gradient reversal / jigsaw permutation classifier on the
    # backbone C5 of a tile-permuted view
    domain_head: Optional[nn.Module] = None
    jig_head: Optional[nn.Module] = None

    def features(self, images):
        feats = self.neck(self.backbone(images))
        if self.emau is not None:
            feats, _ = self.emau(feats)
        return feats

    def features_dg(self, images):
        """DGFasterRCNN feature path (reference ``extract_feat:105-118``):
        the domain prediction branches off the backbone's stage-2 output
        before the neck."""
        outs = self.backbone(images)
        d_pred = self.domain_head(outs[1])
        feats = self.neck(outs)
        if self.emau is not None:
            feats, _ = self.emau(feats)
        return feats, d_pred

    def jig_out(self, images):
        """JiGEN auxiliary branch (reference ``extract_feat:435-445``):
        permutation prediction from the backbone's C5 of the puzzle view."""
        outs = self.backbone(images)
        return self.jig_head(outs[-1])

    def rpn_out(self, feats):
        return self.rpn(feats)

    @nn.compact
    def rpn_bridge_out(self, feats):
        """ProbTwoStage mode (reference ``detectors/prob_two_stage.py:
        37-110``): the RPN tower features are concatenated with the FPN
        features and fused by per-level 3x3 ConvModules (GN) to feed the RoI
        head."""
        from ..layers import ConvModule

        cls_l, reg_l, iou_l, tower = self.rpn(feats, bridge=True)
        fused = []
        for i, (f, t) in enumerate(zip(feats, tower)):
            y = jnp.concatenate([f, t], axis=-1)
            y = ConvModule(
                f.shape[-1], 3, norm_cfg={"type": "GN", "num_groups": 32},
                act="relu", dtype=f.dtype, name=f"fusion_conv_{i}",
            )(y)
            fused.append(y)
        return (cls_l, reg_l, iou_l), tuple(fused)

    def _roi_align_fn(self, inference: bool):
        """On TPU both paths use the fused Pallas kernel (1.7x the XLA
        separable-matmul path, no HBM window tensor); the training variant
        carries a custom_vjp whose backward is the XLA path's autodiff
        (same clamped-window bilinear function)."""
        from ...ops.pallas_roi_align import pallas_roi_available

        if pallas_roi_available():
            if inference:
                from ...ops.pallas_roi_align import multilevel_roi_align_pallas

                return multilevel_roi_align_pallas
            from ...ops.pallas_roi_align import (
                multilevel_roi_align_pallas_trainable,
            )

            return multilevel_roi_align_pallas_trainable
        return multilevel_roi_align_fast

    def roi_out(self, feats, rois, roi_valid, inference: bool = False):
        """feats: L x (B, H, W, C); rois: (B, R, 4). One fused RoIAlign +
        head over the flattened (B*R) axis."""
        b, r, _ = rois.shape
        if self.roi_aggregation != "route":
            from ...ops.roi_align import multilevel_roi_align_all

            pooled = jax.vmap(
                lambda fl, rb, vb: multilevel_roi_align_all(
                    fl, rb, vb, self.roi_strides, out_size=self.roi_out_size,
                    sample_num=self.roi_sample_num,
                    aggregation=self.roi_aggregation,
                )
            )(feats, rois, roi_valid)
            pooled = pooled.reshape(
                b * r, self.roi_out_size, self.roi_out_size, -1)
            cls, reg = self.bbox_head(pooled)
            return cls, reg
        if self.roi_deform_pool is not None:
            pooled = self.roi_deform_pool(feats, rois, roi_valid)
            cls, reg = self.bbox_head(pooled)
            return cls, reg
        from ...ops.pallas_roi_align import batched_multilevel_roi_align

        pooled = batched_multilevel_roi_align(
            feats,
            rois,
            roi_valid,
            self.roi_strides,
            out_size=self.roi_out_size,
            sample_num=self.roi_sample_num,
            finest_scale=self.roi_finest_scale,
            num_route_levels=len(self.roi_strides),
        )
        pooled = pooled.reshape(b * r, self.roi_out_size, self.roi_out_size, -1)
        cls, reg = self.bbox_head(pooled)
        return cls, reg

    def seesaw_counts(self, labels, weights):
        """Accumulate Seesaw cumulative class counts in the bbox head's
        ``batch_stats`` (see ``ConvFCBBoxHead.update_seesaw_counts``)."""
        return self.bbox_head.update_seesaw_counts(labels, weights)

    def dynamic_state(self):
        """Dynamic R-CNN working (iou_thr, beta) from ``batch_stats``."""
        return self.bbox_head.get_dynamic_state()

    def update_dynamic(self, batch_iou, batch_beta):
        """EMA-update the Dynamic R-CNN state (see
        ``ConvFCBBoxHead.update_dynamic``)."""
        return self.bbox_head.update_dynamic(batch_iou, batch_beta)

    def crpn_stage1(self, feats):
        return self.rpn.stage1(feats)

    def crpn_stage2(self, bridged, offsets):
        return self.rpn.stage2(bridged, offsets)

    def mask_out(self, feats, rois, roi_valid, inference: bool = False,
                 return_pooled: bool = False):
        """Mask branch: 14x14 RoIAlign + FCN head -> (B*R, 28, 28, C)."""
        from ...ops.pallas_roi_align import batched_multilevel_roi_align

        b, r, _ = rois.shape
        pooled = batched_multilevel_roi_align(
            feats,
            rois,
            roi_valid,
            self.roi_strides,
            out_size=self.mask_roi_out_size,
            sample_num=self.roi_sample_num,
            finest_scale=self.roi_finest_scale,
            num_route_levels=len(self.roi_strides),
        )
        pooled = pooled.reshape(
            b * r, self.mask_roi_out_size, self.mask_roi_out_size, -1
        )
        if self.mask_on_shared:
            # C4: shared res5 (same params as the bbox branch) before the
            # FCN head (reference standard_roi_head.py _mask_forward with
            # share_roi_extractor + with_shared_head)
            pooled = self.bbox_head.res5(pooled)
        logits = self.mask_head(pooled)
        if return_pooled:
            return logits, pooled
        return logits

    def grid_out(self, feats, rois, roi_valid, train: bool = False):
        """14x14 pooled grid features -> heatmaps (reference
        ``grid_roi_head.py:92-110``)."""
        b, r, _ = rois.shape
        pooled = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(
                fl, rb, vb, self.roi_strides, out_size=14,
                sample_num=self.roi_sample_num,
                finest_scale=self.roi_finest_scale,
                num_route_levels=len(self.roi_strides),
            )
        )(feats, rois, roi_valid)
        pooled = pooled.reshape(b * r, 14, 14, -1)
        fused, unfused = self.grid_head(pooled, train=train)
        gp = fused.shape[-1]
        hw = fused.shape[1]
        return (fused.reshape(b, r, hw, hw, gp),
                unfused.reshape(b, r, hw, hw, gp))

    def mask_iou_out(self, pooled, mask_pred):
        """Mask-IoU predictions (Mask Scoring R-CNN)."""
        return self.mask_iou_head(pooled, mask_pred)

    def point_out(self, fine, coarse):
        """PointRend per-point MLP: (P, Cf) fine features + (P, C) coarse
        logits -> (P, C) refined point logits."""
        return self.point_head(fine, coarse)

    def __call__(self, images, rois, roi_valid):
        """Init-time path touching every submodule."""
        if self.domain_head is not None:
            feats, _ = self.features_dg(images)
        elif self.jig_head is not None:
            self.jig_out(images)
            feats = self.features(images)
        else:
            feats = self.features(images)
        if self.bridge:
            rpn_outs, feats = self.rpn_bridge_out(feats)
        else:
            rpn_outs = self.rpn_out(feats)
        if self.bbox_head is None:  # RPN-only detector
            return rpn_outs, None, None
        cls, reg = self.roi_out(feats, rois, roi_valid)
        if self.mask_head is not None:
            mask_logits, pooled = self.mask_out(
                feats, rois, roi_valid, return_pooled=True
            )
            if self.mask_iou_head is not None:
                self.mask_iou_out(
                    pooled, jnp.zeros(pooled.shape[:1] + (28, 28), pooled.dtype)
                )
            if self.point_head is not None:
                self.point_out(
                    jnp.zeros((1, feats[0].shape[-1]), feats[0].dtype),
                    jnp.zeros((1, mask_logits.shape[-1]), jnp.float32),
                )
        if self.grid_head is not None:
            self.grid_out(feats, rois, roi_valid, train=True)
        return rpn_outs, cls, reg


class TwoStageDetector:
    """Orchestrator: static anchors + pure train/predict programs.

    ``rpn_type`` selects the boosting ATSSRPNHead ('atss_rpn') or the vanilla
    RPNHead ('rpn', for stock Faster R-CNN).
    """

    def __init__(
        self,
        net: TwoStageNet,
        anchor_generator: AnchorGenerator,
        rpn_cfg: Any,  # ATSSRPNCfg | RPNCfg
        roi_cfg: ProbRoICfg,
        bbox_cfg: BBoxHeadCfg,
        train_proposal_cfg: ProposalCfg = ProposalCfg(4000, 2000),
        test_proposal_cfg: ProposalCfg = ProposalCfg(1000, 256),
        rcnn_test_cfg: RCNNTestCfg = RCNNTestCfg(),
        rpn_type: str = "atss_rpn",
    ):
        self.net = net
        self.anchor_generator = anchor_generator
        self.rpn_cfg = rpn_cfg
        self.roi_cfg = roi_cfg
        self.bbox_cfg = bbox_cfg
        self.train_proposal_cfg = train_proposal_cfg
        self.test_proposal_cfg = test_proposal_cfg
        self.rcnn_test_cfg = rcnn_test_cfg
        self.rpn_type = rpn_type

    # ---------- static geometry ----------
    def featmap_sizes(self, canvas_hw: Tuple[int, int]):
        import math

        return [
            (math.ceil(canvas_hw[0] / s[1]), math.ceil(canvas_hw[1] / s[0]))
            for s in self.anchor_generator.strides
        ]

    def anchors_for(self, canvas_hw: Tuple[int, int]):
        fs = self.featmap_sizes(canvas_hw)
        flat = self.anchor_generator.flat_anchors(fs)
        nla = [a.shape[0] for a in self.anchor_generator.grid_anchors(fs)]
        return jnp.asarray(flat), tuple(nla)

    # ---------- init ----------
    def init(self, rng, canvas_hw: Tuple[int, int], batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        rois = jnp.zeros((batch_size, 8, 4), jnp.float32)
        rv = jnp.ones((batch_size, 8), bool)
        return self.net.init(rng, images, rois, rv)

    # ---------- shared forward pieces ----------
    def _extract_for_loss(self, variables, rng, batch):
        """Train-time feature extraction; subclass hook (the DG wrappers in
        ``dg.py`` branch off auxiliary domain/jigsaw losses here).  Returns
        ``(neck_features, aux_loss_dict)``."""
        feats = self.net.apply(
            variables, batch["images"], method=TwoStageNet.features)
        return feats, {}

    def _rpn_flat(self, variables, feats):
        """Returns flat rpn outputs + the feature set the RoI head consumes
        (== ``feats`` except in ProbTwoStage bridge mode)."""
        if getattr(self.net, "bridge", False):
            outs, roi_feats = self.net.apply(
                variables, feats, method=TwoStageNet.rpn_bridge_out
            )
            cls_l, reg_l, iou_l = outs
        elif self.rpn_type == "cascade_rpn":
            from ..dense_heads.cascade_rpn_head import anchor_offsets

            bridged, s1_reg_l = self.net.apply(
                variables, feats, method=TwoStageNet.crpn_stage1
            )
            from ...ops.box_ops import delta2bbox

            s1_reg = flatten_levels(s1_reg_l, 4)  # (B, A, 4)
            anchors_c = self._crpn_anchors
            refined = jax.lax.stop_gradient(jax.vmap(
                lambda r: delta2bbox(
                    anchors_c, r, (0.0,) * 4, self.rpn_cfg.stage1_stds)
            )(s1_reg.astype(jnp.float32)))
            fsizes = tuple((f.shape[1], f.shape[2]) for f in feats)
            offsets = jax.vmap(
                lambda a_: tuple(anchor_offsets(self.rpn_cfg, a_, fsizes))
            )(refined)
            cls_l, reg_l = self.net.apply(
                variables, bridged, list(offsets),
                method=TwoStageNet.crpn_stage2
            )
            self._crpn_refined = refined
            self._crpn_s1_reg = s1_reg
            roi_feats = feats
            iou_l = None
        elif self.rpn_type == "ga_rpn":
            cls_l, reg_l, shape_l, loc_l = self.net.apply(
                variables, feats, method=TwoStageNet.rpn_out
            )
            self._ga_shapes = flatten_levels(shape_l, 2)  # (B, A, 2)
            self._ga_locs = flatten_levels(loc_l, 1)[..., 0]  # (B, A)
            self._ga_featmap_sizes = tuple(
                (f.shape[1], f.shape[2]) for f in feats
            )
            roi_feats = feats
            iou_l = None
        else:
            cls_l, reg_l, iou_l = self.net.apply(
                variables, feats, method=TwoStageNet.rpn_out
            )
            roi_feats = feats
        cls = flatten_levels(cls_l, 1)[..., 0]  # (B, A)
        reg = flatten_levels(reg_l, 4)  # (B, A, 4)
        iou = flatten_levels(iou_l, 1)[..., 0] if iou_l is not None else None
        self._roi_feats = roi_feats
        return cls, reg, iou

    def _proposals(self, cls, reg, iou, anchors, nla, img_shapes, pcfg: ProposalCfg):
        if self.rpn_type == "cascade_rpn":
            from ..dense_heads.cascade_rpn_head import crpn_proposals

            fn = lambda c, r, ra, s: crpn_proposals(
                self.rpn_cfg, c, r, ra, nla, s,
                nms_pre=pcfg.nms_pre, max_per_img=pcfg.max_per_img,
                nms_iou_thr=pcfg.nms_iou_thr,
                min_bbox_size=pcfg.min_bbox_size,
            )
            return jax.vmap(fn)(cls, reg, self._crpn_refined, img_shapes)
        if self.rpn_type == "ga_rpn":
            from ..dense_heads.guided_anchor_head import ga_rpn_proposals

            fn = lambda c, r, sp, lc, s: ga_rpn_proposals(
                self.rpn_cfg, c, r, sp, lc, anchors, nla, s,
                nms_pre=pcfg.nms_pre, max_per_img=pcfg.max_per_img,
                nms_iou_thr=pcfg.nms_iou_thr,
                min_bbox_size=pcfg.min_bbox_size,
            )
            return jax.vmap(fn)(
                cls, reg, self._ga_shapes, self._ga_locs, img_shapes
            )
        if self.rpn_type == "atss_rpn":
            fn = lambda c, r, i, s: atss_rpn_proposals(
                self.rpn_cfg, c, r, i, anchors, nla, s,
                nms_pre=pcfg.nms_pre, max_per_img=pcfg.max_per_img,
                nms_iou_thr=pcfg.nms_iou_thr, min_bbox_size=pcfg.min_bbox_size,
                approx_topk=pcfg.approx_topk,
                topk_recall_target=pcfg.topk_recall_target,
            )
            return jax.vmap(fn)(cls, reg, iou, img_shapes)
        fn = lambda c, r, s: rpn_proposals(
            self.rpn_cfg, c, r, anchors, nla, s,
            nms_pre=pcfg.nms_pre, max_per_img=pcfg.max_per_img,
            nms_iou_thr=pcfg.nms_iou_thr, min_bbox_size=pcfg.min_bbox_size,
            approx_topk=pcfg.approx_topk,
                topk_recall_target=pcfg.topk_recall_target,
        )
        return jax.vmap(fn)(cls, reg, img_shapes)

    # ---------- training ----------
    def _roi_losses(self, cls_s, reg_s, flat: "RoISample",
                    seesaw_counts=None):
        """RoI-stage classification + regression losses; subclass hook
        (SABL swaps in bucketing losses)."""
        if reg_s is None:  # with_reg=False head (Grid R-CNN): cls-only
            k = 1 if self.bbox_cfg.reg_class_agnostic else (
                self.bbox_cfg.num_classes)
            zero_reg = jnp.zeros((cls_s.shape[0], 4 * k), jnp.float32)
            roi_losses = prob_roi_loss(
                self.roi_cfg, self.bbox_cfg, cls_s, zero_reg, flat)
            roi_losses["loss_bbox"] = jnp.zeros(())
            return roi_losses
        return prob_roi_loss(self.roi_cfg, self.bbox_cfg, cls_s, reg_s, flat,
                             seesaw_counts=seesaw_counts)

    def _seesaw_counts(self, variables, flat: "RoISample"):
        """Update + fetch the cumulative Seesaw class counts (reference
        ``SeesawLoss.cum_samples``).  Under the train step the update
        threads through the live-BN mutable mechanism; in a direct
        ``loss`` call the accumulation is computed but discarded (pure)."""
        if getattr(self.bbox_cfg, "loss_cls_type", "ce") != "seesaw":
            return None
        labels = jnp.where(
            flat.is_pos, flat.matched_label, self.bbox_cfg.num_classes)
        w = flat.valid.astype(jnp.float32)
        if hasattr(self.net, "_net"):  # _MutableNet shim (train step)
            return self.net.apply(
                variables, labels, w, method=TwoStageNet.seesaw_counts)
        counts, _upd = self.net.apply(
            variables, labels, w, method=TwoStageNet.seesaw_counts,
            mutable=["batch_stats"],
        )
        return counts

    def _vmap_sample(
        self, variables, roi_rng, prop_boxes, prop_scores, prop_valid, batch
    ) -> "RoISample":
        """Per-image assign + sample over the batch; subclass hook
        (Dynamic R-CNN swaps in traced assigner thresholds).  ``variables``
        is unused by the base sampler (None from the split-proposal path)."""
        rngs = jax.random.split(roi_rng, prop_boxes.shape[0])
        return jax.vmap(
            lambda r_, pb, ps, pv, gb, gm, gl: sample_rois(
                self.roi_cfg, r_, pb, ps, pv, gb, gm, gl
            )
        )(
            rngs, prop_boxes, prop_scores, prop_valid,
            batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"],
        )

    def sample_from_rpn_outs(
        self, rng, rpn_outs, batch, anchors, num_level_anchors
    ) -> "RoISample":
        """Train-cfg proposals + RoI sampling from flat RPN outputs.

        Pure post-processing (no params consumed beyond ``rpn_outs``); uses
        the same rng split structure as :meth:`loss` so the produced
        :class:`RoISample` is bit-identical to the one ``loss`` would build
        internally from the same ``rng`` and RPN outputs.
        """
        cls, reg, iou = rpn_outs
        if self.rpn_type not in ("atss_rpn", "rpn"):
            raise NotImplementedError(
                "split proposal generation only supports rpn/atss_rpn")
        _, roi_rng = jax.random.split(rng)
        b = cls.shape[0]
        prop_boxes, prop_scores, prop_valid = jax.tree.map(
            jax.lax.stop_gradient,
            self._proposals(
                cls, reg, iou, anchors, num_level_anchors,
                batch["img_shape"], self.train_proposal_cfg,
            ),
        )
        sample = self._vmap_sample(
            None, roi_rng, prop_boxes, prop_scores, prop_valid, batch)
        return jax.tree.map(jax.lax.stop_gradient, sample)

    def train_sample(
        self, variables, rng, batch, anchors, num_level_anchors
    ) -> "RoISample":
        """Full non-grad forward -> train-cfg RoISample.

        Used by the ``outside_grad``/``external`` train-step variants
        (engine/train.py) to keep the proposal NMS chain out of the
        differentiated program; ``loss(..., sample=...)`` with the same
        ``rng`` then reproduces the fused step's numerics exactly.
        """
        feats = self.net.apply(
            variables, batch["images"], method=TwoStageNet.features)
        cls, reg, iou = self._rpn_flat(variables, feats)
        if iou is None:
            iou = jnp.zeros_like(cls)
        return self.sample_from_rpn_outs(
            rng, (cls, reg, iou), batch, anchors, num_level_anchors)

    def loss(
        self,
        variables,
        rng: jax.Array,
        batch: Dict[str, jnp.ndarray],
        anchors: jnp.ndarray,
        num_level_anchors: Tuple[int, ...],
        anchor_valid: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
        sample: Optional["RoISample"] = None,
    ) -> Dict[str, jnp.ndarray]:
        """One full forward + loss on a padded batch.

        batch: images (B,H,W,3), gt_bboxes (B,G,4), gt_labels (B,G),
        gt_mask (B,G), img_shape (B,2).

        ``sample``: optionally a precomputed :class:`RoISample` (from
        :meth:`train_sample`) — skips the internal proposal generation +
        sampling so the sequential NMS chain stays out of the
        differentiated program (docs/TRAIN_PERF.md round-3 split
        experiment).  Numerically identical when built with the same rng.
        """
        images = batch["images"]
        b = images.shape[0]
        rpn_rng, roi_rng = jax.random.split(rng)
        feats, aux_losses = self._extract_for_loss(variables, rng, batch)
        if self.rpn_type == "cascade_rpn":
            self._crpn_anchors, self._crpn_nla = anchors, num_level_anchors
        cls, reg, iou = self._rpn_flat(variables, feats)

        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        if self.rpn_type == "cascade_rpn":
            from ..dense_heads.cascade_rpn_head import crpn_loss

            losses = crpn_loss(
                self.rpn_cfg, self._crpn_s1_reg, cls, reg,
                self._crpn_anchors, self._crpn_refined,
                self._crpn_nla, batch["gt_bboxes"], batch["gt_mask"],
                rng=rpn_rng, axis_name=axis_name,
            )
        elif self.rpn_type == "ga_rpn":
            from ..dense_heads.guided_anchor_head import (
                approx_anchors,
                ga_rpn_loss,
            )

            approxs = approx_anchors(self.rpn_cfg, self._ga_featmap_sizes)
            losses = ga_rpn_loss(
                self.rpn_cfg, cls, reg, self._ga_shapes, self._ga_locs,
                anchors, approxs, self._ga_featmap_sizes,
                batch["gt_bboxes"], batch["gt_mask"], rng=rpn_rng,
                axis_name=axis_name,
            )
        elif self.rpn_type == "atss_rpn":
            losses = atss_rpn_loss(
                self.rpn_cfg, cls, reg, iou, anchors, valid,
                batch["gt_bboxes"], batch["gt_mask"],
                num_level_anchors, axis_name=axis_name,
            )
        else:
            losses = rpn_loss(
                self.rpn_cfg, cls, reg, anchors, valid,
                batch["gt_bboxes"], batch["gt_mask"], rng=rpn_rng,
                axis_name=axis_name,
            )

        losses.update(aux_losses)

        # RPN outputs exposed (detached) for the stale-proposal train-step
        # variant: the next step's proposals are computed from these in the
        # same program, after the grad region (engine/train.py).
        self._last_rpn_outs = jax.tree.map(
            jax.lax.stop_gradient,
            (cls, reg, iou if iou is not None else jnp.zeros_like(cls)),
        )

        if sample is None:
            # Proposals (detached, reference get_bboxes uses .detach()).
            prop_boxes, prop_scores, prop_valid = jax.tree.map(
                jax.lax.stop_gradient,
                self._proposals(
                    cls, reg, iou, anchors, num_level_anchors,
                    batch["img_shape"], self.train_proposal_cfg,
                ),
            )

            sample = self._vmap_sample(
                variables, roi_rng, prop_boxes, prop_scores, prop_valid,
                batch)

        roi_feats = getattr(self, "_roi_feats", feats)
        cls_s, reg_s = self.net.apply(
            variables, roi_feats, sample.boxes, sample.valid,
            method=TwoStageNet.roi_out,
        )
        flat = RoISample(*[
            x.reshape((-1,) + x.shape[2:]) for x in sample
        ])
        losses.update(self._roi_losses(
            cls_s, reg_s, flat,
            seesaw_counts=self._seesaw_counts(variables, flat)))

        if self.net.mask_head is not None and "gt_mask_crops" in batch:
            from ..roi_heads.mask_head import mask_loss, resample_mask_targets

            with_iou = self.net.mask_iou_head is not None
            mask_out_res = self.net.apply(
                variables, roi_feats, sample.boxes, sample.valid & sample.is_pos,
                return_pooled=with_iou,
                method=TwoStageNet.mask_out,
            )
            mask_logits = mask_out_res[0] if with_iou else mask_out_res
            # target size follows the head output (28 for FCNMaskHead,
            # 7 for PointRend's CoarseMaskHead)
            m_out = mask_logits.shape[1]
            targets = jax.vmap(
                lambda crops, gb, rb, gi: resample_mask_targets(
                    crops, gb, rb, gi, out_size=m_out
                )
            )(
                batch["gt_mask_crops"], batch["gt_bboxes"],
                sample.boxes, sample.gt_idx,
            )
            pos_labels = jnp.where(flat.is_pos, flat.matched_label, 0)
            pos_w = flat.is_pos & flat.valid
            losses["loss_mask"] = mask_loss(
                mask_logits,
                targets.reshape((-1,) + targets.shape[2:]),
                pos_labels,
                pos_w,
            )
            if with_iou:
                from ..roi_heads.mask_head import mask_iou_targets

                pooled = mask_out_res[1]
                m = mask_logits.shape[1]
                safe = jnp.clip(pos_labels, 0, mask_logits.shape[-1] - 1)
                pred = jax.nn.sigmoid(jnp.take_along_axis(
                    mask_logits,
                    safe[:, None, None, None].repeat(m, 1).repeat(m, 2),
                    axis=-1,
                )[..., 0])  # (B*R, 28, 28)
                iou_pred = self.net.apply(
                    variables, pooled, pred, method=TwoStageNet.mask_iou_out
                )
                iou_pred_pos = jnp.take_along_axis(
                    iou_pred, safe[:, None], axis=-1
                )[:, 0]
                flat_boxes = sample.boxes.reshape(-1, 4)
                gidx = sample.gt_idx.reshape(-1)
                bidx = jnp.repeat(
                    jnp.arange(b), sample.boxes.shape[1]
                )
                crop_fracs = batch["gt_mask_crops"].astype(jnp.float32).mean(
                    (-1, -2)
                )[bidx, gidx]
                gt_b = batch["gt_bboxes"][bidx, gidx]
                tgt = mask_iou_targets(
                    pred, targets.reshape((-1,) + targets.shape[2:]),
                    crop_fracs, flat_boxes, gt_b,
                )
                w = (pos_w & (tgt > 0)).astype(jnp.float32)
                from ...ops import losses as _L

                losses["loss_mask_iou"] = 0.5 * _L.mse_loss(
                    iou_pred_pos, tgt, weight=w,
                    avg_factor=jnp.maximum(w.sum(), 1.0),
                )
        return losses

    # ---------- inference ----------
    def predict(
        self,
        variables,
        batch: Dict[str, jnp.ndarray],
        anchors: jnp.ndarray,
        num_level_anchors: Tuple[int, ...],
        rescale: bool = True,
    ):
        """Batched inference -> (dets (B, max, 5), labels (B, max), valid).

        Mirrors ``FasterRCNN.simple_test`` + ``ProbRoIHead.simple_test``
        (``two_stage.py:171``, ``prob_roi_head.py:206``).
        """
        images = batch["images"]
        b = images.shape[0]
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        if self.rpn_type == "cascade_rpn":
            self._crpn_anchors, self._crpn_nla = anchors, num_level_anchors
        cls, reg, iou = self._rpn_flat(variables, feats)
        prop_boxes, prop_scores, prop_valid = self._proposals(
            cls, reg, iou, anchors, num_level_anchors,
            batch["img_shape"], self.test_proposal_cfg,
        )
        roi_feats = getattr(self, "_roi_feats", feats)
        cls_s, reg_s = self.net.apply(
            variables, roi_feats, prop_boxes, prop_valid, inference=True,
            method=TwoStageNet.roi_out,
        )
        r = prop_boxes.shape[1]
        cls_s = cls_s.reshape(b, r, -1)
        if reg_s is None:  # with_reg=False: score the proposals themselves
            reg_s = jnp.zeros((b, r, 0), cls_s.dtype)
        else:
            reg_s = reg_s.reshape(b, r, -1)
        if self.roi_cfg.prob:
            fused = jax.vmap(prob_fuse_scores)(cls_s, prop_scores)
        else:
            fused = jax.nn.softmax(cls_s.astype(jnp.float32), axis=-1)

        tc = self.rcnn_test_cfg
        dets, labels, valid = jax.vmap(
            lambda ro, sc, bp, rv, shp, sf: bbox_head_decode(
                self.bbox_cfg, ro, sc, bp, shp, sf, rescale,
                tc.score_thr, tc.nms_iou_thr, tc.max_per_img, roi_valid=rv,
                nms_type=tc.nms_type, pre_nms_top_k=tc.pre_nms_top_k,
            )
        )(
            prop_boxes, fused, reg_s, prop_valid,
            batch["img_shape"], batch["scale_factor"],
        )
        if self.net.mask_head is not None:
            # mask branch on the final detections, in padded-image coords
            det_boxes = dets[..., :4]
            if rescale:
                det_boxes = det_boxes * batch["scale_factor"][:, None, :]
            with_iou = self.net.mask_iou_head is not None
            mask_out_res = self.net.apply(
                variables, roi_feats, det_boxes, valid, inference=True,
                return_pooled=with_iou, method=TwoStageNet.mask_out,
            )
            mask_logits = mask_out_res[0] if with_iou else mask_out_res
            m = mask_logits.shape[1]
            c = mask_logits.shape[-1]
            mask_logits = mask_logits.reshape(b, -1, m, m, c)
            safe = jnp.clip(labels, 0, c - 1)
            sel = jnp.take_along_axis(
                mask_logits,
                safe[:, :, None, None, None].repeat(m, 2).repeat(m, 3),
                axis=-1,
            )[..., 0]
            masks = jax.nn.sigmoid(sel.astype(jnp.float32))  # (B, D, 28, 28)
            if with_iou:
                # Mask Scoring: segm confidence = cls score * predicted IoU
                pooled = mask_out_res[1]
                iou_pred = self.net.apply(
                    variables, pooled, masks.reshape(-1, m, m),
                    method=TwoStageNet.mask_iou_out,
                )
                iou_sel = jnp.take_along_axis(
                    iou_pred.reshape(b, -1, c), jnp.clip(labels, 0, c - 1)[..., None],
                    axis=-1,
                )[..., 0]
                mask_scores = dets[..., 4] * jnp.clip(iou_sel, 0.0, 1.0)
                return dets, labels, valid, masks, mask_scores
            return dets, labels, valid, masks
        return dets, labels, valid


def _hflip_boxes(boxes: jnp.ndarray, img_w: jnp.ndarray) -> jnp.ndarray:
    """Mirror xyxy boxes inside a valid width ``img_w`` (per image)."""
    x1 = img_w - boxes[..., 2]
    x2 = img_w - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def aug_predict(
    detector: "TwoStageDetector",
    variables,
    batch: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,
    num_level_anchors: Tuple[int, ...],
    rescale: bool = True,
):
    """Horizontal-flip test-time augmentation — the single-scale case of
    ``aug_predict_multi`` (reference ``MultiScaleFlipAug`` with one scale +
    flip)."""
    views = [
        (batch, anchors, num_level_anchors, False),
        (batch, anchors, num_level_anchors, True),
    ]
    return aug_predict_multi(detector, variables, views, rescale=rescale)


def aug_predict_multi(
    detector: "TwoStageDetector",
    variables,
    views,
    rescale: bool = True,
):
    """Multi-scale + flip test-time augmentation (reference
    ``MultiScaleFlipAug`` ``test_time_aug.py:11`` + ``merge_augs.py:8``
    semantics on fixed shapes).

    ``views``: list of ``(batch, anchors, num_level_anchors, flip)`` — one
    entry per (scale, flip) combination.  Each batch carries its own resized
    ``images``/``img_shape``/``scale_factor`` (fixed canvas per scale ⇒ one
    XLA compile per scale).  Pipeline:

    1. per view: RPN proposals, unflipped and mapped to ORIGINAL image
       coordinates (``/ scale_factor``);
    2. merge across views with NMS, keep ``max_per_img``
       (``merge_aug_proposals``);
    3. per view: RoI-score the merged proposals in that view's frame; decode
       boxes back to original coordinates;
    4. average scores and decoded boxes over views
       (``merge_aug_bboxes``), one final multiclass NMS.
    """
    from ...ops.box_ops import clip_boxes, delta2bbox
    from ...ops.nms import multiclass_nms_padded, nms_padded

    det = detector
    b = views[0][0]["images"].shape[0]

    feats_per_view = []
    prop_outs = []
    for batch, anchors, nla, is_flip in views:
        images = batch["images"]
        imgs = images[:, :, ::-1] if is_flip else images
        feats = det.net.apply(variables, imgs, method=TwoStageNet.features)
        feats_per_view.append(feats)
        cls, reg, iou = det._rpn_flat(variables, feats)
        canvas_shape = jnp.broadcast_to(
            jnp.asarray([float(images.shape[1]), float(images.shape[2])]),
            (b, 2),
        )
        clip_shape = canvas_shape if is_flip else batch["img_shape"]
        pb, ps, pv = det._proposals(
            cls, reg, iou, anchors, nla, clip_shape, det.test_proposal_cfg
        )
        if is_flip:
            canvas_w = float(images.shape[2])
            pb = jax.vmap(lambda bx: _hflip_boxes(bx, canvas_w))(pb)
            pb = jax.vmap(clip_boxes)(pb, batch["img_shape"])
        # to original-image coordinates
        pb = pb / batch["scale_factor"][:, None, :]
        prop_outs.append((pb, ps, pv))

    # merge proposals across views in original coords (merge_aug_proposals)
    mb = jnp.concatenate([o[0] for o in prop_outs], axis=1)
    msc = jnp.concatenate([o[1] for o in prop_outs], axis=1)
    mv = jnp.concatenate([o[2] for o in prop_outs], axis=1)
    tcfg = det.test_proposal_cfg
    pb0, ps, pv, _ = jax.vmap(
        lambda bx, sc, vd: nms_padded(
            bx, sc, tcfg.nms_iou_thr, tcfg.max_per_img, valid=vd
        )
    )(mb, msc, mv)
    ps = jnp.where(pv, ps, 0.0)
    r = pb0.shape[1]

    fused_sum = 0.0
    boxes_sum = 0.0
    for (batch, anchors, nla, is_flip), feats in zip(views, feats_per_view):
        images = batch["images"]
        canvas_w = float(images.shape[2])
        rois = pb0 * batch["scale_factor"][:, None, :]  # into view frame
        if is_flip:
            rois = jax.vmap(lambda bx: _hflip_boxes(bx, canvas_w))(rois)
        cls_s, reg_s = det.net.apply(
            variables, feats, rois, pv, method=TwoStageNet.roi_out
        )
        cls_s = cls_s.reshape(b, r, -1)
        reg_s = reg_s.reshape(b, r, -1)
        if det.roi_cfg.prob:
            fused_sum = fused_sum + jax.vmap(prob_fuse_scores)(cls_s, ps)
        else:
            fused_sum = fused_sum + jax.nn.softmax(
                cls_s.astype(jnp.float32), axis=-1
            )
        # decode this view's boxes, recover to original coords
        dec = jax.vmap(
            lambda ro, bp, shp: delta2bbox(
                ro, bp, det.bbox_cfg.target_means, det.bbox_cfg.target_stds,
                max_shape=shp,
            )
        )(rois, reg_s, batch["img_shape"])  # (B, R, K*4)
        k4 = dec.shape[-1]
        if is_flip:
            dec = jax.vmap(
                lambda bx: _hflip_boxes(bx.reshape(r, -1, 4), canvas_w).reshape(
                    r, k4
                )
            )(dec)
        dec = dec.reshape(b, r, -1, 4) / batch["scale_factor"][:, None, None, :]
        boxes_sum = boxes_sum + dec

    n_views = len(views)
    fused = fused_sum / n_views
    boxes = boxes_sum / n_views  # (B, R, K, 4) in original coords
    c = det.bbox_cfg.num_classes
    if boxes.shape[2] == 1:
        boxes = jnp.broadcast_to(boxes, (b, r, c, 4))

    tc = det.rcnn_test_cfg
    return jax.vmap(
        lambda bx, sc, rv: multiclass_nms_padded(
            bx, sc[:, :c],
            score_thr=tc.score_thr, iou_threshold=tc.nms_iou_thr,
            max_per_img=tc.max_per_img, valid=rv, nms_type=tc.nms_type,
            pre_nms_top_k=tc.pre_nms_top_k,
        )
    )(boxes, fused, pv)


class RPNDetector(TwoStageDetector):
    """RPN-only detector (reference ``mmdet/models/detectors/rpn.py``):
    trains just the RPN and emits its proposals as class-agnostic
    detections, evaluated with proposal recall (AR@N)."""

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        images = batch["images"]
        b = images.shape[0]
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        if self.rpn_type == "cascade_rpn":
            self._crpn_anchors, self._crpn_nla = anchors, num_level_anchors
        cls, reg, iou = self._rpn_flat(variables, feats)
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        if self.rpn_type == "cascade_rpn":
            # standalone Cascade RPN (reference configs/cascade_rpn/
            # crpn_r50_caffe_fpn_1x_coco: RPN-only, AR-evaluated)
            from ..dense_heads.cascade_rpn_head import crpn_loss

            return crpn_loss(
                self.rpn_cfg, self._crpn_s1_reg, cls, reg,
                self._crpn_anchors, self._crpn_refined,
                self._crpn_nla, batch["gt_bboxes"], batch["gt_mask"],
                rng=rng, axis_name=axis_name,
            )
        if self.rpn_type == "atss_rpn":
            return atss_rpn_loss(
                self.rpn_cfg, cls, reg, iou, anchors, valid,
                batch["gt_bboxes"], batch["gt_mask"],
                num_level_anchors, axis_name=axis_name,
            )
        if self.rpn_type == "ga_rpn":
            # GA-RPN (reference configs/guided_anchoring/ga_rpn_*): the
            # guided-anchor loss state is populated by _rpn_flat
            from ..dense_heads.guided_anchor_head import (
                approx_anchors,
                ga_rpn_loss,
            )

            approxs = approx_anchors(self.rpn_cfg, self._ga_featmap_sizes)
            return ga_rpn_loss(
                self.rpn_cfg, cls, reg, self._ga_shapes, self._ga_locs,
                anchors, approxs, self._ga_featmap_sizes,
                batch["gt_bboxes"], batch["gt_mask"], rng=rng,
                axis_name=axis_name,
            )
        return rpn_loss(
            self.rpn_cfg, cls, reg, anchors, valid,
            batch["gt_bboxes"], batch["gt_mask"], rng=rng,
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        feats = self.net.apply(
            variables, batch["images"], method=TwoStageNet.features
        )
        if self.rpn_type == "cascade_rpn":
            self._crpn_anchors, self._crpn_nla = anchors, num_level_anchors
        cls, reg, iou = self._rpn_flat(variables, feats)
        boxes, scores, valid = self._proposals(
            cls, reg, iou, anchors, num_level_anchors,
            batch["img_shape"], self.test_proposal_cfg,
        )
        if rescale:
            boxes = boxes / batch["scale_factor"][:, None, :]
        dets = jnp.concatenate([boxes, scores[..., None]], -1)
        labels = jnp.zeros(dets.shape[:2], jnp.int32)
        return dets, labels, valid


class FastRCNNDetector(TwoStageDetector):
    """Fast R-CNN (reference ``detectors/fast_rcnn.py``): the RoI stages of
    the two-stage detector driven by EXTERNAL proposals — the batch must
    carry ``proposals`` (B, P, 4) and ``proposals_valid`` (B, P) (the
    reference's precomputed-proposal workflow)."""

    def _external_proposals(self, batch):
        boxes = batch["proposals"]
        valid = batch.get(
            "proposals_valid",
            jnp.ones(boxes.shape[:2], bool),
        )
        scores = batch.get("proposals_score", valid.astype(jnp.float32))
        return boxes, scores, valid

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        images = batch["images"]
        b = images.shape[0]
        _, roi_rng = jax.random.split(rng)
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        prop_boxes, prop_scores, prop_valid = self._external_proposals(batch)
        rngs = jax.random.split(roi_rng, b)
        sample: RoISample = jax.vmap(
            lambda r_, pb, ps, pv, gb, gm, gl: sample_rois(
                self.roi_cfg, r_, pb, ps, pv, gb, gm, gl
            )
        )(rngs, prop_boxes, prop_scores, prop_valid,
          batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"])
        cls_s, reg_s = self.net.apply(
            variables, feats, sample.boxes, sample.valid,
            method=TwoStageNet.roi_out,
        )
        flat = RoISample(*[x.reshape((-1,) + x.shape[2:]) for x in sample])
        roi_losses = prob_roi_loss(
            self.roi_cfg, self.bbox_cfg, cls_s, reg_s, flat)
        return {
            "loss_cls": roi_losses["loss_cls"],
            "loss_bbox": roi_losses["loss_bbox"],
        }

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        images = batch["images"]
        b = images.shape[0]
        feats = self.net.apply(variables, images, method=TwoStageNet.features)
        prop_boxes, prop_scores, prop_valid = self._external_proposals(batch)
        cls_s, reg_s = self.net.apply(
            variables, feats, prop_boxes, prop_valid, inference=True,
            method=TwoStageNet.roi_out,
        )
        r = prop_boxes.shape[1]
        cls_s = cls_s.reshape(b, r, -1)
        reg_s = reg_s.reshape(b, r, -1)
        probs = jax.nn.softmax(cls_s.astype(jnp.float32), axis=-1)
        tc = self.rcnn_test_cfg
        return jax.vmap(
            lambda ro, sc, bp, rv, shp, sf: bbox_head_decode(
                self.bbox_cfg, ro, sc, bp, shp, sf, rescale,
                tc.score_thr, tc.nms_iou_thr, tc.max_per_img, roi_valid=rv,
                nms_type=tc.nms_type, pre_nms_top_k=tc.pre_nms_top_k,
            )
        )(prop_boxes, probs, reg_s, prop_valid,
          batch["img_shape"], batch["scale_factor"])


class DynamicRCNNDetector(TwoStageDetector):
    """Dynamic R-CNN (reference ``roi_heads/dynamic_roi_head.py``,
    ``configs/dynamic_rcnn``): a standard two-stage detector whose RoI
    assigner IoU threshold and SmoothL1 beta adapt to the training
    statistics.

    * IoU statistic: per image the ``iou_topk``-th largest assigner
      ``max_overlaps`` over all proposals, meaned over the batch
      (``dynamic_roi_head.py::forward_train``).
    * beta statistic: the ``min(beta_topk*B, num_pos)``-th smallest
      ``mean(|dx, dy|)`` of the encoded regression targets
      (``_bbox_forward_train``).

    The working (iou_thr, beta) live in the bbox head's ``batch_stats``
    (``ConvFCBBoxHead.update_dynamic``) together with an
    ``update_iter_interval``-slot ring buffer of the per-step statistics;
    every interval boundary replays the reference's
    ``update_hyperparameters`` exactly (mean IoU / median beta over the
    window, floor/cap at the initial values) — all inside the jitted step.

    The current-step loss uses the state as of the step's start (matching
    the reference, where the update fires after the loss); the
    split-proposal train-step variants are not supported (the sampler
    depends on the mutable state).
    """

    def __init__(self, *args, dyn_iou_topk: int = 75, dyn_beta_topk: int = 10,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.dyn_iou_topk = dyn_iou_topk
        self.dyn_beta_topk = dyn_beta_topk

    def _vmap_sample(
        self, variables, roi_rng, prop_boxes, prop_scores, prop_valid, batch
    ) -> "RoISample":
        if variables is None:
            raise NotImplementedError(
                "Dynamic R-CNN needs the mutable state; the split-proposal "
                "train-step variants are not supported")
        # read-only: works through both the _MutableNet shim and plain apply
        iou_thr, beta = self.net.apply(
            variables, method=TwoStageNet.dynamic_state)
        rngs = jax.random.split(roi_rng, prop_boxes.shape[0])
        sample = jax.vmap(
            lambda r_, pb, ps, pv, gb, gm, gl: sample_rois_dynamic(
                self.roi_cfg, r_, pb, ps, pv, gb, gm, gl, iou_thr
            )
        )(
            rngs, prop_boxes, prop_scores, prop_valid,
            batch["gt_bboxes"], batch["gt_mask"], batch["gt_labels"],
        )
        # assigner max_overlaps over ALL proposals, for the IoU statistic
        from ...ops import box_ops as _bo

        def _max_ov(pb, pv, gb, gm):
            ov = _bo.bbox_overlaps(pb, gb)  # (P, G)
            ov = jnp.where(gm[None, :], ov, 0.0)
            return jnp.where(pv, jnp.max(ov, axis=1), 0.0)

        self._dyn_overlaps = jax.lax.stop_gradient(jax.vmap(_max_ov)(
            prop_boxes, prop_valid, batch["gt_bboxes"], batch["gt_mask"]))
        self._dyn_prop_valid = prop_valid
        self._dyn_vars = variables
        self._dyn_beta = beta
        return sample

    def _roi_losses(self, cls_s, reg_s, flat: "RoISample",
                    seesaw_counts=None):
        if not hasattr(self, "_dyn_overlaps"):
            raise NotImplementedError(
                "Dynamic R-CNN loss requires internal sampling "
                "(sample=None); split variants unsupported")
        labels = jnp.where(
            flat.is_pos, flat.matched_label, self.bbox_cfg.num_classes)
        _, _, bbox_t, _ = bbox_targets(
            self.bbox_cfg, flat.boxes, flat.is_pos, flat.valid,
            flat.matched_gt, labels)
        batch_iou, batch_beta = dynamic_rcnn_batch_stats(
            self._dyn_overlaps, self._dyn_prop_valid, bbox_t,
            flat.is_pos & flat.valid,
            iou_topk=self.dyn_iou_topk, beta_topk=self.dyn_beta_topk,
        )
        # reference guards median(beta_history) < EPS -> keep old beta
        batch_beta = jnp.where(batch_beta < 1e-15, jnp.nan, batch_beta)
        # loss uses the pre-update state; the update then threads out
        # through the mutable mechanism (no-op outside the train step)
        beta = self._dyn_beta
        if hasattr(self.net, "_net"):
            self.net.apply(
                self._dyn_vars, batch_iou, batch_beta,
                method=TwoStageNet.update_dynamic)
        return prob_roi_loss(
            self.roi_cfg, self.bbox_cfg, cls_s, reg_s, flat,
            seesaw_counts=seesaw_counts, beta_override=beta)
