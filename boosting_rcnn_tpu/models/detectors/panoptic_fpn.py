"""Panoptic FPN detector (reference ``mmdet/models/detectors/panoptic_fpn.py``
via ``TwoStagePanopticSegmentor``): Mask R-CNN + the PanopticFPN semantic
head; instance and stuff predictions fuse host-side with the heuristic
fusion head."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..seg_heads.panoptic_fpn_head import panoptic_seg_loss
from .two_stage import TwoStageDetector, TwoStageNet


class PanopticFPNDetector(TwoStageDetector):
    def __init__(self, *args, semantic_head=None, num_things: int = 80,
                 num_stuff: int = 53, seg_loss_weight: float = 0.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.semantic_head = semantic_head
        self.num_things = num_things
        self.num_stuff = num_stuff
        self.seg_loss_weight = seg_loss_weight

    def init(self, rng, canvas_hw, batch_size: int = 1):
        variables = super().init(rng, canvas_hw, batch_size)
        if self.semantic_head is not None:
            images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
            feats = self.net.apply(
                variables, images, method=TwoStageNet.features
            )
            sem_vars = self.semantic_head.init(rng, feats)
            variables = dict(variables)
            params = dict(variables["params"])
            params["semantic_head"] = sem_vars["params"]
            variables["params"] = params
        return variables

    def _seg_logits(self, variables, feats):
        return self.semantic_head.apply(
            {"params": variables["params"]["semantic_head"]}, feats
        )

    def _strip(self, variables):
        params = {k: v for k, v in variables["params"].items()
                  if k != "semantic_head"}
        return {"params": params,
                "batch_stats": variables.get("batch_stats", {})}

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        losses = super().loss(
            self._strip(variables), rng, batch, anchors, num_level_anchors,
            anchor_valid=anchor_valid, axis_name=axis_name,
        )
        if self.semantic_head is None:
            return losses
        if "gt_semantic_seg" not in batch:
            raise KeyError(
                "PanopticFPN needs 'gt_semantic_seg' in the batch (panoptic "
                "class maps from CocoPanopticDataset.semantic_map)"
            )
        feats = self.net.apply(
            self._strip(variables), batch["images"],
            method=TwoStageNet.features,
        )
        seg_logits = self._seg_logits(variables, feats)
        losses["loss_seg"] = panoptic_seg_loss(
            seg_logits, batch["gt_semantic_seg"],
            self.num_things, self.num_stuff,
            loss_weight=self.seg_loss_weight,
        )
        return losses

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        out = super().predict(
            self._strip(variables), batch, anchors, num_level_anchors,
            rescale=rescale,
        )
        if self.semantic_head is None:
            return out
        feats = self.net.apply(
            self._strip(variables), batch["images"],
            method=TwoStageNet.features,
        )
        seg_logits = self._seg_logits(variables, feats)
        return (*out, seg_logits)
