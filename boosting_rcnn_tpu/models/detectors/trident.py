"""TridentNet detector (reference ``mmdet/models/detectors/trident_faster_rcnn.py``
+ ``roi_heads/trident_roi_head.py``).

Faster R-CNN C4 over the trident backbone.  The branch axis lives in the
batch axis: training tiles the batch ``num_branch`` times (the reference
repeats images/GTs per branch, ``trident_faster_rcnn.py:60-73``) so every
branch trains on the full GT set with shared weights; inference also runs
branch-folded and keeps only ``test_branch_idx``'s detections (the
reference's single-branch test mode, ``trident_resnet.py:74``).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .two_stage import TwoStageDetector


class Res5BBoxHead(nn.Module):
    """C4 bbox head (reference ``roi_heads/shared_heads/res_layer.py`` +
    ``bbox_heads/bbox_head.py`` with_avg_pool): res5 on 14x14 pooled
    features, global average pool, linear cls/reg.  ``res5`` is a separate
    method so the C4 Mask R-CNN mask branch can reuse the shared res5
    features (reference ``standard_roi_head.py`` share_roi_extractor +
    with_shared_head path)."""

    num_classes: int
    base_planes: int = 512
    num_blocks: int = 3
    reg_class_agnostic: bool = False
    with_reg: bool = True
    style: str = "pytorch"  # res5 stride placement (C4 caffe configs)
    dtype: Any = jnp.float32

    def setup(self):
        from ..backbones.trident_resnet import _Bottleneck

        for b in range(self.num_blocks):
            setattr(
                self, f"res5_{b}",
                _Bottleneck(self.base_planes, stride=2 if b == 0 else 1,
                            style=self.style, dtype=self.dtype),
            )
        self.fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype)
        k = 1 if self.reg_class_agnostic else self.num_classes
        self.fc_reg = nn.Dense(4 * k, dtype=self.dtype)

    def res5(self, x):
        """(R, 14, 14, 1024) pooled RoI features -> (R, 7, 7, 2048)."""
        for b in range(self.num_blocks):
            x = getattr(self, f"res5_{b}")(x)
        return x

    def __call__(self, x):
        x = self.res5(x)
        x = x.mean(axis=(1, 2))
        return self.fc_cls(x), self.fc_reg(x)


class TridentFasterRCNN(TwoStageDetector):
    num_branch: int = 3
    test_branch_idx: int = 1

    def init(self, rng, canvas_hw, batch_size: int = 1):
        # the net only accepts branch-folded batches
        return super().init(
            rng, canvas_hw, batch_size=batch_size * self.num_branch)

    def _tile(self, batch):
        return {
            k: jnp.concatenate([v] * self.num_branch, axis=0)
            for k, v in batch.items()
        }

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        if anchor_valid is not None:
            anchor_valid = jnp.concatenate(
                [anchor_valid] * self.num_branch, axis=0)
        return super().loss(
            variables, rng, self._tile(batch), anchors, num_level_anchors,
            anchor_valid=anchor_valid, axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        b = batch["images"].shape[0]
        out = super().predict(
            variables, self._tile(batch), anchors, num_level_anchors,
            rescale=rescale,
        )
        tb = self.test_branch_idx
        return tuple(o[tb * b:(tb + 1) * b] for o in out)
