"""Deformable RoI pooling packs (mmcv ``DeformRoIPoolPack`` /
``ModulatedDeformRoIPoolPack`` — the ``configs/dcn`` dpool/mdpool RoI
layers).

Two-pass structure, faithful to mmcv: a plain pass pools the routed FPN
level; an FC stack on the flattened pooled features predicts per-bin
(dx, dy) offsets (zero-init so the layer starts as plain pooling); the
second pass re-samples with the offsets.  The modulated variant adds a
sigmoid per-bin mask multiplied into the output.

Takes BATCHED inputs (the pure pooling passes are vmapped over the batch;
the FC stack runs once over the flattened (B*R) axis) so the module can
sit inside ``TwoStageNet.roi_out`` without a lifted transform.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_roi_pool import multilevel_deform_roi_pool


class DeformRoIPoolPack(nn.Module):
    out_size: int = 7
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    deform_fc_channels: int = 1024
    gamma: float = 0.1
    modulated: bool = False  # ModulatedDeformRoIPoolPack
    finest_scale: int = 56
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, rois, roi_valid):
        """feats: per-level (B, H, W, C); rois (B, R, 4); valid (B, R)
        -> (B*R, S, S, C)."""
        s = self.out_size
        nl = len(self.strides)

        def plain(fl, rb, vb):
            return multilevel_deform_roi_pool(
                fl, rb, vb, self.strides, None, out_size=s,
                gamma=self.gamma, finest_scale=self.finest_scale,
            )

        pooled0 = jax.vmap(plain)(tuple(feats[:nl]), rois, roi_valid)
        b, r = rois.shape[:2]
        c = pooled0.shape[-1]
        flat = pooled0.reshape(b * r, s * s * c)
        h = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                             name="offset_fc_0")(flat))
        h = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                             name="offset_fc_1")(h))
        off = nn.Dense(
            s * s * 2, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="offset_fc_2",
        )(h).astype(jnp.float32).reshape(b, r, s, s, 2)

        def deform(fl, rb, vb, ob):
            return multilevel_deform_roi_pool(
                fl, rb, vb, self.strides, ob, out_size=s,
                gamma=self.gamma, finest_scale=self.finest_scale,
            )

        out = jax.vmap(deform)(tuple(feats[:nl]), rois, roi_valid, off)
        out = out.reshape(b * r, s, s, c)
        if self.modulated:
            m = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                                 name="mask_fc_0")(flat))
            m = nn.Dense(
                s * s, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="mask_fc_1",
            )(m).astype(jnp.float32)
            mask = jax.nn.sigmoid(m).reshape(b * r, s, s, 1)
            out = out * mask.astype(out.dtype)
        return out
