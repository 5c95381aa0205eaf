"""PanopticFPN semantic head (reference
``mmdet/models/seg_heads/panoptic_fpn_head.py:12`` + ``utils/ConvUpsample``).

Each FPN level P2..P5 runs ``i`` conv(GN)+2x-upsample stages down to 1/4
scale, the per-level maps are summed and a 1x1 conv emits
``num_stuff + 1`` logits (all thing classes merge into one foreground
channel).  Loss is pixel CE after the reference's ``_set_things_to_void``
label remap."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvUpsample(nn.Module):
    """``num_layers`` conv(GN, relu) blocks with ``num_upsample`` 2x
    bilinear upsamples interleaved (reference ``models/utils/conv_upsample``)."""

    channels: int
    num_layers: int = 1
    num_upsample: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ups = self.num_upsample
        for i in range(self.num_layers):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.GroupNorm(
                num_groups=min(32, self.channels), epsilon=1e-5,
                dtype=self.dtype, name=f"gn_{i}",
            )(x)
            x = nn.relu(x)
            if ups > 0:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
                ups -= 1
        return x


class PanopticFPNHead(nn.Module):
    """num_classes = num_stuff + 1 (merged-things channel last... reference
    maps stuff ids to [0, num_stuff) and things to channel num_stuff)."""

    num_classes: int = 54  # COCO: 53 stuff + 1 merged-things
    inner_channels: int = 128
    start_level: int = 0
    end_level: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs = []
        ref_shape = None
        for i in range(self.start_level, self.end_level):
            f = ConvUpsample(
                self.inner_channels,
                num_layers=i if i > 0 else 1,
                num_upsample=i if i > 0 else 0,
                dtype=self.dtype,
                name=f"conv_upsample_{i}",
            )(feats[i])
            if ref_shape is None:
                ref_shape = f.shape
            if f.shape[1] != ref_shape[1] or f.shape[2] != ref_shape[2]:
                # odd input sizes: repeated 2x upsamples can overshoot the
                # P2 grid by a pixel — align by resize
                f = jax.image.resize(f, ref_shape, "bilinear")
            outs.append(f)
        x = sum(outs)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_logits")(x).astype(jnp.float32)


def set_things_to_void(
    gt_seg: jnp.ndarray, num_things: int, num_stuff: int
) -> jnp.ndarray:
    """Reference ``_set_things_to_void``: stuff ids [num_things,
    num_things+num_stuff) -> [0, num_stuff); all thing ids -> num_stuff;
    anything else -> ignore (255)."""
    g = gt_seg.astype(jnp.int32)
    is_thing = (g >= 0) & (g < num_things)
    is_stuff = (g >= num_things) & (g < num_things + num_stuff)
    out = jnp.full_like(g, 255)
    out = jnp.where(is_stuff, g - num_things, out)
    out = jnp.where(is_thing, num_stuff, out)
    return out


def panoptic_seg_loss(
    seg_logits: jnp.ndarray,  # (B, h, w, num_stuff + 1)
    gt_semantic_seg: jnp.ndarray,  # (B, H, W) panoptic class ids
    num_things: int,
    num_stuff: int,
    loss_weight: float = 0.5,
) -> jnp.ndarray:
    from ..roi_heads.mask_head import semantic_seg_loss

    b, h, w, _ = seg_logits.shape
    gt = set_things_to_void(gt_semantic_seg, num_things, num_stuff)
    # downsample labels to the prediction grid (nearest)
    gt = jax.image.resize(
        gt.astype(jnp.float32)[..., None], (b, h, w, 1), "nearest"
    )[..., 0].astype(jnp.int32)
    return loss_weight * semantic_seg_loss(seg_logits, gt, ignore_index=255)
