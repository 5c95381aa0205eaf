"""Multi-Scale Deformable Attention (Deformable DETR).

TPU-native equivalent of mmcv's ``MultiScaleDeformableAttention`` CUDA op
(reference call site ``mmdet/models/utils/transformer.py:23``): each query
attends to ``num_points`` bilinear-sampled locations per head per feature
level, weighted by a softmaxed attention vector — pure gathers + small
contractions, no custom kernel needed (the FLOPs are tiny; the op is
gather-bound and XLA fuses the weighting)."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .point_sample import point_sample


def ms_deform_attn(
    value: jnp.ndarray,  # (S, C) flattened multi-level features
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w), ...]
    sampling_locations: jnp.ndarray,  # (Lq, H, L, P, 2) normalized (x, y)
    attention_weights: jnp.ndarray,  # (Lq, H, L, P), softmaxed over L*P
    num_heads: int,
) -> jnp.ndarray:
    """Single image.  grid_sample(align_corners=False) semantics per level."""
    s, c = value.shape
    lq = sampling_locations.shape[0]
    d = c // num_heads
    vh = value.reshape(s, num_heads, d)
    out = jnp.zeros((lq, num_heads, d), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        lvl_v = jax.lax.dynamic_slice_in_dim(vh, start, h * w)
        lvl_v = lvl_v.reshape(h, w, num_heads, d)
        locs = sampling_locations[:, :, lvl]  # (Lq, H, P, 2)
        wts = attention_weights[:, :, lvl]  # (Lq, H, P)
        p = locs.shape[2]

        def per_head(vmap_v, vmap_l, vmap_w):
            # vmap_v: (h, w, d); vmap_l: (Lq, P, 2); vmap_w: (Lq, P)
            samp = point_sample(vmap_v, vmap_l.reshape(lq * p, 2))
            samp = samp.reshape(lq, p, d)
            return jnp.sum(samp * vmap_w[..., None], axis=1)  # (Lq, d)

        lvl_out = jax.vmap(per_head, in_axes=(2, 1, 1), out_axes=1)(
            lvl_v, locs, wts
        )  # (Lq, H, d)
        out = out + lvl_out
        start += h * w
    return out.reshape(lq, c)
