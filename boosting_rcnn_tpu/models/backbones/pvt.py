"""Pyramid Vision Transformer v1/v2 (reference
``mmdet/models/backbones/pvt.py``: ``PyramidVisionTransformer`` and
``PyramidVisionTransformerV2``).

Four stages of overlapping/non-overlapping patch embedding + transformer
encoder layers with Spatial-Reduction Attention (SRA: keys/values computed
on an ``sr_ratio``-strided conv reduction of the map,
``SpatialReductionAttention:100``).  v1 adds bilinear-resized absolute
position embeddings per stage; v2 uses zero-padded overlapping patch embeds,
conv-FFN (depthwise 3x3 between the FC layers) and a stage-end LayerNorm.
Attention runs as batched MXU matmuls over the flattened token axis; no
dynamic shapes (canvas is fixed per compile).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        if self.sr_ratio > 1:
            kv = x.reshape(b, h, w, c)
            kv = nn.Conv(self.dim, (self.sr_ratio,) * 2,
                         (self.sr_ratio,) * 2, dtype=self.dtype,
                         name="sr")(kv)
            kv = kv.reshape(b, -1, c)
            kv = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name="sr_norm")(kv)
        else:
            kv = x
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            use_bias=self.qkv_bias, dtype=self.dtype, name="attn",
        )(x, kv)


class PVTLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    use_conv_ffn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            dtype=self.dtype, name="attn")(y, hw)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hdim = self.dim * self.mlp_ratio
        y = nn.Dense(hdim, dtype=self.dtype, name="fc1")(y)
        if self.use_conv_ffn:  # PVTv2 conv-FFN: depthwise 3x3 between FCs
            h, w = hw
            b = y.shape[0]
            y = y.reshape(b, h, w, hdim)
            y = nn.Conv(hdim, (3, 3), padding=[(1, 1), (1, 1)],
                        feature_group_count=hdim, dtype=self.dtype,
                        name="dwconv")(y)
            y = y.reshape(b, h * w, hdim)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class PVT(nn.Module):
    embed_dims: int = 64
    num_layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    strides: Sequence[int] = (4, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    use_abs_pos_embed: bool = True  # v1
    use_conv_ffn: bool = False  # v2
    norm_after_stage: bool = False  # v2
    pretrain_img_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for s in range(len(self.num_layers)):
            dim = self.embed_dims * self.num_heads[s]
            p, st = self.patch_sizes[s], self.strides[s]
            if self.use_conv_ffn:  # v2: overlapping, zero-padded
                pad = p // 2
            else:
                pad = 0
            x = nn.Conv(dim, (p, p), (st, st), padding=[(pad, pad)] * 2,
                        dtype=self.dtype, name=f"patch_embed{s}")(x)
            b, h, w, _ = x.shape
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"embed_norm{s}")(x.reshape(b, h * w, dim))
            if self.use_abs_pos_embed:
                grid = self.pretrain_img_size // (4 * 2 ** s)
                pe = self.param(
                    f"pos_embed{s}", nn.initializers.truncated_normal(0.02),
                    (1, grid, grid, dim))
                pe = jax.image.resize(pe, (1, h, w, dim), "bilinear")
                x = x + pe.reshape(1, h * w, dim).astype(x.dtype)
            for l in range(self.num_layers[s]):
                x = PVTLayer(dim, self.num_heads[s], self.mlp_ratios[s],
                             self.sr_ratios[s], self.use_conv_ffn,
                             dtype=self.dtype, name=f"stage{s}_layer{l}")(
                                 x, (h, w))
            if self.norm_after_stage:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"stage_norm{s}")(x)
            x = x.reshape(b, h, w, dim)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)
