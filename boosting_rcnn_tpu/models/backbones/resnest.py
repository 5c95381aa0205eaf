"""ResNeSt backbone (reference ``mmdet/models/backbones/resnest.py``).

ResNet-V1d stem (three 3x3 convs + maxpool), split-attention bottlenecks
(``SplitAttentionConv2d``, reference resnest.py:40: radix-grouped 3x3 conv,
radix-softmax channel attention over the splits), average-pool strides both
in the residual path (``avd_layer``, resnest.py:224) and in the shortcut
(``avg_down``).  Stays NHWC; the radix split is a trailing-axis reshape so
XLA keeps the grouped conv + attention fused on the MXU/VPU.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, LiveBatchNorm

DEPTH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 200: (3, 24, 36, 3)}


class SplitAttentionConv(nn.Module):
    """radix-split 3x3 conv + channel attention (resnest.py:40,125)."""

    channels: int
    stride: int = 1
    radix: int = 2
    reduction_factor: int = 4
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        c, r = self.channels, self.radix
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        y = nn.Conv(c * r, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=r,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        y = nn.relu(self._norm("bn0")(y))
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2), keepdims=True)
        gap = nn.Conv(inter, (1, 1), dtype=self.dtype, name="fc1")(gap)
        gap = nn.relu(self._norm("bn1")(gap))
        atten = nn.Conv(c * r, (1, 1), dtype=self.dtype, name="fc2")(gap)
        if r > 1:
            atten = jax.nn.softmax(atten.reshape(b, 1, 1, r, c), axis=3)
            return (atten * splits).sum(axis=3)
        return jax.nn.sigmoid(atten) * y


class SplAtBottleneck(nn.Module):
    """ResNeSt bottleneck (resnest.py:153): 1x1 -> SplAt 3x3 (+avg-pool
    stride) -> 1x1, avg-down shortcut."""

    planes: int
    stride: int = 1
    radix: int = 2
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(self._norm("bn1")(y))
        y = SplitAttentionConv(self.planes, stride=1, radix=self.radix,
                               live_bn=self.live_bn, dtype=self.dtype,
                               name="conv2")(y)
        if self.stride > 1:  # avd_layer: 3x3 avg pool carries the stride
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=[(1, 1), (1, 1)])
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self._norm("bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride != 1:  # avg_down shortcut (ResNetV1d)
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride),
                    strides=(self.stride, self.stride))
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=self.dtype, name="down_conv")(identity)
            identity = self._norm("down_bn")(identity)
        else:
            identity = x
        return nn.relu(y + identity)


class ResNeSt(nn.Module):
    depth: int = 50
    radix: int = 2
    stem_channels: int = 64
    base_channels: int = 64
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        live = not self.norm_eval
        ncls = LiveBatchNorm if live else FrozenBatchNorm
        half = self.stem_channels // 2
        # V1d deep stem: 3x3 s2 half -> 3x3 half -> 3x3 full, then maxpool
        for i, (ch, s) in enumerate(((half, 2), (half, 1),
                                     (self.stem_channels, 1))):
            x = nn.Conv(ch, (3, 3), (s, s), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"stem_conv{i}")(x)
            x = nn.relu(ncls(dtype=self.dtype, name=f"stem_bn{i}")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for si, n_blocks in enumerate(DEPTH_BLOCKS[self.depth]):
            planes = self.base_channels * 2 ** si
            for b in range(n_blocks):
                x = SplAtBottleneck(
                    planes, stride=2 if (b == 0 and si > 0) else 1,
                    radix=self.radix, live_bn=live, dtype=self.dtype,
                    name=f"layer{si + 1}_{b}")(x)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
