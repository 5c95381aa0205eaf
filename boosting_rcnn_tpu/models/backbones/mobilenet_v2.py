"""MobileNetV2 backbone (reference ``mmdet/models/backbones/mobilenet_v2.py``):
conv stem + 7 inverted-residual stages (+ out conv as stage 8), ReLU6,
``widen_factor`` channel scaling, ``out_indices`` defaulting to the
stride-4/8/16/32 stage outputs."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, LiveBatchNorm


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


# (expand_ratio, channel, num_blocks, stride) per stage
ARCH = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        identity = x
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = self._norm("expand_bn")(y)
            y = relu6(y)
        y = nn.Conv(
            hidden, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=hidden,
            use_bias=False, dtype=self.dtype, name="depthwise_conv",
        )(y)
        y = self._norm("depthwise_bn")(y)
        y = relu6(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="linear_conv")(y)
        y = self._norm("linear_bn")(y)
        if self.stride == 1 and cin == self.out_channels:
            return identity + y
        return y


class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Tuple[int, ...] = (1, 2, 4, 7)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        live = not self.norm_eval
        ncls = LiveBatchNorm if live else FrozenBatchNorm
        c = _make_divisible(32 * self.widen_factor)
        x = nn.Conv(c, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = ncls(dtype=self.dtype, name="bn1")(x)
        x = relu6(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for stage, (er, ch, n, s) in enumerate(ARCH):
            cout = _make_divisible(ch * self.widen_factor)
            for b in range(n):
                x = InvertedResidual(
                    cout, stride=s if b == 0 else 1, expand_ratio=er,
                    live_bn=live, dtype=self.dtype,
                    name=f"layer{stage+1}_{b}",
                )(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        if 7 in self.out_indices:
            c8 = (
                _make_divisible(1280 * self.widen_factor)
                if self.widen_factor > 1.0
                else 1280
            )
            x = nn.Conv(c8, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv2")(x)
            x = ncls(dtype=self.dtype, name="bn2")(x)
            x = relu6(x)
            outs.append(x)
        return tuple(outs)
