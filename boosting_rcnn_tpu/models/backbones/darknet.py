"""Darknet-53 backbone (spec: reference ``mmdet/models/backbones/darknet.py``):
stem conv + 5 stages of strided conv + residual (1x1 squeeze, 3x3) blocks
(1, 2, 8, 8, 4); outputs stages 3-5. LeakyReLU(0.1) + BN (frozen)."""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import LiveBatchNorm

STAGE_BLOCKS = (1, 2, 8, 8, 4)


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class ConvBNLeaky(nn.Module):
    ch: int
    k: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) // 2
        x = nn.Conv(
            self.ch, (self.k, self.k), (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = LiveBatchNorm(dtype=self.dtype, name="bn")(x)
        return _leaky(x)


class DarkBlock(nn.Module):
    ch: int  # output channels (residual keeps ch)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBNLeaky(self.ch // 2, 1, dtype=self.dtype, name="conv1")(x)
        y = ConvBNLeaky(self.ch, 3, dtype=self.dtype, name="conv2")(y)
        return x + y


class Darknet(nn.Module):
    out_indices: Tuple[int, ...] = (2, 3, 4)  # stages 3, 4, 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNLeaky(32, 3, dtype=self.dtype, name="stem")(x)
        outs = []
        ch = 64
        for stage, n_blocks in enumerate(STAGE_BLOCKS):
            x = ConvBNLeaky(ch, 3, stride=2, dtype=self.dtype, name=f"down{stage}")(x)
            for b in range(n_blocks):
                x = DarkBlock(ch, dtype=self.dtype, name=f"stage{stage}_block{b}")(x)
            if stage in self.out_indices:
                outs.append(x)
            ch *= 2
        return tuple(outs)
