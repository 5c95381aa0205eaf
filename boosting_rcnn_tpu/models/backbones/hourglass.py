"""Stacked Hourglass backbone (reference
``mmdet/models/backbones/hourglass.py``: HourglassNet-104 for CornerNet).

Stem downsamples 4x, then ``num_stacks`` recursive hourglass modules
(5 levels deep, channel schedule (256, 256, 384, 384, 384, 512)) with
inter-stage residual fusion; every stack's output map (stride 4) is
emitted."""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import LiveBatchNorm


class ResBlock(nn.Module):
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        mid = self.out_channels // 2
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(LiveBatchNorm(dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(LiveBatchNorm(dtype=self.dtype, name="bn2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = LiveBatchNorm(dtype=self.dtype, name="bn3")(y)
        if self.stride != 1 or cin != self.out_channels:
            identity = nn.Conv(self.out_channels, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            identity = LiveBatchNorm(dtype=self.dtype, name="down_bn")(
                identity
            )
        else:
            identity = x
        return nn.relu(y + identity)


class HourglassModule(nn.Module):
    depth: int
    channels: Tuple[int, ...]  # len depth+1
    blocks_per_stage: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cur = self.channels[0]
        nxt = self.channels[1]
        up1 = x
        for i in range(self.blocks_per_stage):
            up1 = ResBlock(cur, dtype=self.dtype, name=f"up1_{i}")(up1)
        low = ResBlock(nxt, stride=2, dtype=self.dtype, name="low1_0")(x)
        for i in range(1, self.blocks_per_stage):
            low = ResBlock(nxt, dtype=self.dtype, name=f"low1_{i}")(low)
        if self.depth > 1:
            low = HourglassModule(
                self.depth - 1, self.channels[1:],
                self.blocks_per_stage, dtype=self.dtype, name="low2",
            )(low)
        else:
            for i in range(self.blocks_per_stage):
                low = ResBlock(nxt, dtype=self.dtype, name=f"low2_{i}")(low)
        for i in range(self.blocks_per_stage):
            low = ResBlock(
                cur if i == self.blocks_per_stage - 1 else nxt,
                dtype=self.dtype, name=f"low3_{i}",
            )(low)
        b, h, w, c = up1.shape
        up2 = jax.image.resize(low, (b, h, w, c), "nearest")
        return up1 + up2


class HourglassNet(nn.Module):
    num_stacks: int = 2
    depth: int = 5
    channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    feat_channel: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stem: 7x7 s2 128 + ResBlock 256 s2 -> stride 4
        x = nn.Conv(128, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(LiveBatchNorm(dtype=self.dtype, name="stem_bn")(x))
        x = ResBlock(self.channels[0], stride=2, dtype=self.dtype,
                     name="stem_res")(x)
        outs = []
        for s in range(self.num_stacks):
            y = HourglassModule(self.depth, self.channels, dtype=self.dtype,
                                name=f"hg_{s}")(x)
            y = nn.Conv(self.feat_channel, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"out_conv_{s}")(y)
            y = nn.relu(LiveBatchNorm(dtype=self.dtype, name=f"out_bn_{s}")(y))
            outs.append(y)
            if s < self.num_stacks - 1:
                # inter-stage fusion (reference: conv(x) + conv(y) -> relu
                # -> res block)
                a = nn.Conv(self.channels[0], (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"remap_x_{s}")(x)
                a = LiveBatchNorm(dtype=self.dtype, name=f"remap_x_bn_{s}")(a)
                b_ = nn.Conv(self.channels[0], (1, 1), use_bias=False,
                             dtype=self.dtype, name=f"remap_y_{s}")(y)
                b_ = LiveBatchNorm(dtype=self.dtype, name=f"remap_y_bn_{s}")(b_)
                x = ResBlock(self.channels[0], dtype=self.dtype,
                             name=f"inter_res_{s}")(nn.relu(a + b_))
        return tuple(outs)
