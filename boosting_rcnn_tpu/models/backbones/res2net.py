"""Res2Net backbone (spec: reference ``mmdet/models/backbones/res2net.py``:
Bottle2neck with hierarchical multi-scale 3x3 convs inside the bottleneck,
``scales=4``, ``base_width=26``, deep stem)."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import DeformConv, FrozenBatchNorm, max_pool
from .resnet import ARCH_SETTINGS


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64
    expansion: int = 4
    dcn: Optional[dict] = None  # per-scale 3x3s become deformable
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / self.base_channels))
        total_width = width * self.scales
        out_ch = self.planes * self.expansion
        identity = x

        y = nn.Conv(total_width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)

        # hierarchical splits: sp_i = conv(sp_i + out_{i-1}); the first split
        # passes through (stage mode: avg-pooled when stride > 1)
        splits = jnp.split(y, self.scales, axis=-1)
        outs = []
        prev = None
        stage_mode = self.stride > 1 or self.downsample
        for i in range(self.scales - 1):
            sp = splits[i]
            if prev is not None and not stage_mode:
                sp = sp + prev
            if self.dcn is not None:
                sp = DeformConv(
                    width, 3, self.stride,
                    deform_groups=self.dcn.get("deform_groups", 1),
                    modulated=self.dcn.get("type", "DCNv2") == "DCNv2",
                    dtype=self.dtype, name=f"conv2_{i}",
                )(sp)
            else:
                sp = nn.Conv(
                    width, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name=f"conv2_{i}",
                )(sp)
            sp = FrozenBatchNorm(dtype=self.dtype, name=f"bn2_{i}")(sp)
            sp = nn.relu(sp)
            outs.append(sp)
            prev = sp
        last = splits[-1]
        if stage_mode and self.stride > 1:
            last = nn.avg_pool(
                last, (3, 3), strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
            )
        outs.append(last)
        y = jnp.concatenate(outs, axis=-1)

        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                out_ch, (1, 1), (self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Res2Net(nn.Module):
    depth: int = 101
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    base_channels: int = 64
    scales: int = 4
    base_width: int = 26
    frozen_stages: int = -1
    dcn: Optional[dict] = None
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        stem = self.base_channels
        # deep stem (Res2Net uses 3x 3x3 stem convs)
        for i, (ch, s) in enumerate([(stem // 2, 2), (stem // 2, 1), (stem, 1)]):
            x = nn.Conv(
                ch, (3, 3), (s, s), padding=[(1, 1), (1, 1)], use_bias=False,
                dtype=self.dtype, name=f"stem_conv{i+1}",
            )(x)
            x = FrozenBatchNorm(dtype=self.dtype, name=f"stem_bn{i+1}")(x)
            x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=[(1, 1), (1, 1)])

        outs = []
        planes = self.base_channels
        for stage, num_blocks in enumerate(stage_blocks):
            for b in range(num_blocks):
                x = Bottle2neck(
                    planes=planes,
                    stride=self.strides[stage] if b == 0 else 1,
                    downsample=(b == 0),
                    scales=self.scales,
                    base_width=self.base_width,
                    base_channels=self.base_channels,
                    dcn=self.dcn if self.stage_with_dcn[stage] else None,
                    dtype=self.dtype,
                    name=f"layer{stage+1}_{b}",
                )(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
