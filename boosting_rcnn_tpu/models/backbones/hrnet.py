"""HRNet backbone (reference ``mmdet/models/backbones/hrnet.py``): parallel
multi-resolution branches with repeated cross-resolution fusion.

Stage 1: 4 bottlenecks at 1/4 scale; transitions spawn branches at
1/8, 1/16, 1/32; stages 2-4 run HRModules (4 BasicBlocks per branch, then
an all-to-all fuse: 1x1+upsample toward higher resolution, strided 3x3
chains toward lower).  Outputs all branch maps (HRFPN consumes them)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, LiveBatchNorm

# (num_modules, num_branches, num_blocks per branch, channels per branch)
ARCH = {
    "w18": dict(
        stage2=(1, 2, (4, 4), (18, 36)),
        stage3=(4, 3, (4, 4, 4), (18, 36, 72)),
        stage4=(3, 4, (4, 4, 4, 4), (18, 36, 72, 144)),
    ),
    "w32": dict(
        stage2=(1, 2, (4, 4), (32, 64)),
        stage3=(4, 3, (4, 4, 4), (32, 64, 128)),
        stage4=(3, 4, (4, 4, 4, 4), (32, 64, 128, 256)),
    ),
    "w40": dict(
        stage2=(1, 2, (4, 4), (40, 80)),
        stage3=(4, 3, (4, 4, 4), (40, 80, 160)),
        stage4=(3, 4, (4, 4, 4, 4), (40, 80, 160, 320)),
    ),
}


class _Basic(nn.Module):
    planes: int
    stride: int = 1
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self._norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            identity = self._norm("down_bn")(identity)
        return nn.relu(y + identity)


class _Bottleneck(nn.Module):
    planes: int
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(self._norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(self._norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self._norm("bn3")(y)
        if x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            identity = self._norm("down_bn")(identity)
        return nn.relu(y + identity)


class HRModule(nn.Module):
    num_branches: int
    num_blocks: Tuple[int, ...]
    channels: Tuple[int, ...]
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, xs):
        # per-branch blocks
        ys = []
        for b in range(self.num_branches):
            y = xs[b]
            for k in range(self.num_blocks[b]):
                y = _Basic(self.channels[b], live_bn=self.live_bn,
                           dtype=self.dtype, name=f"branch{b}_block{k}")(y)
            ys.append(y)
        # all-to-all fusion
        outs = []
        for i in range(self.num_branches):
            acc = None
            hi, wi = ys[i].shape[1], ys[i].shape[2]
            for j in range(self.num_branches):
                if j == i:
                    t = ys[j]
                elif j > i:  # lower res -> 1x1 + upsample
                    t = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f"fuse_{i}_{j}_conv")(ys[j])
                    t = self._norm(f"fuse_{i}_{j}_bn")(t)
                    t = jax.image.resize(
                        t, (t.shape[0], hi, wi, t.shape[-1]), "nearest"
                    )
                else:  # higher res -> chain of strided 3x3
                    t = ys[j]
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        t = nn.Conv(ch, (3, 3), (2, 2),
                                    padding=[(1, 1), (1, 1)], use_bias=False,
                                    dtype=self.dtype,
                                    name=f"fuse_{i}_{j}_conv{s}")(t)
                        t = self._norm(f"fuse_{i}_{j}_bn{s}")(t)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    arch: str = "w32"
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        live = not self.norm_eval
        ncls = LiveBatchNorm if live else FrozenBatchNorm
        cfgs = ARCH[self.arch]
        # stem: two stride-2 3x3
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(ncls(dtype=self.dtype, name=f"bn{i}")(x))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        # stage 1: 4 bottlenecks (64 -> 256)
        for k in range(4):
            x = _Bottleneck(64, live_bn=live, dtype=self.dtype,
                            name=f"layer1_{k}")(x)
        xs = [x]
        prev_channels = [256]
        for si, key in enumerate(("stage2", "stage3", "stage4")):
            num_modules, num_branches, num_blocks, channels = cfgs[key]
            # transition: adapt existing branches + spawn a new lower one
            new_xs = []
            for b in range(num_branches):
                if b < len(xs):
                    if prev_channels[b] != channels[b]:
                        t = nn.Conv(channels[b], (3, 3),
                                    padding=[(1, 1), (1, 1)], use_bias=False,
                                    dtype=self.dtype,
                                    name=f"trans{si}_b{b}_conv")(xs[b])
                        t = nn.relu(
                            ncls(dtype=self.dtype,
                                 name=f"trans{si}_b{b}_bn")(t)
                        )
                        new_xs.append(t)
                    else:
                        new_xs.append(xs[b])
                else:
                    t = nn.Conv(channels[b], (3, 3), (2, 2),
                                padding=[(1, 1), (1, 1)], use_bias=False,
                                dtype=self.dtype,
                                name=f"trans{si}_b{b}_conv")(xs[-1])
                    t = nn.relu(
                        ncls(dtype=self.dtype, name=f"trans{si}_b{b}_bn")(t)
                    )
                    new_xs.append(t)
            xs = new_xs
            for m in range(num_modules):
                xs = HRModule(
                    num_branches, tuple(num_blocks), tuple(channels),
                    live_bn=live, dtype=self.dtype,
                    name=f"{key}_module{m}",
                )(xs)
            prev_channels = list(channels)
        return tuple(xs)
