"""RegNetX backbones (reference ``mmdet/models/backbones/regnet.py``):
quantized-linear width schedule grouped into stages of X-bottleneck blocks
(bottleneck ratio 1, grouped 3x3), 32-channel stem, strides 2/2/2/2."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import FrozenBatchNorm, LiveBatchNorm

ARCH_SETTINGS = {
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
}


def generate_regnet(w0: int, wa: float, wm: float, depth: int,
                    divisor: int = 8):
    """Per-block widths from the quantized linear rule (reference
    ``generate_regnet``)."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / divisor) * divisor).astype(int)
    stage_widths, stage_depths = [], []
    for w in widths:
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(int(w))
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    return stage_widths, stage_depths


def adjust_groups(widths, group_w):
    groups = [min(group_w, w) for w in widths]
    widths = [int(round(w / g) * g) for w, g in zip(widths, groups)]
    return widths, groups


class XBlock(nn.Module):
    """RegNetX bottleneck (ratio 1): 1x1 -> grouped 3x3 (stride) -> 1x1."""

    width: int
    stride: int = 1
    groups: int = 1
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        identity = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(self._norm("bn1")(y))
        y = nn.Conv(
            self.width, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(self._norm("bn2")(y))
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self._norm("bn3")(y)
        if self.stride != 1 or cin != self.width:
            identity = nn.Conv(
                self.width, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = self._norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class RegNet(nn.Module):
    arch: str = "regnetx_3.2gf"
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = ARCH_SETTINGS[self.arch]
        widths, depths = generate_regnet(p["w0"], p["wa"], p["wm"],
                                         p["depth"])
        widths, groups = adjust_groups(widths, p["group_w"])
        live = not self.norm_eval
        ncls = LiveBatchNorm if live else FrozenBatchNorm
        x = nn.Conv(32, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(ncls(dtype=self.dtype, name="bn1")(x))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for stage, (w, d, g) in enumerate(zip(widths, depths, groups)):
            for b in range(d):
                x = XBlock(
                    width=w, stride=2 if b == 0 else 1, groups=g,
                    live_bn=live, dtype=self.dtype,
                    name=f"layer{stage+1}_{b}",
                )(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
