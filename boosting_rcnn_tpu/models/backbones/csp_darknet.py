"""CSPDarknet backbone (YOLOX).

Spec: reference ``mmdet/models/backbones/csp_darknet.py`` (Focus stem,
4 stages of stride-2 conv + CSPLayer, SPP bottleneck in the last stage,
SiLU activations, P5 arch scaled by deepen/widen factors) +
``mmdet/models/utils/csp_layer.py`` (CSPLayer / DarknetBottleneck).

BN is live (reference trains YOLOX from scratch with live BN): when the
train step applies the net with ``mutable=['batch_stats']`` the stats are
batch-computed and the running averages update; non-mutable applies use the
running averages (identical to frozen-BN inference numerics).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers import LiveBatchNorm, max_pool


class CBS(nn.Module):
    """Conv + BN + SiLU."""

    ch: int
    k: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) // 2
        x = nn.Conv(
            self.ch, (self.k, self.k), (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = LiveBatchNorm(dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Focus(nn.Module):
    """Space-to-depth 2x stem (reference ``csp_darknet.py:14``)."""

    ch: int
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        patches = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return CBS(self.ch, self.k, dtype=self.dtype, name="conv")(patches)


class DarknetBottleneck(nn.Module):
    ch: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.ch * self.expansion)
        y = CBS(hidden, 1, dtype=self.dtype, name="conv1")(x)
        y = CBS(self.ch, 3, dtype=self.dtype, name="conv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.ch else y


class CSPLayer(nn.Module):
    """Cross-stage partial layer (reference ``csp_layer.py:75``)."""

    ch: int
    num_blocks: int = 1
    shortcut: bool = True
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.ch * self.expand_ratio)
        main = CBS(mid, 1, dtype=self.dtype, name="main_conv")(x)
        short = CBS(mid, 1, dtype=self.dtype, name="short_conv")(x)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(
                mid, shortcut=self.shortcut, expansion=1.0,
                dtype=self.dtype, name=f"block{i}",
            )(main)
        return CBS(self.ch, 1, dtype=self.dtype, name="final_conv")(
            jnp.concatenate([main, short], -1)
        )


class SPPBottleneck(nn.Module):
    ch: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 2
        x = CBS(mid, 1, dtype=self.dtype, name="conv1")(x)
        pools = [
            max_pool(x, k, 1, padding=[(k // 2, k // 2)] * 2)
            for k in self.kernel_sizes
        ]
        return CBS(self.ch, 1, dtype=self.dtype, name="conv2")(
            jnp.concatenate([x, *pools], -1)
        )


# P5 arch: (in_ch, out_ch, num_blocks, add_identity, use_spp) per stage,
# scaled by widen/deepen factors (reference ``csp_darknet.py:169``)
P5_ARCH = (
    (64, 128, 3, True, False),
    (128, 256, 9, True, False),
    (256, 512, 9, True, False),
    (512, 1024, 3, False, True),
)


class CSPDarknet(nn.Module):
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    out_indices: Tuple[int, ...] = (2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w, d = self.widen_factor, self.deepen_factor
        x = Focus(int(64 * w), 3, dtype=self.dtype, name="stem")(x)
        outs = [x]
        for i, (cin, cout, n, identity, spp) in enumerate(P5_ARCH):
            ch = int(cout * w)
            x = CBS(ch, 3, 2, dtype=self.dtype, name=f"stage{i+1}_conv")(x)
            if spp:
                x = SPPBottleneck(ch, dtype=self.dtype, name=f"stage{i+1}_spp")(x)
            x = CSPLayer(
                ch, num_blocks=max(round(n * d), 1), shortcut=identity,
                dtype=self.dtype, name=f"stage{i+1}_csp",
            )(x)
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)


class YOLOXPAFPN(nn.Module):
    """YOLOX path-aggregation neck (reference
    ``mmdet/models/necks/yolox_pafpn.py``): top-down upsample+CSP, then
    bottom-up stride-2 conv+CSP, then per-level 1x1 out convs."""

    out_channels: int = 128
    num_csp_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        n = len(feats)  # expect 3: C3, C4, C5
        chans = [f.shape[-1] for f in feats]
        # top-down
        inner = list(feats)
        laterals = [None] * n
        for i in range(n - 1, 0, -1):
            inner[i] = CBS(chans[i - 1], 1, dtype=self.dtype,
                           name=f"reduce{i}")(inner[i])
            laterals[i] = inner[i]
            up = jnp.repeat(jnp.repeat(inner[i], 2, axis=1), 2, axis=2)
            up = up[:, : inner[i - 1].shape[1], : inner[i - 1].shape[2]]
            inner[i - 1] = CSPLayer(
                chans[i - 1], self.num_csp_blocks, shortcut=False,
                dtype=self.dtype, name=f"td_csp{i-1}",
            )(jnp.concatenate([up, inner[i - 1]], -1))
        # bottom-up
        outs = [inner[0]]
        for i in range(n - 1):
            down = CBS(outs[i].shape[-1], 3, 2, dtype=self.dtype,
                       name=f"down{i}")(outs[i])
            outs.append(
                CSPLayer(
                    chans[i + 1], self.num_csp_blocks, shortcut=False,
                    dtype=self.dtype, name=f"bu_csp{i}",
                )(jnp.concatenate([down, laterals[i + 1]], -1))
            )
        return tuple(
            CBS(self.out_channels, 1, dtype=self.dtype, name=f"out{i}")(o)
            for i, o in enumerate(outs)
        )
