"""TridentNet ResNet-C4 backbone (reference
``mmdet/models/backbones/trident_resnet.py``).

Stages conv1..res3 are a standard ResNet; the last stage (res4, stride 16)
is replaced by trident blocks: every 3x3 conv runs ``num_branch`` times
with different dilations but ONE shared weight set
(``TridentConv:70-120``), and the branch axis is folded into the batch axis
(``(B) -> (num_branch*B)``) from the first trident block on.  At test time
only ``test_branch_idx`` runs (``trident_resnet.py:74-86``).

TPU note: sharing is expressed by applying the same ``self.param`` kernels
under different ``rhs_dilation`` — three XLA convolutions per block, all
MXU-eligible, no weight copies.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm

C4_BLOCKS = {50: (3, 4, 6), 101: (3, 4, 23)}


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    style: str = "pytorch"  # 'caffe': stride on conv1 (C4 caffe configs)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        c1s = self.stride if self.style == "caffe" else 1
        c2s = 1 if self.style == "caffe" else self.stride
        y = nn.Conv(self.planes, (1, 1), (c1s,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), (c2s,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), (self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="down_bn")(
                identity)
        else:
            identity = x
        return nn.relu(y + identity)


class TridentBottleneck(nn.Module):
    """One res4 bottleneck applied per branch with shared weights
    (``TridentBottleneck`` in the reference)."""

    planes: int
    dilations: Tuple[int, ...]
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        nb = len(self.dilations)
        cin = x.shape[-1]
        w1 = self.param("conv1", nn.initializers.he_normal(),
                        (1, 1, cin, self.planes))
        w2 = self.param("conv2", nn.initializers.he_normal(),
                        (3, 3, self.planes, self.planes))
        w3 = self.param("conv3", nn.initializers.he_normal(),
                        (1, 1, self.planes, out_ch))
        bn1 = FrozenBatchNorm(dtype=self.dtype, name="bn1")
        bn2 = FrozenBatchNorm(dtype=self.dtype, name="bn2")
        bn3 = FrozenBatchNorm(dtype=self.dtype, name="bn3")
        need_down = self.stride != 1 or cin != out_ch
        if need_down:
            wd = self.param("down_conv", nn.initializers.he_normal(),
                            (1, 1, cin, out_ch))
            bnd = FrozenBatchNorm(dtype=self.dtype, name="down_bn")

        def conv(t, w, stride=1, dil=1):
            pad = dil if w.shape[0] == 3 else 0
            return jax.lax.conv_general_dilated(
                t.astype(self.dtype), w.astype(self.dtype),
                (stride, stride), [(pad, pad), (pad, pad)],
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def branch(t, dil):
            y = nn.relu(bn1(conv(t, w1)))
            y = nn.relu(bn2(conv(y, w2, self.stride, dil)))
            y = bn3(conv(y, w3))
            ident = bnd(conv(t, wd, self.stride)) if need_down else t
            return nn.relu(y + ident)

        # branch-folded batch: split (nb*B) -> nb groups, one dilation
        # each, shared weights, refold
        parts = jnp.split(x, nb, axis=0)
        return jnp.concatenate(
            [branch(p, d) for p, d in zip(parts, self.dilations)], axis=0)


class TridentResNet(nn.Module):
    depth: int = 50
    base_channels: int = 64
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    frozen_stages: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: branch-folded batch ``(num_branch*B, H, W, 3)`` — the
        detector tiles the batch before the stem (cheaper per-branch
        folding only at res4, as the reference does, is a possible
        optimisation; weights are identical either way)."""
        y = nn.Conv(self.base_channels, (7, 7), (2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)
        blocks = C4_BLOCKS[self.depth]
        for si in range(2):  # res2, res3
            planes = self.base_channels * 2 ** si
            for b in range(blocks[si]):
                y = _Bottleneck(planes, stride=2 if (b == 0 and si > 0)
                                else 1, dtype=self.dtype,
                                name=f"layer{si + 1}_{b}")(y)
            if si + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
        # res4 trident stage, stride 2
        planes = self.base_channels * 4
        for b in range(blocks[2]):
            y = TridentBottleneck(
                planes, tuple(self.trident_dilations),
                stride=2 if b == 0 else 1, dtype=self.dtype,
                name=f"layer3_{b}")(y)
        return (y,)  # single C4 level (branch-folded batch)
