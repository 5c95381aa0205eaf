"""DetectoRS building blocks (reference
``mmdet/models/backbones/detectors_resnet.py`` + mmcv ``SAConv2d``):
ResNet whose bottlenecks support Switchable Atrous Convolution and a
recursive-feature-pyramid feedback input (``Bottleneck.rfp_forward:73``).

SAC (paper §4.2 / mmcv saconv): one weight-standardised 3x3 kernel run at
dilation 1 and (with a zero-initialised ``weight_diff``) at dilation 3; a
1x1 switch conv on the locally averaged input blends the two, with
zero-initialised global pre/post context 1x1s.  Both dilated convs are
plain XLA convolutions (MXU); the switch is elementwise.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, LiveBatchNorm

DEPTH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SAConv(nn.Module):
    """Switchable Atrous Conv (mmcv ``SAConv2d``), weight-standardised."""

    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        c = self.channels
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, cin, c))
        gamma = self.param("aws_gamma", nn.initializers.ones, (1, 1, 1, c))
        beta = self.param("aws_beta", nn.initializers.zeros, (1, 1, 1, c))
        wd = self.param("weight_diff", nn.initializers.zeros, w.shape)
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        std = w.std(axis=(0, 1, 2), keepdims=True) + 1e-5
        w_hat = gamma * (w - mean) / std + beta

        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + nn.Conv(cin, (1, 1),
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name="pre_context")(gap)
        sw_in = nn.avg_pool(x, (5, 5), strides=(self.stride,) * 2,
                            padding=[(2, 2), (2, 2)])
        switch = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), bias_init=nn.initializers.ones,
                    kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="switch")(sw_in))

        def conv(w_, dil):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), w_.astype(self.dtype),
                window_strides=(self.stride,) * 2,
                padding=[(dil, dil), (dil, dil)],
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out = switch * conv(w_hat, 1) + (1 - switch) * conv(w_hat + wd, 3)
        gap2 = jnp.mean(out, axis=(1, 2), keepdims=True)
        out = out + nn.Conv(c, (1, 1),
                            kernel_init=nn.initializers.zeros,
                            dtype=self.dtype, name="post_context")(gap2)
        return out


class DetBottleneck(nn.Module):
    planes: int
    stride: int = 1
    sac: bool = False
    rfp: bool = False  # accepts a feedback feature
    live_bn: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        cls = LiveBatchNorm if self.live_bn else FrozenBatchNorm
        return cls(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(self._norm("bn1")(y))
        if self.sac:
            y = SAConv(self.planes, stride=self.stride, dtype=self.dtype,
                       name="conv2")(y)
        else:
            y = nn.Conv(self.planes, (3, 3), (self.stride,) * 2,
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="conv2")(y)
        y = nn.relu(self._norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self._norm("bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), (self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = self._norm("down_bn")(identity)
        else:
            identity = x
        out = y + identity
        if self.rfp and rfp_feat is not None:
            out = out + nn.Conv(out_ch, (1, 1),
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                dtype=self.dtype, name="rfp_conv")(rfp_feat)
        return nn.relu(out)


class DetectoRSResNet(nn.Module):
    """ResNet with SAC stages and RFP feedback (``DetectoRS_ResNet``).

    ``__call__(x)`` returns ``(img, C2..C5)`` when ``output_img`` (the RFP
    neck needs the image, reference ``rfp.py:118``); ``rfp_feats`` routes
    the feedback maps to stages 1..3 (``rfp_forward:336``)."""

    depth: int = 50
    base_channels: int = 64
    sac_stages: Tuple[bool, ...] = (False, True, True, True)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    output_img: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rfp_feats: Optional[Sequence] = None):
        img = x
        live = not self.norm_eval
        ncls = LiveBatchNorm if live else FrozenBatchNorm
        y = nn.Conv(self.base_channels, (7, 7), (2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(ncls(dtype=self.dtype, name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)
        outs = []
        for si, n_blocks in enumerate(DEPTH_BLOCKS[self.depth]):
            planes = self.base_channels * 2 ** si
            rfp_feat = (rfp_feats[si] if (rfp_feats is not None and si > 0)
                        else None)
            for b in range(n_blocks):
                y = DetBottleneck(
                    planes, stride=2 if (b == 0 and si > 0) else 1,
                    sac=self.sac_stages[si], rfp=(b == 0), live_bn=live,
                    dtype=self.dtype, name=f"layer{si + 1}_{b}",
                )(y, rfp_feat if b == 0 else None)
            if si + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            if si in self.out_indices:
                outs.append(y)
        if self.output_img:
            return (img,) + tuple(outs)
        return tuple(outs)
