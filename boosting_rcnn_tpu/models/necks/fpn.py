"""FPN and PAFPN necks (flax, NHWC).

Behavioural spec: reference ``mmdet/models/necks/fpn.py:12`` and
``pafpn.py:12-158`` (top-down nearest-neighbour merge, extra levels via
maxpool or extra convs 'on_input'/'on_lateral'/'on_output', PAFPN bottom-up
``downsample_convs``/``pafpn_convs`` augmentation).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvModule, bilinear_resize, max_pool


class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Any = False  # False | 'on_input' | 'on_lateral' | 'on_output'
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    norm_cfg: Optional[dict] = None
    act: Optional[str] = None
    dtype: Any = jnp.float32

    def _levels(self):
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        return self.start_level, end

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]):
        start, end = self._levels()
        used = end - start
        extra = self.add_extra_convs
        if extra is True:
            extra = "on_input"

        laterals = [
            ConvModule(
                self.out_channels,
                1,
                norm_cfg=None if self.no_norm_on_lateral else self.norm_cfg,
                act=self.act,
                dtype=self.dtype,
                name=f"lateral_{i}",
            )(inputs[start + i])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + bilinear_resize(
                laterals[i], laterals[i - 1].shape[-3:-1]
            )
        outs = [
            ConvModule(
                self.out_channels, 3, norm_cfg=self.norm_cfg, act=self.act,
                dtype=self.dtype, name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in range(used)
        ]
        outs = self._add_extra_levels(outs, inputs, laterals, used, end, extra)
        return tuple(outs)

    def _add_extra_levels(self, outs, inputs, laterals, used, end, extra):
        if self.num_outs <= len(outs):
            return outs
        if not extra:
            for _ in range(self.num_outs - used):
                outs.append(max_pool(outs[-1], 1, 2, padding="VALID"))
            return outs
        if extra == "on_input":
            src = inputs[end - 1]
        elif extra == "on_lateral":
            src = laterals[-1]
        else:  # on_output
            src = outs[-1]
        outs.append(
            ConvModule(
                self.out_channels, 3, stride=2, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"fpn_conv_{used}",
            )(src)
        )
        for i in range(used + 1, self.num_outs):
            s = nn.relu(outs[-1]) if self.relu_before_extra_convs else outs[-1]
            outs.append(
                ConvModule(
                    self.out_channels, 3, stride=2, norm_cfg=self.norm_cfg,
                    act=self.act, dtype=self.dtype, name=f"fpn_conv_{i}",
                )(s)
            )
        return outs


class PAFPN(FPN):
    """FPN + bottom-up path aggregation (reference ``pafpn.py:100-158``)."""

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]):
        start, end = self._levels()
        used = end - start
        extra = self.add_extra_convs
        if extra is True:
            extra = "on_input"

        laterals = [
            ConvModule(
                self.out_channels,
                1,
                norm_cfg=None if self.no_norm_on_lateral else self.norm_cfg,
                act=self.act,
                dtype=self.dtype,
                name=f"lateral_{i}",
            )(inputs[start + i])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + bilinear_resize(
                laterals[i], laterals[i - 1].shape[-3:-1]
            )
        inter = [
            ConvModule(
                self.out_channels, 3, norm_cfg=self.norm_cfg, act=self.act,
                dtype=self.dtype, name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in range(used)
        ]
        # bottom-up augmentation
        for i in range(used - 1):
            inter[i + 1] = inter[i + 1] + ConvModule(
                self.out_channels, 3, stride=2, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"downsample_{i}",
            )(inter[i])
        outs = [inter[0]] + [
            ConvModule(
                self.out_channels, 3, norm_cfg=self.norm_cfg, act=self.act,
                dtype=self.dtype, name=f"pafpn_conv_{i-1}",
            )(inter[i])
            for i in range(1, used)
        ]
        outs = self._add_extra_levels(outs, inputs, laterals, used, end, extra)
        return tuple(outs)


class ChannelMapper(nn.Module):
    """1x1 conv per level to a common channel count (reference
    ``necks/channel_mapper.py``)."""

    out_channels: int = 256
    kernel_size: int = 1
    norm_cfg: Optional[dict] = None
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        return tuple(
            ConvModule(
                self.out_channels, self.kernel_size, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"map_{i}",
            )(x)
            for i, x in enumerate(inputs)
        )
