"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

Replaces the mmcv ``ConvModule``/``build_norm_layer`` bricks the reference
builds its heads and necks from.  Layout is channels-last (TPU native);
computation dtype is configurable (bfloat16 on TPU, float32 in tests) with
float32 parameters.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def mish(x):
    """Mish activation (reference ``atss_rpn_head.py:22-28``)."""
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "swish": jax.nn.swish,
    "mish": mish,
    "gelu": jax.nn.gelu,
    None: lambda x: x,
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm in permanent eval mode (the shipping config freezes BN:
    ``norm_eval=True``, config ``boosting_rcnn_r50_pafpn_1x_utdac.py:14``).

    ``scale``/``bias`` are trainable params; ``mean``/``var`` live in the
    ``batch_stats`` collection and are never updated.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        # fold stats into per-channel scale/shift in f32, then apply in the
        # computation dtype so the elementwise op fuses into the conv
        # epilogue instead of forcing f32 round-trips over full activations
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(x.dtype)
        shift = (bias - mean * jax.lax.rsqrt(var + self.epsilon) * scale).astype(
            x.dtype
        )
        return (x * inv + shift).astype(self.dtype)


class BatchNorm(nn.Module):
    """Trainable BN wrapper (train-mode stats via ``use_running_average``)."""

    epsilon: float = 1e-5
    momentum: float = 0.9
    dtype: Dtype = jnp.float32
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=None,
        )(x)


def make_norm(norm_cfg: Optional[dict], dtype=jnp.float32):
    """Norm factory mirroring the reference's ``norm_cfg`` dict convention."""
    if norm_cfg is None:
        return None
    t = norm_cfg["type"]
    if t in ("BN", "SyncBN", "FrozenBN"):
        # In this framework frozen BN is the default detector norm; SyncBN
        # with live stats is handled by BatchNorm + mesh axis at call sites.
        return FrozenBatchNorm(dtype=dtype)
    if t == "GN":
        return nn.GroupNorm(
            num_groups=norm_cfg.get("num_groups", 32), dtype=dtype
        )
    if t == "LN":
        return nn.LayerNorm(dtype=dtype)
    raise ValueError(f"unknown norm {t}")


class ConvModule(nn.Module):
    """conv + norm + activation, channels-last."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm_cfg: Optional[dict] = None
    act: Optional[str] = "relu"
    bias: Optional[bool] = None  # default: no bias when normed
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.bias if self.bias is not None else self.norm_cfg is None
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=use_bias,
            dtype=self.dtype,
        )(x)
        norm = make_norm(self.norm_cfg, self.dtype)
        if norm is not None:
            x = norm(x)
        return ACTIVATIONS[self.act](x)


class Scale(nn.Module):
    """Learnable scalar multiplier (reference mmcv ``Scale``, used per FPN
    level on the RPN reg branch)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "scale", nn.initializers.constant(self.init_value), (), jnp.float32
        )
        return x * s.astype(x.dtype)


def max_pool(x, window: int, stride: int, padding="SAME"):
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def bilinear_resize(x, out_hw: Tuple[int, int]):
    """Nearest-neighbour upsample used by FPN top-down (the reference uses
    ``F.interpolate(mode='nearest')``)."""
    h, w = out_hw
    return jax.image.resize(
        x, (*x.shape[:-3], h, w, x.shape[-1]), method="nearest"
    )
