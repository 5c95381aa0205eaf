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


class LiveBatchNorm(nn.Module):
    """BatchNorm with live statistics (reference SyncBN surface,
    SURVEY.md §2.3): when the train step applies the net with
    ``mutable=['batch_stats']`` this computes batch statistics and updates
    the running averages; in a non-mutable apply (inference) it uses the
    running averages — identical to FrozenBatchNorm numerics.

    Cross-replica semantics: under pjit with a sharded batch axis the mean/
    var reductions are *global* (XLA inserts the collectives), which IS
    SyncBN — no axis_name needed.  torch BN ``momentum=0.1`` corresponds to
    flax ``momentum=0.9`` (flax keeps ``m*old + (1-m)*new``)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        train = self.is_mutable_collection("batch_stats")
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)


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
            num_groups=norm_cfg.get("num_groups", 32),
            epsilon=1e-5,  # torch GroupNorm eps (flax default is 1e-6)
            dtype=dtype,
        )
    if t == "LN":
        return nn.LayerNorm(dtype=dtype)
    raise ValueError(f"unknown norm {t}")


class ConvModule(nn.Module):
    """conv + norm + activation, channels-last (mmcv ``ConvModule``); a
    ``conv_cfg`` of type DCN/DCNv2 swaps the conv for a deformable one."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act: Optional[str] = "relu"
    bias: Optional[bool] = None  # default: no bias when normed
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.bias if self.bias is not None else self.norm_cfg is None
        pad = self.dilation * (self.kernel_size - 1) // 2
        if is_dcn(self.conv_cfg):
            x = DeformConv(
                self.out_channels,
                self.kernel_size,
                self.stride,
                self.dilation,
                deform_groups=self.conv_cfg.get("deform_groups", 1),
                modulated=self.conv_cfg["type"] == "DCNv2",
                use_bias=use_bias,
                dtype=self.dtype,
            )(x)
        elif self.conv_cfg is not None and self.conv_cfg.get("type") == "ConvWS":
            from .plugins import WSConv

            x = WSConv(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=use_bias,
                dtype=self.dtype,
            )(x)
        else:
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


class DeformConv(nn.Module):
    """Deformable conv v1/v2 (mmcv ``DeformConv2dPack`` /
    ``ModulatedDeformConv2dPack``): a zero-initialised regular conv predicts
    per-tap offsets (+ modulation logits for v2), then the gather-based
    ``ops.deform_conv2d`` samples and contracts on the MXU.  Zero init makes
    the layer equal a plain conv at start (pretrained warm-start
    behaviour)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    deform_groups: int = 1
    modulated: bool = False  # v2
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import deform_conv2d, split_modulated_offset

        k = self.kernel_size
        kk = k * k
        pad = self.dilation * (k - 1) // 2
        off_ch = self.deform_groups * (3 if self.modulated else 2) * kk
        raw = nn.Conv(
            off_ch,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(x)
        if self.modulated:
            offset, mask = split_modulated_offset(raw, self.deform_groups, kk)
        else:
            offset, mask = raw, None
        cin = x.shape[-1]
        # named "kernel" (HWIO) so the torch->JAX converter's generic
        # conv-weight mapping (OIHW "weight" -> "kernel") lands here
        weight = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin, self.out_channels),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return deform_conv2d(
            x,
            offset,
            weight.astype(self.dtype),
            bias=bias,
            mask=mask,
            stride=self.stride,
            padding=pad,
            dilation=self.dilation,
            deform_groups=self.deform_groups,
        )


def is_dcn(conv_cfg: Optional[dict]) -> bool:
    return conv_cfg is not None and conv_cfg.get("type") in ("DCN", "DCNv2")


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
