"""Backbone block plugins (reference ``plugins=`` surface on
``mmdet/models/backbones/resnet.py:121-140`` Bottleneck, powering the
gcnet / empirical_attention config families, plus the ConvWS conv_cfg of
gn+ws).

All modules are NHWC flax re-derivations of the published algorithms:

- :class:`ContextBlock` — GCNet global-context block (Cao et al. 2019;
  behaviour spec: mmcv ``bricks/context_block.py``): attention-pooled
  global context vector -> bottleneck channel transform -> broadcast
  add/mul fusion.
- :class:`GeneralizedAttention` — the empirical-attention module (Zhu et
  al. 2019, "An Empirical Study of Spatial Attention Mechanisms";
  behaviour spec: mmcv ``bricks/generalized_attention.py``): the
  four-term decomposed energy ``(q+u)ᵀk + (q+v)ᵀr`` with separable
  sinusoidal relative-position embeddings, selected by the
  ``attention_type`` bitmask ('0010' = key-content-only, '1111' = all).
- :func:`standardize_weight` — ConvWS weight standardization (Qiao et
  al. 2019; mmcv ``conv_ws.py``): per-output-channel zero-mean/unit-std
  reparameterisation of conv kernels, used with GN (gn+ws configs).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ContextBlock(nn.Module):
    """GCNet ContextBlock (``configs/gcnet``; ratio 1/4 or 1/16).

    ``pooling_type='att'``: a 1x1 conv scores every pixel, softmax over
    the spatial extent pools a (C,) context vector; ``'avg'``: global
    average pool.  Fusion: ``channel_add`` (default) and/or
    ``channel_mul`` through a Conv-LN-ReLU-Conv bottleneck.
    """

    ratio: float = 1.0 / 4
    pooling_type: str = "att"
    fusion_types: Tuple[str, ...] = ("channel_add",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            mask = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_mask")(x)
            mask = jax.nn.softmax(
                mask.reshape(n, h * w, 1).astype(jnp.float32), axis=1
            )
            context = jnp.einsum(
                "nsc,nso->nc", x.reshape(n, h * w, c).astype(jnp.float32),
                mask,
            )  # (n, c)
        else:
            context = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        context = context[:, None, None, :]  # (n, 1, 1, c)

        def transform(name):
            y = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f"{name}_conv1")(context.astype(self.dtype))
            # torch LayerNorm([planes, 1, 1]) normalises over channels
            y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(y)
            y = nn.relu(y)
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           name=f"{name}_conv2")(y)

        out = x
        if "channel_mul" in self.fusion_types:
            out = out * jax.nn.sigmoid(transform("channel_mul"))
        if "channel_add" in self.fusion_types:
            out = out + transform("channel_add")
        return out


def _position_embedding(
    q_len: int, kv_len: int, q_stride: int, kv_stride: int,
    feat_dim: int, position_magnitude: float, wave_length: float = 1000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding of scaled 1-D relative positions:
    ``(q_len, kv_len, feat_dim)`` with sin/cos halves (behaviour spec:
    mmcv ``get_position_embedding``)."""
    q_idx = jnp.arange(q_len, dtype=jnp.float32) * q_stride
    kv_idx = jnp.arange(kv_len, dtype=jnp.float32) * kv_stride
    diff = (q_idx[:, None] - kv_idx[None, :]) * position_magnitude
    half = feat_dim // 2
    dim_mat = wave_length ** ((2.0 / feat_dim) * jnp.arange(half))
    angle = diff[..., None] / dim_mat  # (q, kv, half)
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)


class GeneralizedAttention(nn.Module):
    """Empirical attention (``configs/empirical_attention``).

    Energy for query position i, key position j, per head:
    ``E_ij = [0] qᵢᵀk_j + [1] qᵢᵀr_ij + [2] uᵀk_j + [3] vᵀr_ij`` where
    ``r_ij`` is a (separable x/y) projected sinusoidal relative-position
    embedding and u/v are learned per-head bias vectors; terms are
    enabled by the ``attention_type`` bitmask.  Softmax over the
    (kv-strided) key grid, value aggregation, 1x1 output projection,
    residual add.
    """

    num_heads: int = 9
    spatial_range: int = -1  # masking window; -1 (the config value) = off
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = "1111"
    position_embedding_dim: int = -1
    position_magnitude: float = 8.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.spatial_range >= 0:
            raise NotImplementedError(
                "spatial_range masking is not implemented (the shipping "
                "empirical_attention configs use spatial_range=-1)")
        at = [bool(int(ch)) for ch in self.attention_type]
        n, h, w, c = x.shape
        heads = self.num_heads
        qk_dim = c // heads
        pos_dim = self.position_embedding_dim if (
            self.position_embedding_dim > 0) else c

        def subsample(y, stride):
            return y[:, ::stride, ::stride, :] if stride > 1 else y

        x_q = subsample(x, self.q_stride)
        x_kv = subsample(x, self.kv_stride)
        hq, wq = x_q.shape[1:3]
        hk, wk = x_kv.shape[1:3]

        f32 = jnp.float32
        if at[0] or at[1]:
            q = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        dtype=self.dtype, name="query_conv")(x_q)
            q = q.reshape(n, hq, wq, heads, qk_dim).astype(f32)
        if at[0] or at[2]:
            k = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        dtype=self.dtype, name="key_conv")(x_kv)
            k = k.reshape(n, hk, wk, heads, qk_dim).astype(f32)
        v = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                    dtype=self.dtype, name="value_conv")(x_kv)
        v = v.reshape(n, hk, wk, heads, qk_dim).astype(f32)

        stdv = 1.0 / math.sqrt(qk_dim * 2)
        uniform = lambda key, shape: jax.random.uniform(
            key, shape, jnp.float32, -stdv, stdv)
        if at[2]:
            u = self.param("appr_bias", uniform, (heads, qk_dim))
        if at[3]:
            vb = self.param("geom_bias", uniform, (heads, qk_dim))
        if at[1] or at[3]:
            emb_x = _position_embedding(
                wq, wk, self.q_stride, self.kv_stride, pos_dim // 2,
                self.position_magnitude)
            emb_y = _position_embedding(
                hq, hk, self.q_stride, self.kv_stride, pos_dim // 2,
                self.position_magnitude)
            # per-head projections of the x / y embeddings; /sqrt(2)
            # keeps the two separable halves on the content-term scale
            rx = nn.Dense(qk_dim * heads, use_bias=False, dtype=self.dtype,
                          name="appr_geom_fc_x")(emb_x.astype(self.dtype))
            ry = nn.Dense(qk_dim * heads, use_bias=False, dtype=self.dtype,
                          name="appr_geom_fc_y")(emb_y.astype(self.dtype))
            rx = rx.reshape(wq, wk, heads, qk_dim).astype(f32) / math.sqrt(2)
            ry = ry.reshape(hq, hk, heads, qk_dim).astype(f32) / math.sqrt(2)

        # energy accumulates broadcastably over (n, heads, hq, wq, hk, wk)
        energy = jnp.zeros((n, heads, 1, 1, 1, 1), f32)
        if at[0]:
            energy = energy + jnp.einsum(
                "nywhd,nYWhd->nhywYW", q, k)
        if at[2]:
            energy = energy + jnp.einsum(
                "hd,nYWhd->nhYW", u, k)[:, :, None, None]
        if at[1]:
            ex = jnp.einsum("nywhd,wWhd->nhywW", q, rx)[..., None, :]
            ey = jnp.einsum("nywhd,yYhd->nhywY", q, ry)[..., :, None]
            energy = energy + ex + ey
        if at[3]:
            ex = jnp.einsum("hd,wWhd->hwW", vb, rx)
            ey = jnp.einsum("hd,yYhd->hyY", vb, ry)
            energy = energy + (
                ex[None, :, None, :, None, :] + ey[None, :, :, None, :, None]
            )
        energy = jnp.broadcast_to(
            energy, (n, heads, hq, wq, hk, wk)
        ).reshape(n, heads, hq, wq, hk * wk)
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum(
            "nhywS,nShd->nywhd", attn, v.reshape(n, hk * wk, heads, qk_dim)
        ).reshape(n, hq, wq, heads * qk_dim)
        out = nn.Conv(c, (1, 1), dtype=self.dtype,
                      name="proj_conv")(out.astype(self.dtype))
        if self.q_stride > 1:
            out = jax.image.resize(out, (n, h, w, c), "bilinear")
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return x + gamma * out


def standardize_weight(w: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """ConvWS: zero-mean / unit-std over each output filter's fan-in
    (flax kernels are (kh, kw, in, out) — reduce over all but the last
    axis).  Spec: mmcv ``conv_ws.py`` ``conv_ws_2d``."""
    axes = tuple(range(w.ndim - 1))
    mean = jnp.mean(w, axis=axes, keepdims=True)
    std = jnp.std(w, axis=axes, keepdims=True)
    return (w - mean) / (std + eps)


class WSConv(nn.Module):
    """Conv with weight standardization (conv_cfg type 'ConvWS')."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features), jnp.float32,
        )
        kernel = standardize_weight(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel,
            window_strides=self.strides,
            padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def build_plugin(cfg: dict, dtype=jnp.float32, name: Optional[str] = None):
    """Plugin factory for the backbone ``plugins=`` list entries
    (reference ``mmcv.cnn.build_plugin_layer`` dispatch)."""
    t = cfg["type"]
    kw = {k: v for k, v in cfg.items() if k != "type"}
    if t == "ContextBlock":
        kw.pop("in_channels", None)
        return ContextBlock(dtype=dtype, name=name, **kw)
    if t == "GeneralizedAttention":
        kw.pop("in_channels", None)
        return GeneralizedAttention(dtype=dtype, name=name, **kw)
    raise ValueError(f"unknown plugin type {t!r}")
