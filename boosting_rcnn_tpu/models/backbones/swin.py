"""Swin Transformer backbone (flax, NHWC).

Behavioural spec: reference ``mmdet/models/backbones/swin.py:465`` (Swin-T:
patch 4, depths (2,2,6,2), heads (3,6,12,24), window 7, shifted windows with
relative position bias, patch merging between stages, per-stage LayerNorm
outputs).  TPU notes: window partition is pure reshape/transpose on static
shapes; the shifted-window attention mask is a compile-time constant; the
W-MSA matmuls batch all windows together for the MXU.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(win: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Compile-time attention mask for SW-MSA: (num_windows, N, N) with
    -100 where tokens come from different shifted regions."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    win = np.asarray(window_partition(jnp.asarray(img_mask), ws))[..., 0]
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """x: (nW, N, C); mask: (num_windows_per_img, N, N) or None."""
        nw, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(nw, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (head_dim**-0.5)
        attn = jnp.einsum("whnd,whmd->whnm", q, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        rpi = relative_position_index(ws)
        bias = rpb_table[rpi.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw_img = mask.shape[0]
            attn = attn.reshape(nw // nw_img, nw_img, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C).  Window padding is per block with zeros after
        norm1 and sliced away after the reverse shift — EXACTLY the
        reference order (``swin.py:178-247`` ShiftWindowMSA pads the
        normed query and crops back to H, W); carrying the padded region
        across blocks would let attention mix stale pad values into the
        boundary windows of the next block."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(hp, wp, ws, self.shift))
        else:
            mask = None
        win = window_partition(y, ws)
        win = WindowAttention(
            self.dim, self.num_heads, ws, dtype=self.dtype, name="attn"
        )(win, mask)
        y = window_reverse(win, ws, hp, wp)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            h, w = h + pad_h, w + pad_w
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin backbone; defaults = Swin-T."""

    embed_dims: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ps = self.patch_size
        b, h, w, _ = x.shape
        pad_h = (-h) % ps
        pad_w = (-w) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(
            self.embed_dims, (ps, ps), strides=(ps, ps), dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = self.embed_dims
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[stage],
                    window_size=self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{stage}")(x)
                )
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim * 2, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
        return tuple(outs)
