"""Deformable convolution v1/v2 (TPU-native).

Replaces mmcv's ``DeformConv2d`` / ``ModulatedDeformConv2d`` CUDA kernels
(reference call sites: ``mmdet/models/dense_heads/atss_rpn_head.py:75-107``
``DCNModule`` with ``DeformConv2dPack``; backbone ``dcn=dict(...)`` stages in
``configs/dcn/`` and ``configs/boosting_rcnn/boosting_rcnn_r2_101_dcn_*``).

TPU design: no scatter/CUDA atomics — the sampled-taps tensor is built with
bilinear **gathers** (4 per tap, differentiable; backward becomes
scatter-add handled by XLA) and the channel contraction is one big MXU
matmul over ``(B*Ho*Wo, KK*Cin) x (KK*Cin, Cout)`` — the same
im2col-as-matmul shape XLA uses for plain convs, so the FLOPs land on the
systolic array.

Offset layout matches mmcv exactly: ``offset`` has ``dg*KK*2`` channels,
interleaved ``(dy, dx)`` per tap in row-major tap order (mmcv
``deform_conv_cuda_kernel`` reads ``2*(i*kw+j)`` for y and ``+1`` for x);
v2 appends ``dg*KK`` mask channels passed through a sigmoid by the caller
(``ModulatedDeformConv2dPack.forward``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(
    img: jnp.ndarray,  # (H, W, C)
    y: jnp.ndarray,  # (P,) float sample rows
    x: jnp.ndarray,  # (P,) float sample cols
) -> jnp.ndarray:
    """Sample img at fractional (y, x) with zero padding outside (mmcv
    border semantics: taps fully outside contribute 0)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def corner(yy, xx, wgt):
        inside = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        vals = img[yi, xi]  # (P, C) gather
        return vals * (wgt * inside.astype(img.dtype))[:, None]

    return (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x0 + 1, wy0 * wx1)
        + corner(y0 + 1, x0, wy1 * wx0)
        + corner(y0 + 1, x0 + 1, wy1 * wx1)
    )


def deform_conv2d(
    x: jnp.ndarray,  # (B, H, W, Cin) NHWC
    offset: jnp.ndarray,  # (B, Ho, Wo, dg*KK*2) interleaved (dy, dx) per tap
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,  # (Cout,)
    mask: Optional[jnp.ndarray] = None,  # (B, Ho, Wo, dg*KK), already sigmoid
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """Deformable conv; with ``mask`` it is DCNv2 (modulated)."""
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    assert wcin == cin, (wcin, cin)
    kk = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deform_groups
    assert cin % dg == 0, (cin, dg)
    assert offset.shape[-1] == dg * kk * 2, (offset.shape, dg, kk)

    # base sampling grid per output position and tap
    oy = jnp.arange(ho, dtype=x.dtype) * stride - padding  # (Ho,)
    ox = jnp.arange(wo, dtype=x.dtype) * stride - padding  # (Wo,)
    ky = jnp.arange(kh, dtype=x.dtype) * dilation  # (kh,)
    kx = jnp.arange(kw, dtype=x.dtype) * dilation  # (kw,)
    tap_y = jnp.repeat(ky, kw)  # (KK,) row-major tap order
    tap_x = jnp.tile(kx, kh)  # (KK,)
    base_y = oy[:, None] + tap_y[None, :]  # (Ho, KK)
    base_x = ox[:, None] + tap_x[None, :]  # (Wo, KK)

    off = offset.reshape(b, ho, wo, dg, kk, 2)
    sy = base_y[None, :, None, None, :] + off[..., 0]  # (B, Ho, Wo, dg, KK)
    sx = base_x[None, None, :, None, :] + off[..., 1]

    xg = x.reshape(b, h, w, dg, cin // dg)

    def per_image(img_g, yy, xx):
        # img_g: (H, W, dg, C/dg); yy/xx: (Ho, Wo, dg, KK)
        def per_group(img, y1, x1):
            # img: (H, W, C/dg); y1/x1: (Ho, Wo, KK)
            flat = _bilinear_gather(img, y1.reshape(-1), x1.reshape(-1))
            return flat.reshape(ho, wo, kk, cin // dg)

        return jax.vmap(per_group, in_axes=(2, 2, 2), out_axes=2)(
            img_g, yy, xx
        )  # (Ho, Wo, dg, KK, C/dg)

    samples = jax.vmap(per_image)(xg, sy, sx)  # (B, Ho, Wo, dg, KK, C/dg)
    if mask is not None:
        m = mask.reshape(b, ho, wo, dg, kk)
        samples = samples * m[..., None]
    # tap-major, channel-minor — matches weight (kh, kw, Cin, Cout) layout:
    # (B, Ho, Wo, KK, dg, C/dg) -> (..., KK * Cin)
    samples = samples.transpose(0, 1, 2, 4, 3, 5).reshape(
        b, ho, wo, kk * cin
    )
    wmat = weight.reshape(kk * cin, cout)
    out = jnp.einsum(
        "bhwk,kc->bhwc", samples, wmat.astype(samples.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def split_modulated_offset(
    raw: jnp.ndarray, deform_groups: int, kk: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``ModulatedDeformConv2dPack.forward`` channel split: the offset conv
    emits ``dg*3*KK`` channels -> chunk into (o1, o2, mask-logits), offset =
    concat(o1, o2) read interleaved, mask = sigmoid(logits)."""
    c = raw.shape[-1]
    assert c == deform_groups * 3 * kk, (c, deform_groups, kk)
    two = deform_groups * 2 * kk
    return raw[..., :two], jax.nn.sigmoid(raw[..., two:])
