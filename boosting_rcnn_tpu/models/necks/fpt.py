"""Feature Pyramid Transformer (fork contribution, reference
``mmdet/models/necks/fpt.py`` used by ``configs/fpt``).

Top-down pyramid where fusion is attention instead of addition, at a
reduced width ``fpt_dim = out_channels // 8``:

  * **SelfTrans** (``fpt.py:263``): single-head self-attention with a
    4-component mixture-of-softmax, keys/values from a stride-2
    average-pooled map (4x fewer kv tokens), shared q/k projection,
    1x1 out conv + BN + residual;
  * **ground lateral** (``:198``): lateral 3x3+GN+relu, SelfTrans, then a
    non-local *grounding* attention ('dot' mode, ``GroundTrans:422``) from
    the top feature into the lateral grid (zero-initialised BN gate, no
    residual — faithful to the fork);
  * **posthoc** 3x3+GN+relu to ``out_channels`` per level, then the
    *rendering* pass (``forward:150``, fpt_rendering=True): outputs are
    rebuilt coarse-to-fine with stride-2 conv + add + 3x3 conv.

Attention runs as batched matmuls over flattened token axes (MXU);
everything is fixed-shape.

Documented repairs vs the fork code (which does not run as written): the
rendering add mixes ``fpt_dim`` and ``out_channels`` tensors (fixed here
with a 1x1 adapter), a debug ``print`` sits in ``forward``, and the output
list is emitted coarse->fine (normalised here to the fine->coarse order
every mmdet head expects).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import LiveBatchNorm


class SelfTrans(nn.Module):
    dim: int
    n_mix: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d = self.dim
        qk = nn.Conv(d, (1, 1), dtype=self.dtype, name="conv_qk")
        v = nn.Conv(d, (1, 1), dtype=self.dtype, name="conv_v")
        pooled = nn.avg_pool(x, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)])
        qt = qk(x).reshape(b, h * w, d)
        kt = qk(pooled).reshape(b, -1, d)
        vt = v(pooled).reshape(b, -1, d)
        m = self.n_mix
        dm = d // m
        # mixture weights pi from the mean query (fpt.py:356)
        wmix = self.param("mix_weight",
                          nn.initializers.uniform(scale=m ** -0.5), (m, d))
        bar_q = qt.mean(axis=1)  # (B, d)
        pi = jax.nn.softmax(
            jnp.einsum("md,bd->bm", wmix, bar_q.astype(jnp.float32)),
            axis=1)  # (B, m)
        q = qt.reshape(b, h * w, m, dm).transpose(0, 2, 1, 3)
        k = kt.reshape(b, -1, m, dm).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bmnd,bmkd->bmnk", q.astype(jnp.float32),
                          k.astype(jnp.float32)) / (d ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = jnp.einsum("bmnk,bm->bnk", attn, pi)
        out = jnp.einsum("bnk,bkd->bnd", attn, vt.astype(jnp.float32))
        out = out.reshape(b, h, w, d).astype(x.dtype)
        out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_out")(out)
        out = LiveBatchNorm(dtype=self.dtype, name="bn_out")(out)
        return out + x


class GroundTrans(nn.Module):
    """Non-local 'dot' grounding (``GroundTrans:422``): queries from the
    lateral (low) grid attend into the top (high) grid; zero-init BN
    gate on the output."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_high):
        b, hl, wl, c = x_low.shape
        inter = max(c // 2, 1)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(
            x_high).reshape(b, -1, inter)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(
            x_low).reshape(b, hl * wl, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(
            x_high).reshape(b, -1, inter)
        f = jnp.einsum("bnd,bkd->bnk", theta.astype(jnp.float32),
                       phi.astype(jnp.float32))
        f = f / f.shape[-1]  # 'dot' normalisation
        y = jnp.einsum("bnk,bkd->bnd", f, g.astype(jnp.float32))
        y = y.reshape(b, hl, wl, inter).astype(x_low.dtype)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="wz_conv")(y)
        z = LiveBatchNorm(dtype=self.dtype, name="wz_bn")(z)
        # zero-init gate == the reference's zero-init BN weight
        gate = self.param("gate", nn.initializers.zeros, (1,))
        return z * gate.astype(z.dtype)


class FPT(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    fpt_rendering: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        fpt_dim = self.out_channels // 8
        gn_groups = min(32, fpt_dim)
        n = len(inputs)

        def gn_conv(t, ch, k, name, stride=1):
            pad = (k - 1) // 2
            y = nn.Conv(ch, (k, k), (stride, stride),
                        padding=[(pad, pad)] * 2, use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(t)
            y = nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-5,
                             dtype=self.dtype, name=f"{name}_gn")(y)
            return nn.relu(y)

        # top: C5 -> fpt_dim, self-attention
        top = nn.Conv(fpt_dim, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_top")(inputs[-1])
        top = nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5,
                           dtype=self.dtype, name="conv_top_gn")(top)
        inner = [SelfTrans(fpt_dim, dtype=self.dtype, name="st_top")(top)]
        for i in range(n - 1):
            lat = gn_conv(inputs[-(i + 2)], fpt_dim, 3, f"lateral_{i}")
            lat = SelfTrans(fpt_dim, dtype=self.dtype, name=f"st_{i}")(lat)
            inner.append(GroundTrans(fpt_dim, dtype=self.dtype,
                                     name=f"gt_{i}")(lat, inner[-1]))

        middle = [gn_conv(t, self.out_channels, 3, f"posthoc_{i}")
                  for i, t in enumerate(inner)]  # coarse -> fine

        if self.fpt_rendering:
            outs = [middle[-1]]  # finest first (reference insert(0) order)
            for i in range(2, n + 1):
                rend = gn_conv(outs[0], fpt_dim, 3,
                               f"rend1_{i - 2}", stride=2)
                tgt = middle[n - i]
                b, h, w, c = tgt.shape
                if rend.shape[1:3] != (h, w):
                    rend = jax.image.resize(
                        rend, (b, h, w, rend.shape[-1]), "nearest")
                rend = rend + gn_conv(tgt, fpt_dim, 1, f"rend_adapt_{i - 2}")
                outs.insert(0, gn_conv(rend, self.out_channels, 3,
                                       f"rend2_{i - 2}"))
        else:
            outs = middle[::-1]

        # outs currently coarse->fine; detector wants fine->coarse
        outs = outs[::-1] if outs[0].shape[1] < outs[-1].shape[1] else outs
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class _GroundTransLite(nn.Module):
    """The lite grounding block (reference ``GroundTrans_lite:525``): a
    pre-norm cross-attention (lateral queries into top tokens) + FFN.
    Faithfully reproduces the fork's residual quirk — both residual adds
    reuse the block output instead of its input (``x_lateral_2 +
    dropout1(x_lateral_2)``), so the carried signal is 2x the attention
    output, not input + attention."""

    dim: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_lat, x_top):
        b, h, w, c = x_lat.shape
        lat = x_lat.reshape(b, h * w, c)
        top = x_top.reshape(b, -1, c)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        q = norm1(lat)
        kv = norm1(top)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(q, kv, kv)
        x = a + a
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="linear2")(nn.relu(y))
        out = y + y
        return out.reshape(b, h, w, c)


class FPTLite(nn.Module):
    """FPT_lite (reference ``fpt.py:583``): an FPN whose top-down addition
    is replaced by the lite grounding cross-attention at full width."""

    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        used = list(inputs[self.start_level:])
        n = len(used)
        lats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(n - 1, 0, -1):
            lats[i - 1] = _GroundTransLite(
                self.out_channels, dtype=self.dtype, name=f"gt_{i - 1}"
            )(lats[i - 1], lats[i])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"fpn_conv_{i}")(t)
            for i, t in enumerate(lats)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
