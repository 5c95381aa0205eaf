"""NAS-FCOS (reference ``mmdet/models/dense_heads/nasfcos_head.py`` +
``necks/nasfcos_fpn.py``).

Head: FCOS with the searched tower "dconv3x3 (DCNv2), conv3x3, dconv3x3,
conv1x1" (GN-normalised) shared-in-structure between the cls and reg
branches.  Neck: the searched concat-cell pyramid (``NASFCOS_FPN``):
BN-adapted laterals f0..f2, seven ConcatCells building f3..f9
(c22_1, c22_2, c32, c02, c42, c36, c61), outputs P3..P5 = (f9, f8, f7)
each fused with an upsampled f5 and resized back to the backbone level,
plus two act-norm-conv stride-2 extras for P6/P7.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_conv import deform_conv2d, split_modulated_offset
from ..layers import LiveBatchNorm, Scale


class _DCNv2Op(nn.Module):
    """3x3 modulated deform conv + GN + relu (the 'dconv3x3' search op)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dg = 1
        off_raw = nn.Conv(dg * 27, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="offset_conv")(x)
        off, mask = split_modulated_offset(off_raw, dg, 9)
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.channels))
        y = deform_conv2d(x, off, w.astype(x.dtype), mask=mask)
        y = nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-5,
                         dtype=self.dtype, name="gn")(y)
        return nn.relu(y)


class NASFCOSConvs(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    num_levels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        def tower(prefix):
            def op_conv(k, name):
                pad = (k - 1) // 2
                conv = nn.Conv(self.feat_channels, (k, k),
                               padding=[(pad, pad)] * 2, use_bias=False,
                               dtype=self.dtype, name=f"{name}_conv")
                gn = nn.GroupNorm(num_groups=min(32, self.feat_channels),
                                  epsilon=1e-5, dtype=self.dtype,
                                  name=f"{name}_gn")

                def f(t):
                    return nn.relu(gn(conv(t)))
                return f

            return [
                _DCNv2Op(self.feat_channels, dtype=self.dtype,
                         name=f"{prefix}_dconv0"),
                op_conv(3, f"{prefix}_conv1"),
                _DCNv2Op(self.feat_channels, dtype=self.dtype,
                         name=f"{prefix}_dconv2"),
                op_conv(1, f"{prefix}_conv3"),
            ]

        cls_t = tower("cls")
        reg_t = tower("reg")
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           bias_init=nn.initializers.constant(-4.595),
                           dtype=self.dtype, name="fcos_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="fcos_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="fcos_centerness")
        scales = [Scale(name=f"scale_{l}") for l in range(self.num_levels)]
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for op in cls_t:
                cf = op(cf)
            for op in reg_t:
                rf = op(rf)
            cls_out.append(conv_cls(cf))
            reg_out.append(
                jnp.exp(scales[lvl](conv_reg(rf)).astype(jnp.float32)))
            ctr_out.append(conv_ctr(rf))
        return cls_out, reg_out, ctr_out


class _ConcatCell(nn.Module):
    """mmcv ConcatCell: optional 3x3+BN input convs, resize both inputs to
    the larger size (nearest up / max-pool down), concat, grouped-1x1 out
    conv in norm-act-conv order."""

    channels: int
    with_input1_conv: bool = True
    with_input2_conv: bool = True
    dtype: Any = jnp.float32

    def _resize(self, x, hw):
        b, h, w, c = x.shape
        th, tw = hw
        if (h, w) == (th, tw):
            return x
        if h < th:
            return jax.image.resize(x, (b, th, tw, c), "nearest")
        k = max(h // max(th, 1), 1)
        return nn.max_pool(x, (k, k), strides=(k, k), padding="SAME")

    @nn.compact
    def __call__(self, x1, x2):
        def in_conv(t, name):
            y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(t)
            return LiveBatchNorm(dtype=self.dtype, name=f"{name}_bn")(y)

        if self.with_input1_conv:
            x1 = in_conv(x1, "in1")
        if self.with_input2_conv:
            x2 = in_conv(x2, "in2")
        th = max(x1.shape[1], x2.shape[1])
        tw = max(x1.shape[2], x2.shape[2])
        x1 = self._resize(x1, (th, tw))
        x2 = self._resize(x2, (th, tw))
        y = jnp.concatenate([x1, x2], axis=-1)
        # out conv: norm -> act -> grouped 1x1 conv
        y = LiveBatchNorm(dtype=self.dtype, name="out_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 1), use_bias=False,
                    feature_group_count=1, dtype=self.dtype,
                    name="out_conv")(y)
        return y


class NASFCOSFPN(nn.Module):
    """reference ``necks/nasfcos_fpn.py`` forward (f-indices per the
    module-name digits)."""

    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        feats = []
        for i, x in enumerate(inputs[self.start_level:]):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"adapt_{i}")(x)
            y = LiveBatchNorm(dtype=self.dtype, name=f"adapt_bn_{i}")(y)
            feats.append(nn.relu(y))

        schedule = [
            ("c22_1", 2, 2, True, True),
            ("c22_2", 2, 2, True, True),
            ("c32", 3, 2, True, False),
            ("c02", 0, 2, True, False),
            ("c42", 4, 2, True, True),
            ("c36", 3, 6, True, True),
            ("c61", 6, 1, True, True),
        ]
        for name, i1, i2, w1, w2 in schedule:
            feats.append(_ConcatCell(
                self.out_channels, w1, w2, dtype=self.dtype, name=name,
            )(feats[i1], feats[i2]))

        ret = []
        for out_idx, in_idx in zip([9, 8, 7], [1, 2, 3]):
            f1 = feats[out_idx]
            f5 = feats[5]
            b, h, w, c = f1.shape
            f5r = jax.image.resize(f5, (b, h, w, c), "bilinear")
            fsum = f1 + f5r
            th, tw = inputs[in_idx].shape[1], inputs[in_idx].shape[2]
            ret.append(jax.image.resize(fsum, (b, th, tw, c), "bilinear"))
        while len(ret) < self.num_outs:
            i = len(ret)
            y = ret[-1]
            if i > 3:  # act on all but the first extra (reference order)
                y = nn.relu(y)
            y = LiveBatchNorm(dtype=self.dtype, name=f"extra_bn_{i}")(y)
            ret.append(nn.Conv(
                self.out_channels, (3, 3), (2, 2),
                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                name=f"extra_conv_{i}")(y))
        return tuple(ret)
