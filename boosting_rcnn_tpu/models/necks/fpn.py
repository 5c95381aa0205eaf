"""FPN and PAFPN necks (flax, NHWC).

Behavioural spec: reference ``mmdet/models/necks/fpn.py:12`` and
``pafpn.py:12-158`` (top-down nearest-neighbour merge, extra levels via
maxpool or extra convs 'on_input'/'on_lateral'/'on_output', PAFPN bottom-up
``downsample_convs``/``pafpn_convs`` augmentation).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
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
    conv_cfg: Optional[dict] = None  # e.g. dict(type='ConvWS') (gn+ws)
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
                conv_cfg=self.conv_cfg,
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
                self.out_channels, 3, norm_cfg=self.norm_cfg,
                conv_cfg=self.conv_cfg, act=self.act,
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


class _SPPLateral(nn.Module):
    """SPP-type lateral block for :class:`SPPFPN` (fork ``fpn.py:208-585``).

    ``spp_type``:
      * 'ASPP' — per-dilation ConvModules (1x1 for d=1, else 3x3 dilated),
        concat, fuse 1x1 (reference ``ASPPModule:420``)
      * 'ASPP_share' — ONE shared 3x3 conv applied at every dilation
        (reference ``ASPP_share:471``)
      * 'SPP' — 1x1 squeeze to C/2, parallel stride-1 max-pools k=(5,9,13),
        concat, 1x1 expand (reference ``SPP:404``)
      * 'RFB' — receptive-field block: three branches with growing kernels
        + dilated 3x3s, concat, 1x1 fuse, residual (reference
        ``BasicRFB:529``, simplified to the channel layout actually used)
    """

    out_channels: int
    spp_type: str = "ASPP"
    dilations: Tuple[int, ...] = (1, 3, 5, 7)
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        if self.spp_type in ("ASPP", "ASPP_share"):
            if self.spp_type == "ASPP":
                branches = [
                    ConvModule(
                        c, 1 if d == 1 else 3, dilation=d,
                        norm_cfg=self.norm_cfg, dtype=self.dtype,
                        name=f"aspp_{i}",
                    )(x)
                    for i, d in enumerate(self.dilations)
                ]
            else:
                # one shared 3x3 weight set applied at every dilation
                # (reference ASPP_share reuses shared_conv's weight/bias)
                w = self.param(
                    "shared_kernel", nn.initializers.he_normal(),
                    (3, 3, x.shape[-1], c), self.dtype)
                b = self.param("shared_bias", nn.initializers.zeros, (c,),
                               self.dtype)
                branches = [
                    jax.lax.conv_general_dilated(
                        x.astype(self.dtype), w,
                        window_strides=(1, 1),
                        padding=[(d, d), (d, d)],
                        rhs_dilation=(d, d),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ) + b
                    for d in self.dilations
                ]
            y = jnp.concatenate(branches, axis=-1)
            return nn.Conv(c, (1, 1), dtype=self.dtype, name="fuse")(y)
        if self.spp_type == "SPP":
            y = ConvModule(c // 2, 1, dtype=self.dtype, name="squeeze")(x)
            pools = [
                max_pool(y, k, 1, padding="SAME") for k in (5, 9, 13)
            ]
            y = jnp.concatenate([y] + pools, axis=-1)
            return ConvModule(c, 1, dtype=self.dtype, name="expand")(y)
        if self.spp_type == "RFB":
            c_ = max(c // 8, 8)
            b0 = ConvModule(2 * c_, 1, dtype=self.dtype, name="b0_0")(x)
            b0 = ConvModule(2 * c_, 3, dilation=1, act=None,
                            dtype=self.dtype, name="b0_1")(b0)
            b1 = ConvModule(c_, 1, dtype=self.dtype, name="b1_0")(x)
            b1 = ConvModule(2 * c_, 3, dtype=self.dtype, name="b1_1")(b1)
            b1 = ConvModule(2 * c_, 3, dilation=3, act=None,
                            dtype=self.dtype, name="b1_2")(b1)
            b2 = ConvModule(c_, 1, dtype=self.dtype, name="b2_0")(x)
            b2 = ConvModule((c_ // 2) * 3, 3, dtype=self.dtype,
                            name="b2_1")(b2)
            b2 = ConvModule(2 * c_, 3, dtype=self.dtype, name="b2_2")(b2)
            b2 = ConvModule(2 * c_, 3, dilation=5, act=None,
                            dtype=self.dtype, name="b2_3")(b2)
            y = jnp.concatenate([b0, b1, b2], axis=-1)
            y = ConvModule(c, 1, act=None, dtype=self.dtype,
                           name="fuse")(y)
            short = ConvModule(c, 1, act=None, dtype=self.dtype,
                               name="shortcut")(x)
            return nn.relu(y + short)
        raise ValueError(f"unknown SPP_type {self.spp_type}")


class SPPFPN(FPN):
    """FPN whose lateral 1x1 convs are replaced by an SPP-type block
    (fork contribution, reference ``necks/fpn.py:208`` ``SPPFPN``; used by
    ``configs/faster_rcnn/faster_rcnn_r50_sppfpn_1x_coco.py`` and
    ``configs/paa/paa_r50_sppfpn_1x_coco.py``)."""

    spp_type: str = "ASPP"

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]):
        start, end = self._levels()
        used = end - start
        extra = self.add_extra_convs
        if extra is True:
            extra = "on_input"
        laterals = [
            _SPPLateral(
                self.out_channels, spp_type=self.spp_type,
                norm_cfg=None if self.no_norm_on_lateral else self.norm_cfg,
                dtype=self.dtype, name=f"lateral_{i}",
            )(inputs[start + i])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + bilinear_resize(
                laterals[i], laterals[i - 1].shape[-3:-1]
            )
        outs = [
            ConvModule(
                self.out_channels, 3, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in range(used)
        ]
        return tuple(
            self._add_extra_levels(outs, inputs, laterals, used, end, extra))


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


class BFP(nn.Module):
    """Balanced Feature Pyramid (Libra R-CNN; reference
    ``mmdet/models/necks/bfp.py``): resize every level to the refine level,
    average, refine (conv or embedded-gaussian non-local), and scatter the
    residual back to each level.  Wraps an existing pyramid's outputs."""

    refine_level: int = 2
    refine_type: str = "non_local"  # None | 'conv' | 'non_local'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        n = len(feats)
        th, tw = feats[self.refine_level].shape[1:3]

        def to_ref(x):
            h, w = x.shape[1:3]
            if (h, w) == (th, tw):
                return x
            if h > th:  # downsample via adaptive max-pool (floor ratio)
                kh, kw = max(h // th, 1), max(w // tw, 1)
                return nn.max_pool(x, (kh, kw), (kh, kw))[:, :th, :tw]
            ry, rx = -(-th // h), -(-tw // w)
            up = jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
            return up[:, :th, :tw]

        gathered = sum(to_ref(f) for f in feats) / n
        c = gathered.shape[-1]
        if self.refine_type == "conv":
            refined = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name="refine")(gathered)
        elif self.refine_type == "non_local":
            # embedded-gaussian non-local block (reference mmcv NonLocal2d)
            g = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="nl_g")(gathered)
            theta = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="nl_theta")(gathered)
            phi = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="nl_phi")(gathered)
            b = gathered.shape[0]
            tq = theta.reshape(b, th * tw, c // 2)
            pk = phi.reshape(b, th * tw, c // 2)
            gv = g.reshape(b, th * tw, c // 2)
            attn = jax.nn.softmax(
                jnp.einsum("bqc,bkc->bqk", tq, pk).astype(jnp.float32), -1
            ).astype(gathered.dtype)
            y = jnp.einsum("bqk,bkc->bqc", attn, gv).reshape(b, th, tw, c // 2)
            y = nn.Conv(c, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="nl_out")(y)
            refined = gathered + y
        else:
            refined = gathered

        outs = []
        for i, f in enumerate(feats):
            h, w = f.shape[1:3]
            if (h, w) == (th, tw):
                r = refined
            elif h < th:
                kh, kw = max(th // h, 1), max(tw // w, 1)
                r = nn.max_pool(refined, (kh, kw), (kh, kw))[:, :h, :w]
            else:
                ry, rx = -(-h // th), -(-w // tw)
                r = jnp.repeat(jnp.repeat(refined, ry, axis=1), rx, axis=2)[:, :h, :w]
            outs.append(f + r)
        return tuple(outs)


class FPNWithBFP(nn.Module):
    """FPN followed by a BFP refinement (Libra R-CNN neck stack)."""

    fpn: nn.Module
    bfp: nn.Module

    def __call__(self, feats):
        return self.bfp(self.fpn(feats))


class HRFPN(nn.Module):
    """HRFPN (reference ``mmdet/models/necks/hrfpn.py``): upsample every
    HRNet branch to the highest resolution, concat, 1x1 reduce, then emit
    ``num_outs`` levels by average-pooling with stride 2^k, each through a
    3x3 conv."""

    out_channels: int = 256
    num_outs: int = 5
    stride: int = 1  # per-out 3x3 conv stride (FCOS-HRNet configs use 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        b, h, w, _ = inputs[0].shape
        ups = [inputs[0]] + [
            jax.image.resize(
                x, (b, h, w, x.shape[-1]), "bilinear"
            )
            for x in inputs[1:]
        ]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="reduction_conv")(x)
        outs = []
        for i in range(self.num_outs):
            y = x
            if i > 0:
                k = 2 ** i
                y = nn.avg_pool(x, (k, k), strides=(k, k))
            outs.append(
                nn.Conv(self.out_channels, (3, 3),
                        (self.stride, self.stride),
                        padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"fpn_conv_{i}")(y)
            )
        return tuple(outs)


class _MergeCell(nn.Module):
    """mmcv merge cell (reference ``necks/nas_fpn.py`` via mmcv
    ``GlobalPoolingCell``/``SumCell``): resize both inputs to the target
    size (nearest up / max-pool down), combine, optional 3x3 out conv."""

    kind: str = "sum"  # 'sum' | 'gp'
    with_out_conv: bool = True
    out_channels: int = 256
    dtype: Any = jnp.float32

    def _resize(self, x, hw):
        b, h, w, c = x.shape
        th, tw = hw
        if (h, w) == (th, tw):
            return x
        if h < th:  # upsample
            return jax.image.resize(x, (b, th, tw, c), "nearest")
        k = max(h // max(th, 1), 1)
        return nn.max_pool(x, (k, k), strides=(k, k), padding="SAME")

    @nn.compact
    def __call__(self, x1, x2, out_hw):
        x1 = self._resize(x1, out_hw)
        x2 = self._resize(x2, out_hw)
        if self.kind == "gp":
            gate = jax.nn.sigmoid(jnp.mean(x1, axis=(1, 2), keepdims=True))
            out = x2 + x2 * gate
        else:
            out = x1 + x2
        if self.with_out_conv:
            out = nn.relu(out)
            out = nn.Conv(self.out_channels, (3, 3),
                          padding=[(1, 1), (1, 1)], use_bias=False,
                          dtype=self.dtype, name="out_conv")(out)
            out = nn.GroupNorm(num_groups=min(32, self.out_channels),
                               epsilon=1e-5, dtype=self.dtype,
                               name="out_gn")(out)
        return out


class NASFPN(nn.Module):
    """NAS-FPN (reference ``necks/nas_fpn.py``): the discovered merge
    schedule repeated ``stack_times``."""

    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        feats = [
            nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs[self.start_level:])
        ]
        while len(feats) < self.num_outs:
            i = len(feats)
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"extra_{i}")(feats[-1])
            feats.append(nn.max_pool(y, (2, 2), strides=(2, 2),
                                     padding="SAME"))
        p3, p4, p5, p6, p7 = feats

        def cell(kind, name, with_out=True):
            return _MergeCell(kind, with_out, self.out_channels,
                              dtype=self.dtype, name=name)

        for s in range(self.stack_times):
            hw = lambda t: (t.shape[1], t.shape[2])
            p4_1 = cell("gp", f"s{s}_gp_64_4")(p6, p4, hw(p4))
            p4_2 = cell("sum", f"s{s}_sum_44_4")(p4_1, p4, hw(p4))
            p3 = cell("sum", f"s{s}_sum_43_3")(p4_2, p3, hw(p3))
            p4 = cell("sum", f"s{s}_sum_34_4")(p3, p4_2, hw(p4))
            p5_t = cell("gp", f"s{s}_gp_43_5", False)(p4, p3, hw(p5))
            p5 = cell("sum", f"s{s}_sum_55_5")(p5, p5_t, hw(p5))
            p7_t = cell("gp", f"s{s}_gp_54_7", False)(p5, p4_2, hw(p7))
            p7 = cell("sum", f"s{s}_sum_77_7")(p7, p7_t, hw(p7))
            p6 = cell("gp", f"s{s}_gp_75_6")(p7, p5, hw(p6))
        return p3, p4, p5, p6, p7


class CARAFEUpsample(nn.Module):
    """CARAFE upsampler (mmcv ``CARAFEPack``): 1x1 channel compressor ->
    content encoder -> pixel-shuffle to the upsampled kernel field ->
    softmax -> reassembly (``ops/carafe.py``)."""

    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.carafe import carafe, normalize_masks

        b, h, w, c = x.shape
        s, k2 = self.scale, self.up_kernel * self.up_kernel
        y = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                    name="compressor")(x)
        pad = (self.encoder_kernel - 1) // 2
        raw = nn.Conv(k2 * s * s, (self.encoder_kernel,) * 2,
                      padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                      name="encoder")(y)  # (B, H, W, k2*s*s)
        # pixel shuffle: (B, H, W, s, s, k2) -> (B, H*s, W*s, k2)
        raw = raw.reshape(b, h, w, s, s, k2)
        raw = raw.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, k2)
        masks = normalize_masks(raw)
        return carafe(x, masks, self.up_kernel, s).astype(x.dtype)


class FPNCarafe(nn.Module):
    """FPN with CARAFE upsampling (reference ``necks/fpn_carafe.py``)."""

    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        ins = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(ins)
        ]
        while len(laterals) < self.num_outs:
            i = len(laterals)
            laterals.append(
                nn.Conv(self.out_channels, (3, 3), (2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"lateral_{i}")(laterals[-1])
            )
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEUpsample(
                up_kernel=self.up_kernel,
                encoder_kernel=self.encoder_kernel,
                compressed_channels=self.compressed_channels,
                dtype=self.dtype, name=f"carafe_{i - 1}",
            )(laterals[i])
            # extra levels sit below the backbone top at matching scale
            if up.shape[1:3] == laterals[i - 1].shape[1:3]:
                laterals[i - 1] = laterals[i - 1] + up
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"fpn_conv_{i}")(l)
            for i, l in enumerate(laterals)
        )


class RFP(nn.Module):
    """Recursive Feature Pyramid (reference ``necks/rfp.py``: DetectoRS).

    Input is ``(img, C2..C5)`` from a ``DetectoRSResNet(output_img=True)``.
    Each unrolled step feeds ASPP-transformed pyramid levels back through a
    fresh copy of the backbone (``rfp.py:120-135``), re-runs the FPN and
    fuses old/new levels with a sigmoid gate (``rfp_weight`` init 0 ->
    gate 0.5 at start)."""

    in_channels: Sequence[int]
    rfp_backbone: nn.Module
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    aspp_out_channels: int = 64
    aspp_dilations: Tuple[int, ...] = (1, 3, 6, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        img = inputs[0]
        feats = tuple(inputs[1:])
        fpn = FPN(in_channels=tuple(self.in_channels),
                  out_channels=self.out_channels, num_outs=self.num_outs,
                  start_level=0, dtype=self.dtype, name="fpn")
        x = list(fpn(feats))

        # one shared ASPP + one shared gate conv (reference rfp.py:95-103)
        aspp_convs = []
        for i, d in enumerate(self.aspp_dilations):
            k = 3 if d > 1 else 1
            pad = d if d > 1 else 0
            aspp_convs.append(nn.Conv(
                self.aspp_out_channels, (k, k),
                padding=[(pad, pad), (pad, pad)], kernel_dilation=(d, d),
                dtype=self.dtype, name=f"aspp_conv{i}"))
        rfp_weight = nn.Conv(1, (1, 1), kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             dtype=self.dtype, name="rfp_weight")

        def aspp(t):
            outs = []
            for i, conv in enumerate(aspp_convs):
                inp = (jnp.mean(t, axis=(1, 2), keepdims=True)
                       if i == len(aspp_convs) - 1 else t)
                outs.append(nn.relu(conv(inp)))
            outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
            return jnp.concatenate(outs, axis=-1)

        for step in range(self.rfp_steps - 1):
            # feedback for backbone stages 1..3 <- pyramid levels 1..3
            # (one shared feedback backbone across steps; the standard
            # DetectoRS config uses rfp_steps=2 where this is exact)
            rfp_feats = [None] + [aspp(x[i]) for i in range(1, 4)]
            new_feats = self.rfp_backbone(img, rfp_feats=rfp_feats)
            x_new = list(fpn(tuple(new_feats)))
            x = [
                jax.nn.sigmoid(rfp_weight(xn)) * xn
                + (1 - jax.nn.sigmoid(rfp_weight(xn))) * xo
                for xn, xo in zip(x_new, x)
            ]
        return tuple(x)


class _FPGTrans(nn.Module):
    """act->conv->norm transition (reference fpg.py ConvModule order)."""

    out_channels: int
    kernel: int = 3
    stride: int = 1
    upsample: bool = False
    # exact target (h, w) for the upsample: odd pyramid sizes (25 vs 13*2=26
    # at the 800x1344 canvas) make a blind 2x resize misaligned
    up_hw: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..layers import LiveBatchNorm

        x = nn.relu(x)
        if self.upsample:
            b, h, w, c = x.shape
            th, tw = self.up_hw if self.up_hw is not None else (h * 2, w * 2)
            x = jax.image.resize(x, (b, th, tw, c), "nearest")
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel,) * 2,
                    (self.stride,) * 2, padding=[(pad, pad)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return LiveBatchNorm(dtype=self.dtype, name="bn")(x)


class FPG(nn.Module):
    """Feature Pyramid Grids (reference ``necks/fpg.py``, the shipped
    ``configs/fpg`` recipe: 9 bottom-up stacks, transitions in
    act-conv-norm order, staircase ``skip_inds``)."""

    out_channels: int = 256
    inter_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    start_level: int = 0
    skip_inds: Tuple[Tuple[int, ...], ...] = (
        (0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        ic = self.inter_channels
        feats = [
            nn.Conv(ic, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs[self.start_level:])
        ]
        while len(feats) < self.num_outs:
            i = len(feats)
            feats.append(
                nn.Conv(ic, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"extra_down_{i}")(feats[-1])
            )
        stage0 = list(feats)
        cur = list(feats)
        for s in range(self.stack_times):
            nxt = []
            for lvl in range(self.num_outs):  # bottom-up
                if s in self.skip_inds[lvl]:
                    nxt.append(cur[lvl])
                    continue
                acc = _FPGTrans(ic, 1, dtype=self.dtype,
                                name=f"s{s}_l{lvl}_lateral")(cur[lvl])
                if nxt:  # same-pathway up (conv s2 on the fresh lower lvl)
                    acc = acc + _FPGTrans(
                        ic, 3, stride=2, dtype=self.dtype,
                        name=f"s{s}_l{lvl}_same_up")(nxt[-1])
                if lvl < self.num_outs - 1:  # across-down from higher lvl
                    acc = acc + _FPGTrans(
                        ic, 3, upsample=True,
                        up_hw=(cur[lvl].shape[1], cur[lvl].shape[2]),
                        dtype=self.dtype,
                        name=f"s{s}_l{lvl}_across_down")(cur[lvl + 1])
                acc = acc + _FPGTrans(
                    ic, 1, dtype=self.dtype,
                    name=f"s{s}_l{lvl}_skip")(stage0[lvl])
                nxt.append(acc)
            cur = nxt
        outs = []
        for lvl in range(self.num_outs):
            y = nn.relu(cur[lvl])
            y = nn.Conv(self.out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"out_{lvl}")(y)
            outs.append(y)
        return tuple(outs)
