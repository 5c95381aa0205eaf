"""ResNet family backbones (flax, NHWC).

Covers the reference's ResNet zoo surface (``mmdet/models/backbones/
resnet.py:306``): depths 18/34/50/101/152, ``style='pytorch'`` (stride on the
3x3 conv), ``frozen_stages``, frozen BN (``norm_eval``), ``out_indices``, and
the V1d deep stem.  ResNeXt-style grouped convs via ``groups``/
``base_width``.  Weight layout is torch-compatible modulo transpose so the
``tools/convert_torch_weights.py`` converter can load torchvision/released
checkpoints for parity testing.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import (
    ConvModule,
    DeformConv,
    FrozenBatchNorm,
    LiveBatchNorm,
    max_pool,
)


def _norm(live: bool, dtype, name: str, norm_cfg: Optional[dict] = None):
    """norm_eval=True (reference finetuning default) -> FrozenBatchNorm;
    norm_eval=False (from-scratch, e.g. CenterNet) -> live BN whose stats
    update under a mutable train-step apply.  An explicit ``norm_cfg``
    (e.g. GN for the gn+ws configs) overrides the BN default."""
    if norm_cfg is not None and norm_cfg.get("type") not in (
            "BN", "SyncBN", "FrozenBN"):
        from ..layers import make_norm

        t = norm_cfg["type"]
        if t == "GN":
            import flax.linen as fnn

            return fnn.GroupNorm(
                num_groups=norm_cfg.get("num_groups", 32), epsilon=1e-5,
                dtype=dtype, name=name)
        return make_norm(norm_cfg, dtype)
    return (LiveBatchNorm if live else FrozenBatchNorm)(dtype=dtype, name=name)


def _conv(conv_cfg: Optional[dict]):
    """nn.Conv, or the weight-standardized variant for conv_cfg ConvWS
    (gn+ws configs; reference ``mmcv/cnn/bricks/conv_ws.py``)."""
    if conv_cfg is not None and conv_cfg.get("type") == "ConvWS":
        from ..plugins import WSConv

        return WSConv
    return nn.Conv

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _S2DStemConv(nn.Module):
    """The 7x7/s2 stem conv, computed as a space-to-depth 4x4/s1 conv.

    A 3-channel input starves the MXU (measured 5.4 ms/step at ~7.5 TFLOP/s
    on the 800x1344 bench — 13% of the whole inference step).  Rearranging
    2x2 pixel blocks into channels (the MLPerf-ResNet TPU recipe) turns the
    op into a 4x4 stride-1 conv over 12 channels with a 192-element
    contraction — an EXACT rearrangement of the same dot products, not an
    approximation.  The parameter keeps nn.Conv's ``kernel`` name and the
    torch-native (7,7,3,F) shape so checkpoint conversion
    (``tools/convert_torch_weights.py``) is unchanged; the weight is
    re-laid-out at apply time (zero-padded 8x8 -> (4,4,12,F)).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, f),
            jnp.float32,
        ).astype(self.dtype)
        # (7,7,3,f) -> zero-pad to (8,8,3,f) -> (4,4,(di,dj,c)=12,f):
        # w4[a,b,(di,dj,c),k] = w[2a+di, 2b+dj, c, k]
        w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w4 = w4.reshape(4, 2, 4, 2, 3, f).transpose(0, 2, 1, 3, 4, 5)
        w4 = w4.reshape(4, 4, 12, f)
        b, h, wdt, c = x.shape
        # the space-to-depth itself is an identity 2x2xC -> 4C conv at
        # stride 2: y[i,j,(di,dj,c)] = x_pad[2i+di, 2j+dj, c].  Expressing
        # it as a conv (instead of pad+reshape+transpose) keeps XLA in
        # conv-native layouts — the 6-D transpose variant materialized
        # ~9 ms/step of relayout copies on the 800x1344 bench.
        eye = jnp.eye(4 * c, dtype=self.dtype).reshape(2, 2, c, 4 * c)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), eye, (2, 2), [(3, 4), (3, 4)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        out = jax.lax.conv_general_dilated(
            y, w4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        # (h + 2*3 - 7)//2 + 1 rows — the 7x7/s2 output size; the padding
        # round-up row (if any) falls off the VALID window
        oh = (h + 6 - 7) // 2 + 1
        ow = (wdt + 6 - 7) // 2 + 1
        return out[:, :oh, :ow, :]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    live_bn: bool = False
    # BasicBlock has no 1x1 to move the stride onto; the reference keeps
    # the stride on conv1 for both styles (resnet.py BasicBlock)
    style: str = "pytorch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(
            self.planes, (3, 3), (self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = _norm(self.live_bn, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = _norm(self.live_bn, self.dtype, name="bn2")(y)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = _norm(self.live_bn, self.dtype, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with identity shortcut.

    ``style='pytorch'``: stride lives on the 3x3; ``style='caffe'``: stride
    on the first 1x1 (reference ``resnet.py:97`` Bottleneck
    ``conv1_stride/conv2_stride`` logic — the caffe-pretrained config
    family, e.g. ``faster_rcnn_r50_caffe_fpn_1x_coco``).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    expansion: int = 4
    dcn: Optional[dict] = None  # dict(type='DCN'|'DCNv2', deform_groups=N)
    plugins: Optional[tuple] = None  # ((cfg, position), ...) for this stage
    conv_cfg: Optional[dict] = None  # dict(type='ConvWS') for gn+ws
    norm_cfg: Optional[dict] = None  # e.g. dict(type='GN', num_groups=32)
    live_bn: bool = False
    style: str = "pytorch"  # 'caffe' -> stride on conv1 (the 1x1)
    dtype: Any = jnp.float32

    def _plug(self, y, position: str):
        """Run this stage's plugins at ``position`` (reference Bottleneck
        ``forward_plugin``, ``resnet.py:219``)."""
        if not self.plugins:
            return y
        from ..plugins import build_plugin

        for i, (cfg, pos) in enumerate(self.plugins):
            if pos == position:
                y = build_plugin(
                    cfg, dtype=self.dtype, name=f"{position}_plugin{i}")(y)
        return y

    @nn.compact
    def __call__(self, x):
        if self.groups == 1:
            width = self.planes
        else:  # ResNeXt width rule (reference resnext.py)
            width = int(self.planes * (self.base_width / self.base_channels)) * self.groups
        out_ch = self.planes * self.expansion
        conv = _conv(self.conv_cfg)
        c1_stride = self.stride if self.style == "caffe" else 1
        c2_stride = 1 if self.style == "caffe" else self.stride
        identity = x
        y = conv(width, (1, 1), (c1_stride, c1_stride),
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _norm(self.live_bn, self.dtype, "bn1", self.norm_cfg)(y)
        y = nn.relu(y)
        y = self._plug(y, "after_conv1")
        if self.dcn is not None:
            # reference Bottleneck ``with_dcn``: the 3x3 conv2 becomes a
            # deformable conv (``mmdet/models/backbones/resnet.py`` dcn arg)
            y = DeformConv(
                width, 3, c2_stride, self.dilation,
                deform_groups=self.dcn.get("deform_groups", 1),
                modulated=self.dcn.get("type", "DCNv2") == "DCNv2",
                dtype=self.dtype, name="conv2",
            )(y)
        else:
            y = conv(
                width, (3, 3), (c2_stride, c2_stride),
                padding=[(self.dilation, self.dilation)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False, dtype=self.dtype, name="conv2",
            )(y)
        y = _norm(self.live_bn, self.dtype, "bn2", self.norm_cfg)(y)
        y = nn.relu(y)
        y = self._plug(y, "after_conv2")
        y = conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = _norm(self.live_bn, self.dtype, "bn3", self.norm_cfg)(y)
        y = self._plug(y, "after_conv3")
        if self.downsample:
            identity = conv(
                out_ch, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = _norm(
                self.live_bn, self.dtype, "downsample_bn", self.norm_cfg
            )(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet / ResNeXt backbone.

    ``frozen_stages`` is honoured by the optimizer mask (see
    ``engine/train.py``): stages <= frozen_stages get zero learning rate,
    which matches the reference's ``requires_grad=False`` freezing while
    keeping a single static compute graph.
    """

    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    base_channels: int = 64
    stem_channels: Optional[int] = None
    deep_stem: bool = False
    groups: int = 1
    base_width: int = 4
    frozen_stages: int = -1  # consumed by the train-state param mask
    dcn: Optional[dict] = None
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    # reference plugins= surface (resnet.py:121-140): each entry is
    # dict(cfg=..., position='after_conv1|2|3', stages=(bool x4)|None)
    plugins: Optional[tuple] = None
    conv_cfg: Optional[dict] = None  # dict(type='ConvWS') for gn+ws
    norm_cfg: Optional[dict] = None  # e.g. dict(type='GN', num_groups=32)
    norm_eval: bool = True  # False -> live BN (from-scratch training)
    style: str = "pytorch"  # 'caffe': Bottleneck stride on the first 1x1
    # exact space-to-depth rewrite of the 7x7/s2 stem (see _S2DStemConv);
    # auto-disabled for deep_stem and for weight-standardized convs (WS
    # statistics would see the zero-padded taps)
    stem_s2d: bool = True
    dtype: Any = jnp.float32

    def _stage_plugins(self, stage: int):
        """Plugins active in ``stage`` as ((cfg, position), ...) — the
        reference ``make_stage_plugins`` stages-filter semantics."""
        if not self.plugins:
            return None
        out = []
        for p in self.plugins:
            stages = p.get("stages")
            if stages is None or stages[stage]:
                out.append((p["cfg"], p.get("position", "after_conv3")))
        return tuple(out) or None

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        stem = self.stem_channels or self.base_channels
        conv = _conv(self.conv_cfg)

        if self.deep_stem:
            for i, (ch, s) in enumerate(
                [(stem // 2, 2), (stem // 2, 1), (stem, 1)]
            ):
                x = conv(
                    ch, (3, 3), (s, s), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name=f"stem_conv{i+1}",
                )(x)
                x = _norm(not self.norm_eval, self.dtype, f"stem_bn{i+1}",
                          self.norm_cfg)(x)
                x = nn.relu(x)
        elif self.stem_s2d and self.conv_cfg is None:
            x = _S2DStemConv(stem, dtype=self.dtype, name="conv1")(x)
            x = _norm(not self.norm_eval, self.dtype, "bn1", self.norm_cfg)(x)
            x = nn.relu(x)
        else:
            x = conv(
                stem, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
            x = _norm(not self.norm_eval, self.dtype, "bn1", self.norm_cfg)(x)
            x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            # frozen stem: skip its backward entirely (the reference's
            # requires_grad=False freezing also computes no grads there)
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        in_ch = stem
        expansion = 1 if block_type == "basic" else 4
        for stage, num_blocks in enumerate(stage_blocks):
            stride = self.strides[stage]
            dilation = self.dilations[stage]
            for b in range(num_blocks):
                blk_stride = stride if b == 0 else 1
                out_ch = planes * expansion
                # identity shortcut needs a projection only when the shape
                # changes (torchvision: resnet18 layer1.0 has NO downsample)
                need_down = b == 0 and (blk_stride != 1 or in_ch != out_ch)
                common = dict(
                    planes=planes,
                    stride=blk_stride,
                    dilation=dilation,
                    downsample=need_down,
                    live_bn=not self.norm_eval,
                    dtype=self.dtype,
                )
                in_ch = out_ch
                name = f"layer{stage+1}_{b}"
                if block_type == "basic":
                    # reference asserts plugins unsupported in BasicBlock
                    # (resnet.py:28); same contract here
                    assert self.plugins is None, (
                        "plugins are only supported on Bottleneck depths")
                    x = BasicBlock(**common, name=name)(x)
                else:
                    x = Bottleneck(
                        **common,
                        groups=self.groups,
                        base_width=self.base_width,
                        base_channels=self.base_channels,
                        dcn=self.dcn if self.stage_with_dcn[stage] else None,
                        plugins=self._stage_plugins(stage),
                        conv_cfg=self.conv_cfg,
                        norm_cfg=self.norm_cfg,
                        style=self.style,
                        name=name,
                    )(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


def resnet_param_prefixes_for_stage(stage: int):
    """Param-name prefixes belonging to stem (stage 0) / residual stages,
    for the frozen-stages optimizer mask."""
    if stage == 0:
        return ("conv1", "bn1", "stem_conv", "stem_bn")
    return (f"layer{stage}_",)
