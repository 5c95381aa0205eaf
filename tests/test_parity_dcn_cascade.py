"""Checkpoint-parity harness beyond the flagship graph (VERDICT r2 weak 4).

Extends the hand-built-torch-block pattern of ``test_full_model_parity.py``
to the two graph families it did not cover:

  * a DCNv2 Bottleneck backbone (``configs/dcn/``-style ``stage_with_dcn``)
    — validates the converter's ``conv2.conv_offset.*`` mapping
    (``tools/convert_torch_weights.py:87``) and the Bottleneck/DCN graph
    wiring (offset-conv stride/padding, frozen-BN stats, downsample
    projection) end-to-end through ``convert_torchvision_resnet``;
  * the Mask R-CNN mask head (``roi_head.mask_head.*``) — locks in the
    ConvTranspose kernel flip+transpose rule the converter applies
    (``convert_torch_weights.py:250-261``);
  * 3-stage cascade bbox heads (``roi_head.bbox_head.N.*`` ->
    ``bbox_heads_N``) — validates the per-stage first-FC CHW/HWC permute.

The torch DCN mirror computes its deformable conv through the independent
numpy oracle of ``test_deform_conv.py`` (torchvision is absent in this
image); op-level mmcv fidelity is that oracle's own test, this file covers
converter naming + graph wiring.  Reference naming:
``mmdet/models/backbones/resnet.py`` (``layerX.Y.conv2.conv_offset``),
``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py`` (convs/upsample/
conv_logits), ``mmdet/models/roi_heads/cascade_roi_head.py``
(``bbox_head`` ModuleList).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from boosting_rcnn_tpu.models.backbones.resnet import ResNet  # noqa: E402
from boosting_rcnn_tpu.models.roi_heads.bbox_head import (  # noqa: E402
    ConvFCBBoxHead,
)
from boosting_rcnn_tpu.models.roi_heads.mask_head import (  # noqa: E402
    FCNMaskHead,
)
from tools.convert_torch_weights import (  # noqa: E402
    _merge_leaves,
    convert_mmdet_checkpoint,
    convert_torchvision_resnet,
)
from tests.test_deform_conv import np_deform_conv  # noqa: E402

BASE = 8  # tiny bottleneck-resnet50 width (stage outs 32/64/128/256)
KK = 9  # 3x3 taps


class TBottleneck(torch.nn.Module):
    """Torch mirror of the reference Bottleneck, optionally with a DCNv2
    conv2 evaluated through the numpy oracle."""

    def __init__(self, cin, planes, stride=1, dcn=False):
        super().__init__()
        out_ch = planes * 4
        self.stride = stride
        self.dcn = dcn
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        if dcn:
            # mmcv ModulatedDeformConv2dPack: conv2.weight + nested
            # conv2.conv_offset emitting dg*3*KK channels
            self.conv2_weight = torch.nn.Parameter(
                torch.randn(planes, planes, 3, 3) * 0.05
            )
            self.conv_offset = torch.nn.Conv2d(
                planes, 3 * KK, 3, stride, 1, bias=True
            )
        else:
            self.conv2 = torch.nn.Conv2d(
                planes, planes, 3, stride, 1, bias=False
            )
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out_ch)
        self.down = (
            torch.nn.ModuleList(
                [
                    torch.nn.Conv2d(cin, out_ch, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(out_ch),
                ]
            )
            if (stride != 1 or cin != out_ch)
            else None
        )

    def _dcn_forward(self, x):
        raw = self.conv_offset(x)  # (B, 3*KK, Ho, Wo)
        raw = raw.numpy().transpose(0, 2, 3, 1)
        off = raw[..., : 2 * KK]
        mask = 1.0 / (1.0 + np.exp(-raw[..., 2 * KK :]))
        xn = x.numpy().transpose(0, 2, 3, 1)
        w = self.conv2_weight.detach().numpy().transpose(2, 3, 1, 0)
        out = np_deform_conv(xn, off, w, mask, self.stride, 1, 1, 1)
        return torch.from_numpy(
            out.transpose(0, 3, 1, 2).astype(np.float32)
        )

    def forward(self, x):
        idt = self.down[1](self.down[0](x)) if self.down is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self._dcn_forward(y) if self.dcn else self.conv2(y)
        y = F.relu(self.bn2(y))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)

    def state_into(self, sd, prefix):
        sd[f"{prefix}.conv1.weight"] = self.conv1.weight
        sd[f"{prefix}.conv3.weight"] = self.conv3.weight
        if self.dcn:
            sd[f"{prefix}.conv2.weight"] = self.conv2_weight
            sd[f"{prefix}.conv2.conv_offset.weight"] = self.conv_offset.weight
            sd[f"{prefix}.conv2.conv_offset.bias"] = self.conv_offset.bias
        else:
            sd[f"{prefix}.conv2.weight"] = self.conv2.weight
        for i in (1, 2, 3):
            bn = getattr(self, f"bn{i}")
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.bn{i}.{leaf}"] = getattr(bn, leaf)
        if self.down is not None:
            sd[f"{prefix}.downsample.0.weight"] = self.down[0].weight
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.downsample.1.{leaf}"] = getattr(
                    self.down[1], leaf
                )


class TorchDCNResNet(torch.nn.Module):
    """Tiny R50-layout backbone, DCNv2 on stages 2-4 (the shipping
    ``boosting_rcnn_r2_101_dcn`` / ``configs/dcn`` placement)."""

    STAGE_BLOCKS = (3, 4, 6, 3)
    STAGE_WITH_DCN = (False, True, True, True)

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, BASE, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(BASE)
        self.layers = torch.nn.ModuleList()
        cin, planes = BASE, BASE
        for si, nb in enumerate(self.STAGE_BLOCKS):
            stride = 1 if si == 0 else 2
            blocks = torch.nn.ModuleList()
            for b in range(nb):
                blocks.append(
                    TBottleneck(
                        cin,
                        planes,
                        stride if b == 0 else 1,
                        dcn=self.STAGE_WITH_DCN[si],
                    )
                )
                cin = planes * 4
            self.layers.append(blocks)
            planes *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for blocks in self.layers:
            for blk in blocks:
                x = blk(x)
            outs.append(x)
        return outs

    def mmdet_state_dict(self):
        sd = {}
        sd["conv1.weight"] = self.conv1.weight
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{leaf}"] = getattr(self.bn1, leaf)
        for si, blocks in enumerate(self.layers):
            for bi, blk in enumerate(blocks):
                blk.state_into(sd, f"layer{si+1}.{bi}")
        return {k: v.detach() for k, v in sd.items()}


def test_dcn_backbone_checkpoint_parity():
    rs = np.random.RandomState(0)
    tm = TorchDCNResNet()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.from_numpy(rs.randn(m.num_features).astype("f") * 0.1)
                )
                m.running_var.copy_(
                    torch.from_numpy(rs.rand(m.num_features).astype("f") + 0.5)
                )
            # keep predicted offsets small but non-zero so the bilinear
            # taps land off-grid (the converter bug class being guarded)
            if isinstance(m, torch.nn.Conv2d) and m.out_channels == 3 * KK:
                m.weight.mul_(0.05)
                m.bias.copy_(
                    torch.from_numpy(rs.randn(3 * KK).astype("f") * 0.3)
                )
    tm.eval()

    params, stats = convert_torchvision_resnet(tm.mmdet_state_dict())

    net = ResNet(
        depth=50,
        base_channels=BASE,
        dcn=dict(type="DCNv2", deform_groups=1),
        stage_with_dcn=(False, True, True, True),
    )
    x = rs.rand(1, 64, 96, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {
        "params": jax.tree.map(
            jnp.asarray,
            _merge_leaves(jax.tree.map(np.asarray, variables["params"]), params),
        ),
        "batch_stats": jax.tree.map(
            jnp.asarray,
            _merge_leaves(
                jax.tree.map(np.asarray, variables["batch_stats"]), stats
            ),
        ),
    }
    j_cs = net.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        t_cs = tm.forward(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(j_cs) == len(t_cs) == 4
    for lvl, (jc, tc) in enumerate(zip(j_cs, t_cs)):
        np.testing.assert_allclose(
            np.asarray(jc),
            tc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3,
            atol=1e-3,
            err_msg=f"C{lvl+2} mismatch",
        )


NUM_CLASSES = 4
MASK_CH = 16
FEAT = 16
FC = 24


class TorchMaskHead(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.convs = torch.nn.ModuleList(
            [
                torch.nn.Conv2d(
                    FEAT if i == 0 else MASK_CH, MASK_CH, 3, 1, 1
                )
                for i in range(4)
            ]
        )
        self.upsample = torch.nn.ConvTranspose2d(MASK_CH, MASK_CH, 2, 2)
        self.conv_logits = torch.nn.Conv2d(MASK_CH, NUM_CLASSES, 1)

    def forward(self, x):
        for c in self.convs:
            x = F.relu(c(x))
        x = F.relu(self.upsample(x))
        return self.conv_logits(x)

    def mmdet_state_dict(self):
        sd = {}
        for i, c in enumerate(self.convs):
            sd[f"roi_head.mask_head.convs.{i}.conv.weight"] = c.weight
            sd[f"roi_head.mask_head.convs.{i}.conv.bias"] = c.bias
        for name in ("upsample", "conv_logits"):
            m = getattr(self, name)
            sd[f"roi_head.mask_head.{name}.weight"] = m.weight
            sd[f"roi_head.mask_head.{name}.bias"] = m.bias
        return {k: v.detach() for k, v in sd.items()}


def test_mask_head_checkpoint_parity(tmp_path):
    rs = np.random.RandomState(1)
    tm = TorchMaskHead().eval()
    ckpt = str(tmp_path / "mask.pth")
    torch.save({"state_dict": tm.mmdet_state_dict()}, ckpt)
    params, _ = convert_mmdet_checkpoint(ckpt)

    head = FCNMaskHead(num_classes=NUM_CLASSES, conv_channels=MASK_CH)
    pooled = rs.rand(5, 14, 14, FEAT).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(pooled))
    merged = _merge_leaves(
        jax.tree.map(np.asarray, variables["params"]), params["mask_head"]
    )
    j = head.apply({"params": jax.tree.map(jnp.asarray, merged)},
                   jnp.asarray(pooled))
    with torch.no_grad():
        t = tm(torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
    assert np.asarray(j).shape == (5, 28, 28, NUM_CLASSES)
    np.testing.assert_allclose(
        np.asarray(j), t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


class TorchCascadeHeads(torch.nn.Module):
    """3x Shared2FC bbox heads, mmdet cascade naming
    (``roi_head.bbox_head.N.*``), reg_class_agnostic as in Cascade R-CNN."""

    def __init__(self):
        super().__init__()
        self.stages = torch.nn.ModuleList()
        for _ in range(3):
            st = torch.nn.ModuleDict(
                dict(
                    fc0=torch.nn.Linear(FEAT * 7 * 7, FC),
                    fc1=torch.nn.Linear(FC, FC),
                    fc_cls=torch.nn.Linear(FC, NUM_CLASSES + 1),
                    fc_reg=torch.nn.Linear(FC, 4),
                )
            )
            self.stages.append(st)

    def stage_forward(self, s, flat_chw):
        st = self.stages[s]
        x = F.relu(st["fc0"](flat_chw))
        x = F.relu(st["fc1"](x))
        return st["fc_cls"](x), st["fc_reg"](x)

    def mmdet_state_dict(self):
        sd = {}
        for s, st in enumerate(self.stages):
            p = f"roi_head.bbox_head.{s}"
            for i, key in enumerate(("fc0", "fc1")):
                sd[f"{p}.shared_fcs.{i}.weight"] = st[key].weight
                sd[f"{p}.shared_fcs.{i}.bias"] = st[key].bias
            for key in ("fc_cls", "fc_reg"):
                sd[f"{p}.{key}.weight"] = st[key].weight
                sd[f"{p}.{key}.bias"] = st[key].bias
        return {k: v.detach() for k, v in sd.items()}


def test_cascade_bbox_heads_checkpoint_parity(tmp_path):
    rs = np.random.RandomState(2)
    tm = TorchCascadeHeads().eval()
    ckpt = str(tmp_path / "cascade.pth")
    torch.save({"state_dict": tm.mmdet_state_dict()}, ckpt)
    params, _ = convert_mmdet_checkpoint(ckpt)

    pooled = rs.rand(6, 7, 7, FEAT).astype(np.float32)
    flat_chw = torch.from_numpy(pooled.transpose(0, 3, 1, 2).reshape(6, -1))
    for s in range(3):
        head = ConvFCBBoxHead(
            num_classes=NUM_CLASSES,
            fc_out_channels=FC,
            reg_class_agnostic=True,
        )
        variables = head.init(jax.random.PRNGKey(s), jnp.asarray(pooled))
        merged = _merge_leaves(
            jax.tree.map(np.asarray, variables["params"]),
            params[f"bbox_heads_{s}"],
        )
        j_cls, j_reg = head.apply(
            {"params": jax.tree.map(jnp.asarray, merged)}, jnp.asarray(pooled)
        )
        with torch.no_grad():
            t_cls, t_reg = tm.stage_forward(s, flat_chw)
        np.testing.assert_allclose(
            np.asarray(j_cls), t_cls.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"stage {s} cls",
        )
        np.testing.assert_allclose(
            np.asarray(j_reg), t_reg.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"stage {s} reg",
        )
