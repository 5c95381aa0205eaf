"""Numeric parity against PyTorch (torch CPU is available; torchvision is
not, so blocks are built by hand with torchvision's exact structure and
naming).  Validates the weight-converter transpose rules + frozen-BN math +
'pytorch-style' stride placement — the mechanism released-checkpoint parity
(SURVEY.md §7 stage 3) rests on."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boosting_rcnn_tpu.models.backbones.resnet import Bottleneck, BasicBlock
from tools.convert_torch_weights import _assign_conv_or_bn, _t_conv


class TorchBottleneck(torch.nn.Module):
    """torchvision-style Bottleneck (stride on the 3x3)."""

    def __init__(self, cin, planes, stride):
        super().__init__()
        out = planes * 4
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        self.downsample = torch.nn.Sequential(
            torch.nn.Conv2d(cin, out, 1, stride, bias=False),
            torch.nn.BatchNorm2d(out),
        )
        self.relu = torch.nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


def _randomize_bn(bn, rs):
    bn.weight.data = torch.from_numpy(rs.rand(bn.weight.shape[0]).astype(np.float32) + 0.5)
    bn.bias.data = torch.from_numpy(rs.randn(bn.bias.shape[0]).astype(np.float32) * 0.1)
    bn.running_mean.data = torch.from_numpy(rs.randn(bn.running_mean.shape[0]).astype(np.float32) * 0.1)
    bn.running_var.data = torch.from_numpy(rs.rand(bn.running_var.shape[0]).astype(np.float32) + 0.5)


@pytest.mark.parametrize("stride", [1, 2])
def test_bottleneck_parity(stride):
    rs = np.random.RandomState(0)
    tb = TorchBottleneck(16, 8, stride)
    for bn in (tb.bn1, tb.bn2, tb.bn3, tb.downsample[1]):
        _randomize_bn(bn, rs)
    tb.eval()

    # convert weights through the converter's assignment rules
    params, stats = {}, {}
    mapping = {
        "conv1": tb.conv1, "bn1": tb.bn1, "conv2": tb.conv2, "bn2": tb.bn2,
        "conv3": tb.conv3, "bn3": tb.bn3,
        "downsample_conv": tb.downsample[0], "downsample_bn": tb.downsample[1],
    }
    for name, mod in mapping.items():
        for leaf, val in mod.state_dict().items():
            _assign_conv_or_bn(params, stats, [name], leaf, val.numpy())

    block = Bottleneck(planes=8, stride=stride, downsample=True)
    x_np = rs.rand(1, 16, 20, 16).astype(np.float32)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    ours = np.asarray(block.apply(variables, jnp.asarray(x_np)))
    with torch.no_grad():
        theirs = tb(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_basic_block_parity():
    rs = np.random.RandomState(1)

    class TorchBasic(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(8, 8, 3, 1, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(8)
            self.conv2 = torch.nn.Conv2d(8, 8, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(8)
            self.relu = torch.nn.ReLU()

        def forward(self, x):
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + x)

    tb = TorchBasic()
    for bn in (tb.bn1, tb.bn2):
        _randomize_bn(bn, rs)
    tb.eval()
    params, stats = {}, {}
    for name, mod in {"conv1": tb.conv1, "bn1": tb.bn1,
                      "conv2": tb.conv2, "bn2": tb.bn2}.items():
        for leaf, val in mod.state_dict().items():
            _assign_conv_or_bn(params, stats, [name], leaf, val.numpy())
    block = BasicBlock(planes=8)
    x_np = rs.rand(1, 12, 14, 8).astype(np.float32)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    ours = np.asarray(block.apply(variables, jnp.asarray(x_np)))
    with torch.no_grad():
        theirs = tb(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_conversion_rules():
    from tools.convert_torch_weights import _t_conv, _t_fc

    w = np.random.RandomState(0).rand(8, 4, 3, 3).astype(np.float32)  # OIHW
    assert _t_conv(w).shape == (3, 3, 4, 8)
    fc = np.random.RandomState(1).rand(6, 10).astype(np.float32)
    assert _t_fc(fc).shape == (10, 6)


@pytest.mark.parametrize("modulated", [False, True])
def test_dcn_bottleneck_converter_parity(modulated):
    """DCN Bottleneck through the converter: mmcv stores the deformable
    conv's main weight as ``conv2.weight`` (OIHW) and its offset predictor
    as ``conv2.conv_offset.{weight,bias}``.  With the offset conv zeroed
    (mmcv's init), DCN == plain conv, so torch's F.conv2d provides the
    numeric oracle for the whole converted block."""
    import torch.nn.functional as F

    rs = np.random.RandomState(7)
    planes, cin = 8, 16
    kk = 9
    off_ch = (3 if modulated else 2) * kk

    tb = TorchBottleneck(cin, planes, stride=1)
    for bn in (tb.bn1, tb.bn2, tb.bn3, tb.downsample[1]):
        _randomize_bn(bn, rs)
    tb.eval()

    conv_offset_w = np.zeros((off_ch, planes, 3, 3), np.float32)
    conv_offset_b = np.zeros((off_ch,), np.float32)

    params, stats = {}, {}
    mapping = {
        "conv1": tb.conv1, "bn1": tb.bn1, "conv2": tb.conv2, "bn2": tb.bn2,
        "conv3": tb.conv3, "bn3": tb.bn3,
        "downsample_conv": tb.downsample[0], "downsample_bn": tb.downsample[1],
    }
    for name, mod in mapping.items():
        for leaf, val in mod.state_dict().items():
            _assign_conv_or_bn(params, stats, [name], leaf, val.numpy())
    _assign_conv_or_bn(
        params, stats, ["conv2", "conv_offset"], "weight", conv_offset_w
    )
    _assign_conv_or_bn(
        params, stats, ["conv2", "conv_offset"], "bias", conv_offset_b
    )

    block = Bottleneck(
        planes=planes, stride=1, downsample=True,
        dcn=dict(type="DCNv2" if modulated else "DCN", deform_groups=1),
    )
    x_np = rs.rand(1, 12, 14, cin).astype(np.float32)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    ours = np.asarray(block.apply(variables, jnp.asarray(x_np)))

    with torch.no_grad():
        xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        idt = tb.downsample(xt)
        y = tb.relu(tb.bn1(tb.conv1(xt)))
        y = F.conv2d(y, tb.conv2.weight, None, 1, 1)
        if modulated:
            y = y * 0.5  # sigmoid(0) modulation mask
        y = tb.relu(tb.bn2(y))
        y = tb.bn3(tb.conv3(y))
        theirs = tb.relu(y + idt).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )
