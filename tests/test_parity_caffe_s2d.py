"""Parity tests for the round-3 backbone additions.

  * ``style='caffe'`` (stride on the Bottleneck 1x1 conv1 — reference
    ``mmdet/models/backbones/resnet.py`` ``conv1_stride`` branch) against a
    hand-built torch mirror through ``convert_torchvision_resnet``;
  * the space-to-depth stem rewrite (``_S2DStemConv``) is exactly the
    7x7/s2 conv: same param tree, same outputs, odd and even input sizes.

DCN-backbone / cascade / mask-head checkpoint parity live in
``test_parity_dcn_cascade.py``.
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
from tools.convert_torch_weights import (  # noqa: E402
    _merge_leaves,
    convert_torchvision_resnet,
)

BASE = 8  # tiny resnet50 width


def _rand_conv(rs, cout, cin, k):
    return torch.from_numpy(
        (rs.randn(cout, cin, k, k) * (1.0 / np.sqrt(cin * k * k))).astype("f")
    )


def _rand_bn(rs, c):
    return {
        "weight": torch.from_numpy((rs.rand(c) + 0.5).astype("f")),
        "bias": torch.from_numpy((rs.randn(c) * 0.1).astype("f")),
        "running_mean": torch.from_numpy((rs.randn(c) * 0.1).astype("f")),
        "running_var": torch.from_numpy((rs.rand(c) + 0.5).astype("f")),
    }


def _t_bn(x, sd, p):
    return F.batch_norm(
        x, sd[p + ".running_mean"], sd[p + ".running_var"],
        sd[p + ".weight"], sd[p + ".bias"], training=False,
    )


def _build_dcn_r50_state_dict(rs, stage_with_dcn):
    """mmdet-named tiny R50 state dict; DCN stages get
    ``layerX.Y.conv2.conv_offset.*`` exactly as mmcv DeformConv2dPack."""
    blocks = (3, 4, 6, 3)
    sd = {}
    sd["conv1.weight"] = _rand_conv(rs, BASE, 3, 7)
    for leaf, v in _rand_bn(rs, BASE).items():
        sd[f"bn1.{leaf}"] = v
    cin = BASE
    for s, n in enumerate(blocks):
        planes = BASE * (2 ** s)
        out_ch = planes * 4
        for b in range(n):
            p = f"layer{s+1}.{b}"
            sd[f"{p}.conv1.weight"] = _rand_conv(rs, planes, cin, 1)
            if stage_with_dcn[s]:
                # small random offsets: nonzero so the deform path is real,
                # subpixel-scale so the bilinear window stays informative
                sd[f"{p}.conv2.conv_offset.weight"] = _rand_conv(
                    rs, 18, planes, 3) * 0.3
                sd[f"{p}.conv2.conv_offset.bias"] = torch.from_numpy(
                    (rs.randn(18) * 0.2).astype("f"))
            sd[f"{p}.conv2.weight"] = _rand_conv(rs, planes, planes, 3)
            sd[f"{p}.conv3.weight"] = _rand_conv(rs, out_ch, planes, 1)
            for i, c in ((1, planes), (2, planes), (3, out_ch)):
                for leaf, v in _rand_bn(rs, c).items():
                    sd[f"{p}.bn{i}.{leaf}"] = v
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = _rand_conv(rs, out_ch, cin, 1)
                for leaf, v in _rand_bn(rs, out_ch).items():
                    sd[f"{p}.downsample.1.{leaf}"] = v
            cin = out_ch
    return sd


def test_caffe_style_backbone_checkpoint_parity():
    """``style='caffe'`` puts the stage stride on the 1x1 conv1 (reference
    Bottleneck ``conv1_stride`` branch, caffe-pretrained config family)."""
    rs = np.random.RandomState(3)
    sd = _build_dcn_r50_state_dict(rs, (False,) * 4)  # plain R50 dict

    params, stats = convert_torchvision_resnet(sd)
    net = ResNet(depth=50, base_channels=BASE, style="caffe",
                 out_indices=(0, 1, 2, 3))
    x = rs.rand(1, 64, 64, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {
        "params": jax.tree.map(
            jnp.asarray,
            _merge_leaves(jax.tree.map(np.asarray, variables["params"]),
                          params)),
        "batch_stats": jax.tree.map(
            jnp.asarray,
            _merge_leaves(
                jax.tree.map(np.asarray, variables.get("batch_stats", {})),
                stats)),
    }
    j_outs = net.apply(variables, jnp.asarray(x))

    def caffe_bottleneck(x, p, stride):
        idt = x
        y = F.relu(_t_bn(
            F.conv2d(x, sd[f"{p}.conv1.weight"], stride=stride), sd,
            f"{p}.bn1"))
        y = F.relu(_t_bn(
            F.conv2d(y, sd[f"{p}.conv2.weight"], padding=1), sd, f"{p}.bn2"))
        y = _t_bn(F.conv2d(y, sd[f"{p}.conv3.weight"]), sd, f"{p}.bn3")
        if f"{p}.downsample.0.weight" in sd:
            idt = _t_bn(
                F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=stride),
                sd, f"{p}.downsample.1")
        return F.relu(y + idt)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y = F.relu(_t_bn(
            F.conv2d(xt, sd["conv1.weight"], stride=2, padding=3), sd, "bn1"))
        y = F.max_pool2d(y, 3, 2, 1)
        t_outs = []
        for s, n in enumerate((3, 4, 6, 3)):
            for b in range(n):
                stride = 1 if (s == 0 or b > 0) else 2
                y = caffe_bottleneck(y, f"layer{s+1}.{b}", stride)
            t_outs.append(y)
    for lvl, (jo, to) in enumerate(zip(j_outs, t_outs)):
        np.testing.assert_allclose(
            np.asarray(jo), to.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4, err_msg=f"caffe C{lvl+2}")


def test_s2d_stem_exactly_matches_plain_conv():
    """The space-to-depth stem is an exact rearrangement of the 7x7/s2
    conv — same params, same outputs (both odd and even input sizes)."""
    from boosting_rcnn_tpu.models.backbones.resnet import ResNet

    rs = np.random.RandomState(5)
    for hw in ((64, 96), (63, 97)):
        x = jnp.asarray(rs.rand(2, *hw, 3).astype(np.float32))
        a = ResNet(depth=18, base_channels=8, stem_s2d=True)
        b = ResNet(depth=18, base_channels=8, stem_s2d=False)
        va = a.init(jax.random.PRNGKey(0), x)
        outs_a = a.apply(va, x)
        outs_b = b.apply(va, x)  # same param tree: conv1/kernel is (7,7,3,8)
        for oa, ob in zip(outs_a, outs_b):
            np.testing.assert_allclose(
                np.asarray(oa), np.asarray(ob), rtol=1e-5, atol=1e-5)
