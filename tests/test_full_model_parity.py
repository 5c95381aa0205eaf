"""Full-graph checkpoint-parity harness (BASELINE.json gate 1 mechanism).

Builds the WHOLE Boosting R-CNN graph in plain torch at tiny size with
mmdet's exact state_dict naming (backbone.*, neck.lateral_convs.N.conv.*,
rpn_head.rpn_convs.N.{conv,gn}.*, rpn_head.scales.N.scale,
roi_head.bbox_head.shared_fcs.N.*, ...), saves a checkpoint, converts it
with ``tools/convert_torch_weights.convert_mmdet_checkpoint``, and asserts
numeric forward parity for every converted stage:

  * backbone C2..C5 feature maps,
  * PAFPN P3..P7 (incl. on_output extra levels),
  * ATSSRPNHead cls/reg/iou maps per level (GN + relu tower + Scale),
  * ProbShared2FCBBoxHead cls/reg on identical pooled features (validates
    the CHW-flat vs HWC-flat first-FC permutation).

Proposal decode / RoIAlign / NMS are JAX-internal and carry their own
golden tests; with these four stages matching, released-checkpoint loading
is a pure IO exercise.  Reference naming: ``mmdet/models/dense_heads/
atss_rpn_head.py:150-215``, ``necks/pafpn.py:74-158``,
``roi_heads/bbox_heads/convfc_bbox_head.py:16-192``.
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

from boosting_rcnn_tpu.builder import build_detector  # noqa: E402
from boosting_rcnn_tpu.config import load_config  # noqa: E402
from boosting_rcnn_tpu.models.detectors.two_stage import TwoStageNet  # noqa: E402
from tools.convert_torch_weights import convert_mmdet_checkpoint  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = 8  # tiny resnet18 width
FEAT = 32  # neck/rpn channels (GN 32 groups divide 32)
FC = 48
NUM_CLASSES = 4
STACKED = 2


class TBasic(torch.nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.down = (
            torch.nn.ModuleList(
                [
                    torch.nn.Conv2d(cin, planes, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(planes),
                ]
            )
            if (stride != 1 or cin != planes)
            else None
        )

    def forward(self, x):
        idt = self.down[1](self.down[0](x)) if self.down is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TorchBoosting(torch.nn.Module):
    """Tiny R18 + PAFPN(start 1, outs 5, on_output) + ATSSRPN + 2FC head."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, BASE, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(BASE)
        chans = [BASE, BASE * 2, BASE * 4, BASE * 8]
        self.layers = torch.nn.ModuleList()
        cin = BASE
        for si, planes in enumerate(chans):
            stride = 1 if si == 0 else 2
            blocks = torch.nn.ModuleList(
                [TBasic(cin, planes, stride), TBasic(planes, planes)]
            )
            self.layers.append(blocks)
            cin = planes
        # PAFPN over C3..C5 (start_level=1)
        used = 3
        self.lateral = torch.nn.ModuleList(
            [torch.nn.Conv2d(chans[1 + i], FEAT, 1) for i in range(used)]
        )
        # fpn_convs: used 3x3 convs + 2 extra stride-2 on_output convs
        self.fpn = torch.nn.ModuleList(
            [torch.nn.Conv2d(FEAT, FEAT, 3, 1, 1) for _ in range(used)]
            + [torch.nn.Conv2d(FEAT, FEAT, 3, 2, 1) for _ in range(2)]
        )
        self.downsample = torch.nn.ModuleList(
            [torch.nn.Conv2d(FEAT, FEAT, 3, 2, 1) for _ in range(used - 1)]
        )
        self.pafpn = torch.nn.ModuleList(
            [torch.nn.Conv2d(FEAT, FEAT, 3, 1, 1) for _ in range(used - 1)]
        )
        # ATSS RPN: stacked ConvModule(conv+GN) tower + 3 branches + scales
        self.rpn_convs = torch.nn.ModuleList()
        self.rpn_gns = torch.nn.ModuleList()
        for _ in range(STACKED):
            self.rpn_convs.append(
                torch.nn.Conv2d(FEAT, FEAT, 3, 1, 1, bias=False)
            )
            self.rpn_gns.append(torch.nn.GroupNorm(32, FEAT))
        A = 1
        self.rpn_cls = torch.nn.Conv2d(FEAT, A, 3, 1, 1)
        self.rpn_reg = torch.nn.Conv2d(FEAT, A * 4, 3, 1, 1)
        self.rpn_iou = torch.nn.Conv2d(FEAT, A, 3, 1, 1)
        self.scales = torch.nn.Parameter(torch.ones(5))
        # ProbShared2FC head
        self.shared_fcs = torch.nn.ModuleList(
            [torch.nn.Linear(FEAT * 7 * 7, FC), torch.nn.Linear(FC, FC)]
        )
        self.fc_cls = torch.nn.Linear(FC, NUM_CLASSES + 1)
        self.fc_reg = torch.nn.Linear(FC, NUM_CLASSES * 4)

    def backbone_fwd(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for blocks in self.layers:
            for blk in blocks:
                x = blk(x)
            outs.append(x)
        return outs

    def neck_fwd(self, cs):
        used = 3
        lats = [self.lateral[i](cs[1 + i]) for i in range(used)]
        for i in range(used - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest"
            )
        inter = [self.fpn[i](lats[i]) for i in range(used)]
        for i in range(used - 1):
            inter[i + 1] = inter[i + 1] + self.downsample[i](inter[i])
        outs = [inter[0]] + [self.pafpn[i - 1](inter[i]) for i in range(1, used)]
        outs.append(self.fpn[used](outs[-1]))
        outs.append(self.fpn[used + 1](outs[-1]))
        return outs

    def rpn_fwd(self, feats):
        outs = []
        for lvl, x in enumerate(feats):
            for conv, gn in zip(self.rpn_convs, self.rpn_gns):
                x = F.relu(gn(conv(x)))
            cls = self.rpn_cls(x)
            reg = self.rpn_reg(x) * self.scales[lvl]
            iou = self.rpn_iou(x)
            outs.append((cls, reg, iou))
        return outs

    def head_fwd(self, pooled_chw_flat):
        x = pooled_chw_flat
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)

    def mmdet_state_dict(self):
        sd = {}
        sd["backbone.conv1.weight"] = self.conv1.weight
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"backbone.bn1.{leaf}"] = getattr(self.bn1, leaf)
        for si, blocks in enumerate(self.layers):
            for bi, blk in enumerate(blocks):
                p = f"backbone.layer{si+1}.{bi}"
                sd[f"{p}.conv1.weight"] = blk.conv1.weight
                sd[f"{p}.conv2.weight"] = blk.conv2.weight
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.bn1.{leaf}"] = getattr(blk.bn1, leaf)
                    sd[f"{p}.bn2.{leaf}"] = getattr(blk.bn2, leaf)
                if blk.down is not None:
                    sd[f"{p}.downsample.0.weight"] = blk.down[0].weight
                    for leaf in (
                        "weight", "bias", "running_mean", "running_var"
                    ):
                        sd[f"{p}.downsample.1.{leaf}"] = getattr(
                            blk.down[1], leaf
                        )
        for fam, mods in (
            ("lateral_convs", self.lateral),
            ("fpn_convs", self.fpn),
            ("downsample_convs", self.downsample),
            ("pafpn_convs", self.pafpn),
        ):
            for i, m in enumerate(mods):
                sd[f"neck.{fam}.{i}.conv.weight"] = m.weight
                sd[f"neck.{fam}.{i}.conv.bias"] = m.bias
        for i, (conv, gn) in enumerate(zip(self.rpn_convs, self.rpn_gns)):
            sd[f"rpn_head.rpn_convs.{i}.conv.weight"] = conv.weight
            sd[f"rpn_head.rpn_convs.{i}.gn.weight"] = gn.weight
            sd[f"rpn_head.rpn_convs.{i}.gn.bias"] = gn.bias
        for name in ("rpn_cls", "rpn_reg", "rpn_iou"):
            m = getattr(self, name)
            sd[f"rpn_head.{name}.weight"] = m.weight
            sd[f"rpn_head.{name}.bias"] = m.bias
        for i in range(5):
            sd[f"rpn_head.scales.{i}.scale"] = self.scales[i]
        for i, fc in enumerate(self.shared_fcs):
            sd[f"roi_head.bbox_head.shared_fcs.{i}.weight"] = fc.weight
            sd[f"roi_head.bbox_head.shared_fcs.{i}.bias"] = fc.bias
        sd["roi_head.bbox_head.fc_cls.weight"] = self.fc_cls.weight
        sd["roi_head.bbox_head.fc_cls.bias"] = self.fc_cls.bias
        sd["roi_head.bbox_head.fc_reg.weight"] = self.fc_reg.weight
        sd["roi_head.bbox_head.fc_reg.bias"] = self.fc_reg.bias
        return {k: v.detach() for k, v in sd.items()}


def _build_jax_detector():
    cfg = load_config(
        os.path.join(
            REPO, "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py"
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=BASE)
    mc["neck"].update(
        in_channels=[BASE, BASE * 2, BASE * 4, BASE * 8],
        out_channels=FEAT,
        start_level=1,
    )
    mc["rpn_head"].update(
        feat_channels=FEAT,
        stacked_convs=STACKED,
        # 1 anchor/location to match the torch mirror (COCO-config style)
        anchor_generator=dict(
            type="AnchorGenerator",
            octave_base_scale=8,
            scales_per_octave=1,
            ratios=[1.0],
            strides=[8, 16, 32, 64, 128],
        ),
    )
    mc["roi_head"]["bbox_head"].update(
        fc_out_channels=FC, num_classes=NUM_CLASSES
    )
    return build_detector(mc)


def test_full_graph_checkpoint_parity(tmp_path):
    rs = np.random.RandomState(0)
    tm = TorchBoosting()
    # randomize BN stats so frozen-BN math is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.from_numpy(rs.randn(m.num_features).astype("f") * 0.1)
                )
                m.running_var.copy_(
                    torch.from_numpy(rs.rand(m.num_features).astype("f") + 0.5)
                )
        tm.scales.copy_(torch.from_numpy(rs.rand(5).astype("f") + 0.5))
    tm.eval()

    ckpt = str(tmp_path / "tiny_boosting.pth")
    torch.save({"state_dict": tm.mmdet_state_dict()}, ckpt)
    params, stats = convert_mmdet_checkpoint(ckpt)

    det = _build_jax_detector()
    canvas = (256, 384)  # P7 = 2x3: torch GN refuses 1x1 maps
    variables = det.init(jax.random.PRNGKey(0), canvas)
    # graft converted weights over the initialized structure
    from tools.convert_torch_weights import _merge_leaves

    merged_params = _merge_leaves(
        jax.tree.map(np.asarray, variables["params"]), params
    )
    merged_stats = _merge_leaves(
        jax.tree.map(np.asarray, variables.get("batch_stats", {})), stats
    )
    variables = {
        "params": jax.tree.map(jnp.asarray, merged_params),
        "batch_stats": jax.tree.map(jnp.asarray, merged_stats),
    }

    x = rs.rand(1, *canvas, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # 1) backbone
    with torch.no_grad():
        t_cs = tm.backbone_fwd(xt)
    j_cs = det.net.apply(
        variables, jnp.asarray(x),
        method=lambda net, im: net.backbone(im),
    )
    assert len(j_cs) == len(t_cs)
    for jc, tc in zip(j_cs, t_cs):
        np.testing.assert_allclose(
            np.asarray(jc), tc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    # 2) neck (PAFPN + on_output extras)
    with torch.no_grad():
        t_ps = tm.neck_fwd(t_cs)
    j_ps = det.net.apply(
        variables, jnp.asarray(x), method=TwoStageNet.features
    )
    assert len(j_ps) == len(t_ps) == 5
    for jp, tp in zip(j_ps, t_ps):
        np.testing.assert_allclose(
            np.asarray(jp), tp.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    # 3) RPN head maps
    with torch.no_grad():
        t_rpn = tm.rpn_fwd(t_ps)
    j_cls, j_reg, j_iou = det.net.apply(
        variables, j_ps, method=TwoStageNet.rpn_out
    )
    for lvl in range(5):
        tc, tr, ti = t_rpn[lvl]
        np.testing.assert_allclose(
            np.asarray(j_cls[lvl]), tc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(j_reg[lvl]), tr.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(j_iou[lvl]), ti.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    # 4) bbox head on identical pooled features (catches the CHW/HWC
    # first-FC flatten permutation)
    pooled = rs.rand(6, 7, 7, FEAT).astype(np.float32)
    j_cls_s, j_reg_s = det.net.bbox_head.apply(
        {"params": variables["params"]["bbox_head"]}, jnp.asarray(pooled)
    )
    with torch.no_grad():
        t_cls_s, t_reg_s = tm.head_fwd(
            torch.from_numpy(
                pooled.transpose(0, 3, 1, 2).reshape(6, -1)
            )
        )
    np.testing.assert_allclose(
        np.asarray(j_cls_s), t_cls_s.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_reg_s), t_reg_s.numpy(), rtol=1e-4, atol=1e-4
    )
