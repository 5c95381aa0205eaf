"""ATSS single-stage checkpoint parity (VERDICT r3 missing-3b; ATSS is a
named BASELINE graph — reference ``configs/atss/metafile.yml:39``,
``mmdet/models/dense_heads/atss_head.py``).

Builds the whole ATSS graph tiny in plain torch with mmdet state_dict
naming (``backbone.*``, ``neck.{lateral_convs,fpn_convs}.N.conv`` incl.
the on_output extra-level convs appended into ``fpn_convs``,
``bbox_head.{cls,reg}_convs.N.{conv,gn}``, ``bbox_head.atss_{cls,reg,
centerness}``, ``bbox_head.scales.N.scale``), converts via
``convert_mmdet_checkpoint`` (single-stage auto-dispatch) and asserts
forward parity of backbone, neck and all three per-level head maps.
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
from boosting_rcnn_tpu.models.detectors.single_stage import (  # noqa: E402
    SingleStageNet,
)
from tests.test_full_model_parity import BASE, TBasic  # noqa: E402
from tools.convert_torch_weights import (  # noqa: E402
    _merge_leaves,
    convert_mmdet_checkpoint,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FEAT = 32  # GN(32) divides it
STACKED = 2
NUM_CLASSES = 4


class TorchATSS(torch.nn.Module):
    """Tiny R18 + FPN(start 1, 5 outs, extras on_output) + ATSS head."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, BASE, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(BASE)
        chans = [BASE, BASE * 2, BASE * 4, BASE * 8]
        self.layers = torch.nn.ModuleList()
        cin = BASE
        for si, planes in enumerate(chans):
            stride = 1 if si == 0 else 2
            self.layers.append(torch.nn.ModuleList(
                [TBasic(cin, planes, stride), TBasic(planes, planes)]))
            cin = planes
        used = 3  # C3..C5
        self.lateral = torch.nn.ModuleList(
            [torch.nn.Conv2d(chans[1 + i], FEAT, 1) for i in range(used)])
        # mmdet FPN appends the extra on_output stride-2 convs to fpn_convs
        self.fpn = torch.nn.ModuleList(
            [torch.nn.Conv2d(FEAT, FEAT, 3, 1, 1) for _ in range(used)]
            + [torch.nn.Conv2d(FEAT, FEAT, 3, 2, 1) for _ in range(2)])
        # ATSS head: ConvModule(conv no-bias + GN32) towers + 3 branches
        self.cls_convs = torch.nn.ModuleList()
        self.cls_gns = torch.nn.ModuleList()
        self.reg_convs = torch.nn.ModuleList()
        self.reg_gns = torch.nn.ModuleList()
        for _ in range(STACKED):
            self.cls_convs.append(
                torch.nn.Conv2d(FEAT, FEAT, 3, 1, 1, bias=False))
            self.cls_gns.append(torch.nn.GroupNorm(32, FEAT))
            self.reg_convs.append(
                torch.nn.Conv2d(FEAT, FEAT, 3, 1, 1, bias=False))
            self.reg_gns.append(torch.nn.GroupNorm(32, FEAT))
        A = 1
        self.atss_cls = torch.nn.Conv2d(FEAT, A * NUM_CLASSES, 3, 1, 1)
        self.atss_reg = torch.nn.Conv2d(FEAT, A * 4, 3, 1, 1)
        self.atss_centerness = torch.nn.Conv2d(FEAT, A, 3, 1, 1)
        self.scales = torch.nn.Parameter(torch.ones(5))

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
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
        outs = [self.fpn[i](lats[i]) for i in range(used)]
        outs.append(self.fpn[used](outs[-1]))      # P6 on_output
        outs.append(self.fpn[used + 1](outs[-1]))  # P7
        return outs

    def head_fwd(self, feats):
        outs = []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv, gn in zip(self.cls_convs, self.cls_gns):
                cf = F.relu(gn(conv(cf)))
            for conv, gn in zip(self.reg_convs, self.reg_gns):
                rf = F.relu(gn(conv(rf)))
            outs.append((
                self.atss_cls(cf),
                self.atss_reg(rf) * self.scales[lvl],
                self.atss_centerness(rf),
            ))
        return outs

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
                    for leaf in ("weight", "bias", "running_mean",
                                 "running_var"):
                        sd[f"{p}.downsample.1.{leaf}"] = getattr(
                            blk.down[1], leaf)
        for fam, mods in (("lateral_convs", self.lateral),
                          ("fpn_convs", self.fpn)):
            for i, m in enumerate(mods):
                sd[f"neck.{fam}.{i}.conv.weight"] = m.weight
                sd[f"neck.{fam}.{i}.conv.bias"] = m.bias
        for branch in ("cls", "reg"):
            convs = getattr(self, f"{branch}_convs")
            gns = getattr(self, f"{branch}_gns")
            for i, (conv, gn) in enumerate(zip(convs, gns)):
                sd[f"bbox_head.{branch}_convs.{i}.conv.weight"] = conv.weight
                sd[f"bbox_head.{branch}_convs.{i}.gn.weight"] = gn.weight
                sd[f"bbox_head.{branch}_convs.{i}.gn.bias"] = gn.bias
        for name in ("atss_cls", "atss_reg", "atss_centerness"):
            m = getattr(self, name)
            sd[f"bbox_head.{name}.weight"] = m.weight
            sd[f"bbox_head.{name}.bias"] = m.bias
        for i in range(5):
            sd[f"bbox_head.scales.{i}.scale"] = self.scales[i]
        return {k: v.detach() for k, v in sd.items()}


def test_atss_checkpoint_parity(tmp_path):
    rs = np.random.RandomState(1)
    tm = TorchATSS()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rs.randn(m.num_features).astype("f") * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rs.rand(m.num_features).astype("f") + 0.5))
        tm.scales.copy_(torch.from_numpy(rs.rand(5).astype("f") + 0.5))
    tm.eval()

    ckpt = str(tmp_path / "tiny_atss.pth")
    torch.save({"state_dict": tm.mmdet_state_dict()}, ckpt)
    params, stats = convert_mmdet_checkpoint(ckpt)

    cfg = load_config(os.path.join(REPO, "configs/atss/atss_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=BASE)
    mc["neck"].update(
        in_channels=[BASE, BASE * 2, BASE * 4, BASE * 8], out_channels=FEAT)
    mc["bbox_head"].update(
        num_classes=NUM_CLASSES, feat_channels=FEAT, in_channels=FEAT,
        stacked_convs=STACKED)
    det = build_detector(mc)

    canvas = (256, 384)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    merged_params = _merge_leaves(
        jax.tree.map(np.asarray, variables["params"]), params)
    merged_stats = _merge_leaves(
        jax.tree.map(np.asarray, variables.get("batch_stats", {})), stats)
    variables = {
        "params": jax.tree.map(jnp.asarray, merged_params),
        "batch_stats": jax.tree.map(jnp.asarray, merged_stats),
    }

    x = rs.rand(1, *canvas, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        t_cs = tm.backbone_fwd(xt)
    j_cs = det.net.apply(
        variables, jnp.asarray(x), method=lambda net, im: net.backbone(im))
    for jc, tc in zip(j_cs, t_cs):
        np.testing.assert_allclose(
            np.asarray(jc), tc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)

    with torch.no_grad():
        t_ps = tm.neck_fwd(t_cs)
    j_ps = det.net.apply(variables, jnp.asarray(x),
                         method=SingleStageNet.features)
    assert len(j_ps) == len(t_ps) == 5
    for jp, tp in zip(j_ps, t_ps):
        np.testing.assert_allclose(
            np.asarray(jp), tp.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)

    with torch.no_grad():
        t_maps = tm.head_fwd(t_ps)
    j_cls, j_reg, j_ctr = det.net.apply(variables, jnp.asarray(x))
    for lvl in range(5):
        tc, tr, tt = t_maps[lvl]
        np.testing.assert_allclose(
            np.asarray(j_cls[lvl]), tc.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(j_reg[lvl]), tr.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(j_ctr[lvl]), tt.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)
