"""Checkpoint parity for the C4 RoI path (reference
``roi_heads/shared_heads/res_layer.py`` + C4 ``BBoxHead`` with_avg_pool +
conv-free ``FCNMaskHead``): a hand-built mmdet-style state dict is run
through ``convert_mmdet_checkpoint``'s shared-head/mask branches and the
flax ``Res5BBoxHead``/``FCNMaskHead`` must reproduce a manual torch
forward of the same weights — the same harness pattern that caught the
CHW/HWC flatten, R18 downsample and GN-eps bugs on the flagship graph
(``tests/test_full_model_parity.py``).
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

from tools.convert_torch_weights import _merge_leaves  # noqa: E402

P = 8  # res5 planes (tiny; reference uses 512)
CIN = 16  # C4 feature channels entering the RoI head (reference: 1024)
NCLS = 3


def _rand_sd(rs):
    """mmdet-style C4 roi_head state dict: shared_head.layer4 (3 caffe
    bottlenecks, stride 2 on block 0), avg-pool bbox head, num_convs=0
    mask head (deconv + 1x1 logits)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.2

    def bn(name, c):
        sd[name + ".weight"] = rs.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rs.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rs.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rs.rand(c).astype(np.float32) + 0.5

    out = P * 4
    for b in range(3):
        pre = f"roi_head.shared_head.layer4.{b}"
        cin = CIN if b == 0 else out
        conv(f"{pre}.conv1", P, cin, 1)
        bn(f"{pre}.bn1", P)
        conv(f"{pre}.conv2", P, P, 3)
        bn(f"{pre}.bn2", P)
        conv(f"{pre}.conv3", out, P, 1)
        bn(f"{pre}.bn3", out)
        if b == 0:
            conv(f"{pre}.downsample.0", out, cin, 1)
            bn(f"{pre}.downsample.1", out)
    sd["roi_head.bbox_head.fc_cls.weight"] = (
        rs.randn(NCLS + 1, out).astype(np.float32) * 0.1)
    sd["roi_head.bbox_head.fc_cls.bias"] = rs.randn(NCLS + 1).astype(np.float32)
    sd["roi_head.bbox_head.fc_reg.weight"] = (
        rs.randn(4 * NCLS, out).astype(np.float32) * 0.1)
    sd["roi_head.bbox_head.fc_reg.bias"] = rs.randn(4 * NCLS).astype(np.float32)
    # ConvTranspose2d weight is (in, out, kh, kw)
    sd["roi_head.mask_head.upsample.weight"] = (
        rs.randn(out, P, 2, 2).astype(np.float32) * 0.2)
    sd["roi_head.mask_head.upsample.bias"] = rs.randn(P).astype(np.float32)
    sd["roi_head.mask_head.conv_logits.weight"] = (
        rs.randn(NCLS, P, 1, 1).astype(np.float32) * 0.2)
    sd["roi_head.mask_head.conv_logits.bias"] = rs.randn(NCLS).astype(np.float32)
    return sd


def _t_bn(x, sd, p):
    return F.batch_norm(
        x, torch.from_numpy(sd[p + ".running_mean"]),
        torch.from_numpy(sd[p + ".running_var"]),
        torch.from_numpy(sd[p + ".weight"]),
        torch.from_numpy(sd[p + ".bias"]), False, 0.0, 1e-5)


def _torch_res5(x, sd):
    """Caffe-style bottlenecks: stage stride on conv1 of block 0."""
    for b in range(3):
        pre = f"roi_head.shared_head.layer4.{b}"
        stride = 2 if b == 0 else 1
        idt = x
        y = F.relu(_t_bn(F.conv2d(
            x, torch.from_numpy(sd[f"{pre}.conv1.weight"]), stride=stride),
            sd, f"{pre}.bn1"))
        y = F.relu(_t_bn(F.conv2d(
            y, torch.from_numpy(sd[f"{pre}.conv2.weight"]), padding=1),
            sd, f"{pre}.bn2"))
        y = _t_bn(F.conv2d(
            y, torch.from_numpy(sd[f"{pre}.conv3.weight"])), sd, f"{pre}.bn3")
        if f"{pre}.downsample.0.weight" in sd:
            idt = _t_bn(F.conv2d(
                x, torch.from_numpy(sd[f"{pre}.downsample.0.weight"]),
                stride=stride), sd, f"{pre}.downsample.1")
        x = F.relu(y + idt)
    return x


def test_c4_res5_bbox_mask_checkpoint_parity(tmp_path):
    from boosting_rcnn_tpu.models.detectors.trident import Res5BBoxHead
    from boosting_rcnn_tpu.models.roi_heads.mask_head import FCNMaskHead
    from tools.convert_torch_weights import convert_mmdet_checkpoint

    rs = np.random.RandomState(0)
    sd = _rand_sd(rs)
    ck = tmp_path / "c4.pth"
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, ck)
    params, stats = convert_mmdet_checkpoint(str(ck))

    pooled = rs.rand(3, 14, 14, CIN).astype(np.float32)

    bbox = Res5BBoxHead(num_classes=NCLS, base_planes=P, style="caffe")
    variables = bbox.init(jax.random.PRNGKey(0), jnp.asarray(pooled))
    variables = {
        "params": jax.tree.map(jnp.asarray, _merge_leaves(
            jax.tree.map(np.asarray, variables["params"]),
            params["bbox_head"])),
        "batch_stats": jax.tree.map(jnp.asarray, _merge_leaves(
            jax.tree.map(np.asarray, variables.get("batch_stats", {})),
            stats["bbox_head"])),
    }
    j_cls, j_reg = bbox.apply(variables, jnp.asarray(pooled))
    j_res5 = bbox.apply(variables, jnp.asarray(pooled),
                        method=Res5BBoxHead.res5)

    xt = torch.from_numpy(pooled.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t_res5 = _torch_res5(xt, sd)
        feat = t_res5.mean(dim=(2, 3))
        t_cls = feat @ torch.from_numpy(
            sd["roi_head.bbox_head.fc_cls.weight"]).T + torch.from_numpy(
            sd["roi_head.bbox_head.fc_cls.bias"])
        t_reg = feat @ torch.from_numpy(
            sd["roi_head.bbox_head.fc_reg.weight"]).T + torch.from_numpy(
            sd["roi_head.bbox_head.fc_reg.bias"])

    np.testing.assert_allclose(
        np.asarray(j_res5), t_res5.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4, err_msg="shared res5 features")
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(),
                               rtol=2e-4, atol=2e-4)

    # mask branch: conv-free FCN head on the SAME res5 features
    mask = FCNMaskHead(num_classes=NCLS, num_convs=0, conv_channels=P)
    mv = mask.init(jax.random.PRNGKey(1), j_res5)
    mv = {"params": jax.tree.map(jnp.asarray, _merge_leaves(
        jax.tree.map(np.asarray, mv["params"]), params["mask_head"]))}
    j_mask = mask.apply(mv, j_res5)
    with torch.no_grad():
        t_up = F.relu(F.conv_transpose2d(
            t_res5, torch.from_numpy(
                sd["roi_head.mask_head.upsample.weight"]),
            torch.from_numpy(sd["roi_head.mask_head.upsample.bias"]),
            stride=2))
        t_mask = F.conv2d(
            t_up, torch.from_numpy(
                sd["roi_head.mask_head.conv_logits.weight"]),
            torch.from_numpy(sd["roi_head.mask_head.conv_logits.bias"]))
    np.testing.assert_allclose(
        np.asarray(j_mask), t_mask.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4, err_msg="C4 mask logits (7 -> 14)")
    assert j_mask.shape[1:3] == (14, 14)
