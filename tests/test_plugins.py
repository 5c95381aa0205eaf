"""Backbone plugin surface (VERDICT r2 item 5): ContextBlock (GCNet),
GeneralizedAttention (empirical attention), ConvWS/GN (gn+ws) — oracle
tests for the simple math + forward smoke for the three config families.

Reference surface: ``mmdet/models/backbones/resnet.py:121-140`` plugins,
``configs/gcnet``, ``configs/empirical_attention``, ``configs/gn+ws``.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.models.plugins import (
    ContextBlock,
    GeneralizedAttention,
    WSConv,
    standardize_weight,
)


def test_context_block_numpy_oracle():
    """att-pooled context + channel_add bottleneck vs a numpy reference."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 5, 6), jnp.float32)
    m = ContextBlock(ratio=0.5)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(variables, x))

    p = jax.tree.map(np.asarray, variables["params"])
    xn = np.asarray(x)
    n, h, w, c = xn.shape
    # attention pooling
    mask = xn @ p["conv_mask"]["kernel"][0, 0] + p["conv_mask"]["bias"]
    mask = mask.reshape(n, h * w)
    mask = np.exp(mask - mask.max(1, keepdims=True))
    mask /= mask.sum(1, keepdims=True)
    ctx = np.einsum("nsc,ns->nc", xn.reshape(n, h * w, c), mask)
    # channel_add transform: conv1 -> LN over channels -> relu -> conv2
    y = ctx @ p["channel_add_conv1"]["kernel"][0, 0] + p["channel_add_conv1"]["bias"]
    mu, var = y.mean(-1, keepdims=True), y.var(-1, keepdims=True)
    y = (y - mu) / np.sqrt(var + 1e-6)
    y = y * p["channel_add_ln"]["scale"] + p["channel_add_ln"]["bias"]
    y = np.maximum(y, 0)
    y = y @ p["channel_add_conv2"]["kernel"][0, 0] + p["channel_add_conv2"]["bias"]
    expected = xn + y[:, None, None, :]
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_ws_conv_standardizes():
    """WSConv == conv with per-filter standardized kernel."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 6, 6, 3), jnp.float32)
    m = WSConv(4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(variables, x))
    k = variables["params"]["kernel"]
    ks = standardize_weight(k)
    np.testing.assert_allclose(
        np.asarray(ks).reshape(-1, 4).mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ks).reshape(-1, 4).std(0), 1.0, atol=1e-3)
    ref = jax.lax.conv_general_dilated(
        x, ks, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("attention_type", ["0010", "1111"])
def test_generalized_attention_forward(attention_type):
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 6, 8, 16), jnp.float32)
    m = GeneralizedAttention(
        num_heads=4, kv_stride=2, attention_type=attention_type)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(variables, x))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    params = variables["params"]
    if attention_type == "0010":
        # key-content-only: no query path, appr_bias present
        assert "query_conv" not in params and "appr_bias" in params
        assert "appr_geom_fc_x" not in params
    else:
        assert {"query_conv", "key_conv", "appr_bias", "geom_bias",
                "appr_geom_fc_x", "appr_geom_fc_y"} <= set(params)
    # gamma init 0 -> identity at init
    np.testing.assert_allclose(out, np.asarray(x), atol=1e-6)
    # gradient flows once gamma is perturbed
    variables2 = jax.tree_util.tree_map(lambda a: a, variables)
    variables2["params"] = dict(params, gamma=jnp.ones((1,)))
    out2 = np.asarray(m.apply(variables2, x))
    assert np.abs(out2 - np.asarray(x)).max() > 1e-4


@pytest.mark.parametrize(
    "path",
    [
        "configs/gcnet/mask_rcnn_r50_fpn_r4_gcb_c3-c5_1x_coco.py",
        "configs/empirical_attention/faster_rcnn_r50_fpn_attention_0010_1x_coco.py",
        "configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py",
    ],
)
@pytest.mark.slow
def test_plugin_config_families_forward(path):
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(os.path.join(REPO, path))
    mc = cfg.model.to_dict()

    def shrink_gn(d):  # tiny channels: GN groups must divide them
        if isinstance(d, dict):
            if d.get("type") == "GN":
                d["num_groups"] = 4
            for v in d.values():
                shrink_gn(v)
        elif isinstance(d, (list, tuple)):
            for v in d:
                shrink_gn(v)

    shrink_gn(mc)
    mc["backbone"].update(depth=50, base_channels=8)
    mc["neck"].update(in_channels=[32, 64, 128, 256], out_channels=16)
    mc["rpn_head"].update(feat_channels=16)
    bh = mc["roi_head"]["bbox_head"]
    bh.update(fc_out_channels=32, num_classes=4)
    if bh.get("type") == "Shared4Conv1FCBBoxHead":
        bh.update(conv_out_channels=16)
    if mc["roi_head"].get("mask_head"):
        mc["roi_head"]["mask_head"].update(
            num_classes=4, conv_out_channels=8, num_convs=1)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=16)
    det = build_detector(mc)

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    with_masks = bool(mc["roi_head"].get("mask_head"))
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1, with_masks=with_masks)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(np.asarray(v).sum())), (k, v)
    out = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(out[0])[np.asarray(out[2])]).all()

    # plugin params actually exist in the built graph
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = "/".join(str(p) for p, _ in flat)
    if "gcnet" in path:
        assert "plugin" in names and "conv_mask" in names
    if "attention" in path:
        assert "plugin" in names and "appr_bias" in names
    if "gn+ws" in path:
        # GN scale params in backbone (no batch_stats for those layers)
        assert "shared_conv_0" in names