"""Cascade RPN (reference ``cascade_rpn_head.py``): offset geometry,
stage-1 region targets, full crpn Faster R-CNN train/test."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_anchor_offsets_identity_for_default_anchor():
    """An anchor exactly matching the dilated 3x3 footprint (w = h =
    2*stride... i.e. half_w == 1) centred on its grid point gives zero
    offsets (the deform conv reduces to a plain dilation-1 conv)."""
    from boosting_rcnn_tpu.models.dense_heads.cascade_rpn_head import (
        CascadeRPNCfg,
        anchor_offsets,
    )

    cfg = CascadeRPNCfg(strides=(8,))
    # reference shape term: w/(ks-1) - dilation = w_strides/2 - 1, so zero
    # offsets need w = 2*stride = 16px, centred on the grid point (4,4)
    a = jnp.asarray([[4.0 - 8.0, 4.0 - 8.0, 4.0 + 8.0, 4.0 + 8.0]])
    (off,) = anchor_offsets(cfg, a, [(1, 1)])
    np.testing.assert_allclose(np.asarray(off), 0.0, atol=1e-5)


@pytest.mark.slow
def test_crpn_faster_rcnn_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(os.path.join(
        REPO, "configs/cascade_rpn/crpn_faster_rcnn_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    for st in mc["rpn_head"]["stages"]:
        st["feat_channels"] = 16
    mc["roi_head"]["bbox_head"].update(fc_out_channels=16, num_classes=4)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=16)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=32, max_per_img=8)
    mc["test_cfg"]["rcnn"].update(max_per_img=8, score_thr=0.05)
    det = build_detector(mc)
    assert det.rpn_type == "cascade_rpn"

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_rpn_s0_bbox" in losses and "loss_rpn_s1_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(p):
        ls = det.loss({**variables, "params": p}, jax.random.PRNGKey(1),
                      batch, anchors, nla)
        return sum(jnp.asarray(v) for v in ls.values())

    g = jax.grad(total)(variables["params"])
    gn = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(float(gn)) and float(gn) > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)[:3]
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
