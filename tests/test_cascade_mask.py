"""Cascade Mask R-CNN (reference ``roi_heads/cascade_roi_head.py`` with
``mask_head`` — the configs/cascade_rcnn cascade_mask_* family): the HTC
machinery with interleaved execution and mask info flow OFF.

Checks: per-stage bbox+mask losses exist and are finite, mask loss carries
gradient, predict emits mask crops, and the non-interleaved/no-info-flow
wiring is actually selected (net.mask_info_flow / cascade_cfg.interleaved).
"""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.config import load_config
from boosting_rcnn_tpu.data.loader import FakeDetLoader

CANVAS = (64, 96)


def _tiny_cascade_mask():
    cfg = load_config(os.path.join(
        REPO, "configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["rpn_head"].update(feat_channels=16)
    for h in mc["roi_head"]["bbox_head"]:
        h.update(fc_out_channels=16, num_classes=4)
    mh = mc["roi_head"]["mask_head"]
    for h in mh if isinstance(mh, list) else [mh]:
        h.update(num_classes=4, conv_out_channels=8, num_convs=1)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    for rc in mc["train_cfg"]["rcnn"]:
        rc["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=16)
    return build_detector(mc)


def _batch():
    loader = FakeDetLoader(
        batch_size=1, canvas=CANVAS, num_classes=4, num_batches=1,
        with_masks=True,
    )
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_cascade_mask_loss_and_predict():
    det = _tiny_cascade_mask()
    # the cascade-mask wiring (not HTC's): no interleave, no info flow
    assert det.cascade_cfg.interleaved is False
    assert det.net.mask_info_flow is False
    assert len(det.net.mask_heads) == 3
    assert not det.net.mask_heads[0].with_conv_res

    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = _batch()
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for s in range(3):
        assert f"s{s}.loss_cls" in losses, sorted(losses)
        assert f"s{s}.loss_mask" in losses, sorted(losses)
    for k, v in losses.items():
        assert np.isfinite(float(np.asarray(v).sum())), (k, v)

    # mask loss carries gradient into the mask heads
    def mask_total(params):
        l = det.loss({**variables, "params": params},
                     jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(v for k, v in l.items() if "loss_mask" in k)

    g = jax.grad(mask_total)(variables["params"])
    gnorm = sum(
        float(jnp.abs(x).sum())
        for p, x in jax.tree_util.tree_leaves_with_path(g)
        if any("mask_head" in str(k) for k in p)
    )
    assert gnorm > 0.0

    out = det.predict(variables, batch, anchors, nla)
    assert len(out) == 4  # dets, labels, valid, mask crops
    dets, labels, valid, masks = out
    assert masks.ndim == 4  # (B, R, m, m)
    assert np.isfinite(np.asarray(masks)).all()
