"""Guided Anchoring (reference ``guided_anchor_head.py`` +
``ga_rpn_head.py``): loc/shape target geometry + GA-Faster R-CNN e2e."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.models.dense_heads.guided_anchor_head import (
    GACfg,
    approx_anchors,
    bounded_iou_loss,
    ga_loc_targets,
    ga_shape_targets,
    guided_anchors,
    square_anchors,
)


def test_ga_loc_targets_center_region():
    """A gt lands on its scale level; its center 20% region is positive,
    the 50% ring ignored (weight 0), the rest weight 0.1."""
    cfg = GACfg(strides=(8, 16, 32))
    fs = [(16, 24), (8, 12), (4, 6)]
    # sqrt(60*70)=64.8 -> log2(64.8/64)+0.5 -> level 0
    gts = jnp.asarray([[30.0, 30.0, 90.0, 100.0]])
    t, w, _ = ga_loc_targets(cfg, gts, jnp.asarray([True]), fs)
    t0 = np.asarray(t[: 16 * 24]).reshape(16, 24)
    w0 = np.asarray(w[: 16 * 24]).reshape(16, 24)
    # center region: x in [30+60*0.4, 30+60*0.6]/8 = [6.75, 8.25] -> cols 7-8
    assert t0[7:9, 7:9].all()
    assert t0.sum() == w0[t0 > 0].sum()  # centers have weight 1
    # ignore ring exists: some zero-weight cells around the center
    assert (w0 == 0.0).any()
    assert (w0 == 0.1).any()


def test_ga_shape_targets_and_bounded_iou():
    cfg = GACfg(strides=(8, 16, 32))
    fs = [(16, 24), (8, 12), (4, 6)]
    sq, _ = square_anchors(cfg, fs)
    ap = approx_anchors(cfg, fs)
    gts = jnp.asarray([[30.0, 30.0, 90.0, 100.0]])
    ba, bg, bw = ga_shape_targets(cfg, ap, sq, gts, jnp.asarray([True]))
    assert bw.sum() > 0
    # positives carry the gt box
    pos = np.asarray(bw) > 0
    assert (np.asarray(bg)[pos] == np.asarray(gts)[0]).all()
    # bounded-iou: exact match -> 0 loss
    l = bounded_iou_loss(gts, gts)
    np.testing.assert_allclose(np.asarray(l), 0.0, atol=1e-5)
    assert float(bounded_iou_loss(gts + 10.0, gts).sum()) > 0


def test_guided_anchor_decode_grows_square():
    cfg = GACfg()
    sq = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    # dw delta of 1/std -> w *= e
    ga = guided_anchors(cfg, sq, jnp.asarray([[1.0 / 0.14, 0.0]]))
    w = float(ga[0, 2] - ga[0, 0])
    np.testing.assert_allclose(w, 64.0 * np.e, rtol=1e-4)


@pytest.mark.slow
def test_ga_faster_rcnn_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(os.path.join(
        REPO, "configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["rpn_head"].update(feat_channels=16, deform_groups=1)
    mc["roi_head"]["bbox_head"].update(fc_out_channels=16, num_classes=4)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=16)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=32, max_per_img=8)
    mc["test_cfg"]["rcnn"]["max_per_img"] = 8
    det = build_detector(mc)
    assert det.rpn_type == "ga_rpn"

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    assert anchors.shape[1] == 4
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_anchor_loc" in losses and "loss_anchor_shape" in losses
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


@pytest.mark.slow
def test_sabl_retinanet_train_and_test():
    """SABL (reference sabl_retina_head.py): bucketing losses + confidence
    rescored decode on the square-anchor RetinaNet."""
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(os.path.join(
        REPO, "configs/sabl/sabl_retinanet_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["bbox_head"].update(feat_channels=16, stacked_convs=1, num_classes=4)
    mc["test_cfg"].update(max_per_img=8)
    det = build_detector(mc)

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert set(losses) == {"loss_cls", "loss_bbox_cls", "loss_bbox_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(p):
        ls = det.loss({**variables, "params": p}, jax.random.PRNGKey(1),
                      batch, anchors, nla)
        return sum(jnp.asarray(v) for v in ls.values())

    g = jax.grad(total)(variables["params"])
    gn = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(float(gn)) and float(gn) > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_ga_retinanet_train_and_test():
    """GA-RetinaNet (reference ga_retina_head.py): loc/shape + guided
    anchor focal cls + smooth-L1 reg."""
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(os.path.join(
        REPO, "configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["bbox_head"].update(feat_channels=16, stacked_convs=1,
                           num_classes=4, deform_groups=1)
    mc["test_cfg"].update(max_per_img=8)
    det = build_detector(mc)

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_anchor_loc" in losses and "loss_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
