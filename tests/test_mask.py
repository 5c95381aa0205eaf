"""Mask R-CNN path tests: target resampling numerics + end-to-end forward."""
import jax
import jax.numpy as jnp
import numpy as np
import os

import pytest

from boosting_rcnn_tpu.models.roi_heads.mask_head import (
    FCNMaskHead,
    mask_loss,
    resample_mask_targets,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resample_identity():
    """RoI == gt box -> target is the (resized) crop itself."""
    s = 56
    crop = np.zeros((s, s), np.float32)
    crop[: s // 2] = 1.0  # top half on
    gt_boxes = np.array([[10.0, 20.0, 50.0, 60.0]], np.float32)
    roi = gt_boxes.copy()
    t = np.asarray(
        resample_mask_targets(crop[None], gt_boxes, roi, np.array([0]), out_size=28)
    )
    assert t.shape == (1, 28, 28)
    np.testing.assert_array_equal(t[0, :13], 1.0)
    np.testing.assert_array_equal(t[0, 15:], 0.0)


def test_resample_shifted_roi():
    """RoI covering the bottom half of the gt -> target all zeros there."""
    s = 56
    crop = np.zeros((s, s), np.float32)
    crop[: s // 2] = 1.0
    gt_boxes = np.array([[0.0, 0.0, 40.0, 40.0]], np.float32)
    roi = np.array([[0.0, 20.0, 40.0, 40.0]], np.float32)  # bottom half
    t = np.asarray(
        resample_mask_targets(crop[None], gt_boxes, roi, np.array([0]), out_size=28)
    )
    assert t.sum() == 0
    roi_top = np.array([[0.0, 0.0, 40.0, 20.0]], np.float32)
    t2 = np.asarray(
        resample_mask_targets(crop[None], gt_boxes, roi_top, np.array([0]), out_size=28)
    )
    assert (t2 == 1).all()


def test_mask_head_shapes_and_loss():
    head = FCNMaskHead(num_classes=4, conv_channels=16)
    x = jnp.zeros((6, 14, 14, 8))
    v = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(v, x)
    assert out.shape == (6, 28, 28, 4)
    targets = jnp.ones((6, 28, 28))
    labels = jnp.array([0, 1, 2, 3, 0, 1])
    pos = jnp.array([True, True, False, False, True, False])
    l = mask_loss(out, targets, labels, pos)
    assert np.isfinite(float(l)) and float(l) > 0


@pytest.mark.slow
def test_mask_rcnn_forward():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from tests.test_forward import shrink, CANVAS

    cfg = load_config(
        os.path.join(REPO, "configs/mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py")
    )
    mc = shrink(cfg.model.to_dict())
    mc["roi_head"]["mask_head"]["num_classes"] = 4
    mc["roi_head"]["bbox_head"]["num_classes"] = 4
    mc["roi_head"]["mask_head"]["conv_out_channels"] = 16
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)

    loader = FakeDetLoader(
        batch_size=2, canvas=CANVAS, num_classes=4, max_gt=5,
        num_batches=1, with_masks=True,
    )
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    out = det.predict(variables, batch, anchors, nla)
    assert len(out) == 4
    dets, labels, valid, masks = out
    assert masks.shape[-2:] == (28, 28)
    assert np.asarray(masks).min() >= 0 and np.asarray(masks).max() <= 1


def test_mask_iou_targets_golden():
    """Perfect prediction of a gt fully inside the proposal -> IoU target 1;
    half-covered gt -> ~area ratio."""
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.models.roi_heads.mask_head import mask_iou_targets

    m = 28
    # gt box == roi box, mask fills the whole box, pred == target
    full = jnp.ones((1, m, m))
    t = mask_iou_targets(
        full * 0.9, full, crop_fracs=jnp.asarray([1.0]),
        roi_boxes=jnp.asarray([[0.0, 0, 56, 56]]),
        gt_boxes=jnp.asarray([[0.0, 0, 56, 56]]),
    )
    np.testing.assert_allclose(np.asarray(t), [1.0], atol=1e-5)
    # proposal covers only the left half of the gt box: in-proposal target
    # is full, but the full instance is twice as big -> IoU 0.5
    t2 = mask_iou_targets(
        full * 0.9, full, crop_fracs=jnp.asarray([1.0]),
        roi_boxes=jnp.asarray([[0.0, 0, 28, 56]]),
        gt_boxes=jnp.asarray([[0.0, 0, 56, 56]]),
    )
    np.testing.assert_allclose(np.asarray(t2), [0.5], atol=1e-2)


@pytest.mark.slow
def test_mask_scoring_rcnn_forward():
    """MS R-CNN end-to-end: loss has loss_mask_iou; predict returns mask
    scores that differ from cls scores."""
    import glob
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from tests.test_forward import CANVAS, REPO, shrink

    cfg = load_config(os.path.join(REPO, "configs/ms_rcnn/ms_rcnn_r50_fpn_1x_coco.py"))
    mc = shrink(cfg.model.to_dict())
    mc["roi_head"]["bbox_head"]["num_classes"] = 4
    mc["roi_head"]["mask_head"]["num_classes"] = 4
    mc["roi_head"]["mask_iou_head"].update(num_classes=4, conv_out_channels=16,
                                           fc_out_channels=32)
    mc["roi_head"]["mask_head"]["conv_out_channels"] = 16
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    loader = FakeDetLoader(batch_size=2, canvas=CANVAS, num_classes=4,
                           num_batches=1, with_masks=True)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_mask_iou" in losses and "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = det.predict(variables, batch, anchors, nla)
    assert len(out) == 5
    dets, labels, valid, masks, mask_scores = out
    assert mask_scores.shape == dets.shape[:2]
    ms = np.asarray(mask_scores)[np.asarray(valid)]
    cs = np.asarray(dets)[np.asarray(valid)][:, 4]
    assert (ms <= cs + 1e-6).all()  # iou in [0, 1] only shrinks confidence


@pytest.mark.slow
def test_mask_rcnn_c4_shared_res5():
    """C4 Mask R-CNN (reference configs/_base_/models/mask_rcnn_r50_caffe_c4
    + standard_roi_head.py share_roi_extractor): the mask branch pools with
    the bbox extractor geometry, runs the SAME res5 parameters as the bbox
    branch (no second copy), and emits 14x14 masks (7x7 res5 out, one 2x
    deconv)."""
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    canvas = (64, 96)
    cfg = load_config(os.path.join(
        REPO, "configs/mask_rcnn/mask_rcnn_r50_caffe_c4_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["rpn_head"].update(in_channels=32, feat_channels=16)
    mc["roi_head"]["bbox_head"]["num_classes"] = 4
    mc["roi_head"]["mask_head"]["num_classes"] = 4
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=16)
    det = build_detector(mc)
    assert det.net.mask_on_shared
    variables = det.init(jax.random.PRNGKey(0), canvas)

    # exactly ONE res5 tower: the mask branch shares the bbox head's params
    bh = variables["params"]["bbox_head"]
    assert "res5_0" in bh and "fc_cls" in bh
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    res5_paths = {jax.tree_util.keystr(p) for p, _ in flat
                  if "res5_0" in jax.tree_util.keystr(p)}
    assert all(p.startswith("['bbox_head']") for p in res5_paths), res5_paths

    anchors, nla = det.anchors_for(canvas)
    loader = FakeDetLoader(batch_size=2, canvas=canvas, num_classes=4,
                           max_gt=5, num_batches=1, with_masks=True)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    g = jax.grad(lambda p: det.loss(
        {**variables, "params": p}, jax.random.PRNGKey(1), batch, anchors,
        nla)["loss_mask"])(variables["params"])
    # the shared res5 receives mask-loss gradient
    gnorm = sum(float(jnp.abs(x).sum()) for x in
                jax.tree_util.tree_leaves(g["bbox_head"]["res5_0"]))
    assert gnorm > 0

    dets, labels, valid, masks = det.predict(variables, batch, anchors, nla)
    assert masks.shape[-2:] == (14, 14)
    assert np.asarray(masks).min() >= 0 and np.asarray(masks).max() <= 1
