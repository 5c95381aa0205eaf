"""YOLACT (reference ``detectors/yolact.py`` + ``yolact_head.py``):
fast-NMS semantics, mask assembly, full detector train/test."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_fast_nms_semantics():
    """Fast NMS keeps a det iff no higher-scored same-class det overlaps it
    above the threshold (may prune more than greedy NMS — by design)."""
    from boosting_rcnn_tpu.models.detectors.yolact import fast_nms

    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.0], [0.8, 0.0], [0.0, 0.7]])
    dets, labels, valid, kept = fast_nms(boxes, scores, 0.5, 3, 4, 0.05)
    v = np.asarray(valid)
    assert v.sum() == 2
    kept_set = {(int(l), int(k)) for l, k, vv in
                zip(np.asarray(labels), np.asarray(kept), v) if vv}
    assert (0, 0) in kept_set and (1, 2) in kept_set


def test_crop_sample_mask_roundtrip():
    """A full-ones 28x28 crop pasted at a box covers exactly the box
    region of the canvas grid."""
    from boosting_rcnn_tpu.models.detectors.yolact import crop_sample_mask

    crop = jnp.ones((28, 28))
    out = crop_sample_mask(crop, jnp.asarray([16.0, 8.0, 48.0, 24.0]),
                           16, 32, (32, 64))
    o = np.asarray(out)
    # box covers x in [16,48) of 64 -> cols 8..23; y in [8,24) of 32 -> rows 4..11
    assert o[6, 12] == 1.0
    assert o[0, 0] == 0.0 and o[15, 31] == 0.0
    assert 100 <= (o > 0.5).sum() <= 160


@pytest.mark.slow
def test_yolact_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        os.path.join(REPO, "configs/yolact/yolact_r50_1x8_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["bbox_head"].update(feat_channels=16, num_classes=4, num_protos=8,
                           anchor_generator=dict(
                               type='AnchorGenerator', octave_base_scale=3,
                               scales_per_octave=1, ratios=[0.5, 1.0, 2.0],
                               strides=[8, 16, 32, 64, 128]))
    mc["mask_head"].update(num_classes=4, max_masks_to_train=8)
    mc["segm_head"].update(num_classes=4)
    mc["test_cfg"].update(top_k=16, max_per_img=8)
    det = build_detector(mc)

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1,
                               with_masks=True).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert {"loss_cls", "loss_bbox", "loss_mask", "loss_segm"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(p):
        ls = det.loss(p, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.asarray(v) for v in ls.values())

    g = jax.grad(total)(variables)
    gn = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(float(gn)) and float(gn) > 0

    dets, labels, valid, masks = det.predict(variables, batch, anchors, nla)
    assert np.asarray(masks).shape[-2:] == (28, 28)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
