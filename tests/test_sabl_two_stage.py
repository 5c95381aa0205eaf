"""SABL Faster R-CNN (VERDICT r2 item 6): bucketing bbox head for the
two-stage detector (reference ``bbox_heads/sabl_head.py:15``,
``configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py``)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bucketing_coder_roi_geometry_round_trip():
    """encode->perfect-logits->decode recovers the gt box at RoI-head
    geometry (num_buckets=14, scale_factor=1.7)."""
    from boosting_rcnn_tpu.ops.bucketing_coder import bbox2bucket, bucket2bbox

    proposals = jnp.asarray(
        [[100.0, 80.0, 260.0, 200.0], [40.0, 40.0, 120.0, 90.0]])
    gt = jnp.asarray([[110.0, 90.0, 240.0, 190.0], [45.0, 50.0, 115.0, 85.0]])
    offsets, off_w, bucket_labels, cls_w = bbox2bucket(
        proposals, gt, num_buckets=14, scale_factor=1.7)
    assert offsets.shape == (2, 28) and bucket_labels.shape == (2, 28)
    # feed the one-hot labels as (scaled) logits and the exact offsets
    boxes, conf = bucket2bbox(
        proposals, bucket_labels * 20.0, offsets, 14, 1.7)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(gt), atol=1e-2)
    assert (np.asarray(conf) > 0.9).all()


@pytest.fixture(scope="module")
def sabl_det():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config

    cfg = load_config(
        os.path.join(REPO, "configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py")
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["rpn_head"].update(feat_channels=16)
    mc["roi_head"]["bbox_head"].update(
        num_classes=4, reg_in_channels=16, cls_in_channels=16,
        cls_out_channels=32, reg_offset_out_channels=16,
        reg_cls_out_channels=16,
    )
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=16)
    return build_detector(mc)


@pytest.mark.slow
def test_sabl_faster_rcnn_forward_train_and_test(sabl_det):
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    det = sabl_det
    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    loader = FakeDetLoader(batch_size=2, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert {"loss_cls", "loss_bbox_cls", "loss_bbox_reg"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(np.asarray(v).sum())), (k, v)

    # gradients flow into the SABL head params
    def total(params):
        vv = {"params": params,
              "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(g)
    sabl_leaves = [v for p, v in flat if "fc_reg_offset" in str(p)
                   or "reg_conv_att_x" in str(p)]
    assert sabl_leaves and all(
        np.isfinite(np.asarray(v)).all() for v in sabl_leaves)
    assert sum(float(jnp.abs(v).sum()) for v in sabl_leaves) > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    dets = np.asarray(dets)
    assert dets.shape[-1] == 5
    assert np.isfinite(dets[np.asarray(valid)]).all()
