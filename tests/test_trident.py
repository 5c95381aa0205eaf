"""TridentNet (reference ``trident_resnet.py`` + ``trident_faster_rcnn.py``):
shared-weight branches, branch-folded batch, C4 roi head."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_trident_backbone_branch_semantics():
    """With dilation (1,1,1) the three branches are identical programs, so
    identical inputs tiled 3x must give identical outputs (weight sharing);
    with (1,2,3) they must differ."""
    from boosting_rcnn_tpu.models.backbones.trident_resnet import (
        TridentResNet,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    x3 = jnp.concatenate([x, x, x], axis=0)
    same = TridentResNet(depth=50, base_channels=8,
                         trident_dilations=(1, 1, 1), frozen_stages=-1)
    v = same.init(jax.random.PRNGKey(0), x3)
    (out,) = same.apply(v, x3)
    np.testing.assert_allclose(out[:2], out[2:4], atol=1e-5)
    np.testing.assert_allclose(out[:2], out[4:6], atol=1e-5)

    tri = TridentResNet(depth=50, base_channels=8,
                        trident_dilations=(1, 2, 3), frozen_stages=-1)
    v2 = tri.init(jax.random.PRNGKey(0), x3)
    (out2,) = tri.apply(v2, x3)
    assert np.abs(np.asarray(out2[:2] - out2[2:4])).max() > 1e-3
    # param count identical (weights shared across branches)
    n1 = sum(p.size for p in jax.tree_util.tree_leaves(v))
    n2 = sum(p.size for p in jax.tree_util.tree_leaves(v2))
    assert n1 == n2


@pytest.mark.slow
def test_trident_faster_rcnn_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        os.path.join(REPO,
                     "configs/tridentnet/tridentnet_r50_caffe_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(base_channels=8, frozen_stages=-1)
    mc["rpn_head"].update(in_channels=32, feat_channels=32)
    mc["roi_head"]["bbox_head"].update(num_classes=4)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=16)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=32, max_per_img=8)
    mc["test_cfg"]["rcnn"]["max_per_img"] = 8
    det = build_detector(mc)
    assert det.num_branch == 3 and det.test_branch_idx == 1

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(2, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    dets, labels, valid = det.predict(variables, batch, anchors, nla)[:3]
    assert dets.shape[0] == 2  # only the test branch's outputs
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
