"""SCNet (reference ``detectors/scnet.py`` + ``scnet_roi_head.py``): build,
train losses (glbctx/relay/mask), predict with masks."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_scnet_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        os.path.join(REPO, "configs/scnet/scnet_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["rpn_head"].update(feat_channels=32)
    for h in mc["roi_head"]["bbox_head"]:
        h.update(fc_out_channels=32, num_classes=4)
    mc["roi_head"]["mask_head"].update(num_classes=4, num_convs=2,
                                       conv_out_channels=32)
    mc["roi_head"]["glbctx_head"].update(num_classes=4, num_convs=1,
                                         conv_out_channels=32)
    mc["roi_head"]["feat_relay_head"].update(out_conv_channels=32)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=16)
    for st in mc["train_cfg"]["rcnn"]:
        st["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=32, max_per_img=8)
    mc["test_cfg"]["rcnn"]["max_per_img"] = 8
    det = build_detector(mc)

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1,
                               with_masks=True).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_glbctx" in losses and "loss_mask" in losses
    assert any(k.startswith("s2.") for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    out = det.predict(variables, batch, anchors, nla)
    dets, labels, valid, masks = out
    assert np.asarray(masks).shape[-2:] == (28, 28)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_scnet_glbctx_target_semantics():
    """Global-context multilabel target: classes present in the image get 1
    (reference global_context_head loss: BCE against per-image class set)."""
    from boosting_rcnn_tpu.models.detectors.scnet import GlobalContextHead

    head = GlobalContextHead(num_classes=4, num_convs=1, channels=8)
    feats = tuple(jnp.ones((2, s, s, 8)) for s in (16, 8, 4))
    v = head.init(jax.random.PRNGKey(0), feats)
    logits, vec = head.apply(v, feats)
    assert logits.shape == (2, 4)
    assert vec.shape == (2, 8)
