"""CentripetalNet (reference ``centripetal_head.py``): shift targets,
decode pairing, full detector."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_centripetal_targets_geometry():
    """Guiding shift = (feature-px vector corner -> center); centripetal =
    its log (reference get_targets with_*_shift)."""
    from boosting_rcnn_tpu.models.dense_heads.centripetal_head import (
        CentripetalCfg,
        centripetal_targets,
    )

    cfg = CentripetalCfg(num_classes=2, stride=4)
    gts = jnp.asarray([[8.0, 8.0, 40.0, 24.0]])  # feat: tl (2,2) br (10,6)
    out = centripetal_targets(
        cfg, gts, jnp.asarray([1]), jnp.asarray([True]), (16, 16))
    tl_guide, br_guide = np.asarray(out[6])[0], np.asarray(out[7])[0]
    # center feat coords (6, 4): tl corner (2,2) -> guide (4, 2)
    np.testing.assert_allclose(tl_guide, [4.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(br_guide, [4.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[8])[0], np.log([4.0, 2.0]),
                               atol=1e-5)


@pytest.mark.slow
def test_centripetalnet_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    mc = dict(
        type="CentripetalNet",
        backbone=dict(type="HourglassNet", num_stacks=2,
                      downsample_times=2, feat_channel=16),
        bbox_head=dict(type="CentripetalHead", num_classes=4,
                       feat_channels=16),
        test_cfg=dict(corner_topk=16, max_per_img=8, score_thr=0.05),
    )
    det = build_detector(mc)
    canvas = (64, 64)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    pack, nlp = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert "loss_centripetal_shift" in losses
    assert "loss_guiding_shift" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    assert np.isfinite(np.asarray(dets)).all()
