"""PointRend (reference ``detectors/point_rend.py`` +
``point_rend_roi_head.py`` + ``mask_point_head.py``): point_sample golden
values, train-point selection, subdivision, and the full detector."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.ops.point_sample import (
    point_sample,
    rel_roi_point_to_rel_img_point,
)


def test_point_sample_golden():
    """grid_sample(align_corners=False) semantics: the normalized center of
    pixel (i, j) is ((j+0.5)/W, (i+0.5)/H) and samples exactly that pixel;
    midpoints average neighbours."""
    feat = jnp.asarray(
        np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    )
    pts = jnp.asarray(
        [
            [(1 + 0.5) / 4, (2 + 0.5) / 3],  # pixel (2, 1) -> 9
            [(0 + 0.5) / 4, (0 + 0.5) / 3],  # pixel (0, 0) -> 0
            [(1.0) / 4, (0 + 0.5) / 3],  # x midway between cols 0,1 -> 0.5
        ]
    )
    got = np.asarray(point_sample(feat, pts))[:, 0]
    np.testing.assert_allclose(got, [9.0, 0.0, 0.5], atol=1e-6)


def test_rel_roi_to_img_points():
    roi = jnp.asarray([10.0, 20.0, 50.0, 60.0])
    pts = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.5, 0.25]])
    out = np.asarray(rel_roi_point_to_rel_img_point(roi, pts, (100.0, 200.0)))
    np.testing.assert_allclose(out[0], [10 / 200, 20 / 100], atol=1e-6)
    np.testing.assert_allclose(out[1], [50 / 200, 60 / 100], atol=1e-6)
    np.testing.assert_allclose(out[2], [30 / 200, 30 / 100], atol=1e-6)


def test_train_point_selection_prefers_uncertain():
    """Importance sampling must land most selected points near the logit
    zero-crossing (the uncertain band)."""
    from boosting_rcnn_tpu.models.roi_heads.point_rend import (
        PointRendCfg,
        get_train_points,
    )

    s = 16
    yy, xx = np.mgrid[0:s, 0:s]
    # logit: strongly positive left half, strongly negative right half,
    # zero-crossing at x = s/2
    logit = (s / 2 - xx).astype(np.float32) * 4.0
    coarse = jnp.asarray(logit)[None, :, :, None]  # (1, s, s, 1)
    cfg = PointRendCfg(num_points=48, oversample_ratio=4.0,
                       importance_sample_ratio=1.0)
    pts = np.asarray(
        get_train_points(cfg, jax.random.PRNGKey(0), coarse,
                         jnp.zeros((1,), jnp.int32))
    )[0]
    assert pts.shape == (48, 2)
    # all-importance selection: points concentrate near x = 0.5
    assert np.abs(pts[:, 0] - 0.5).mean() < 0.15


def test_subdivision_refines_uncertain_cells():
    from boosting_rcnn_tpu.models.roi_heads.point_rend import (
        PointRendCfg,
        subdivision_refine,
    )

    cfg = PointRendCfg(subdivision_steps=2, subdivision_num_points=16,
                       scale_factor=2)
    coarse = jnp.zeros((1, 4, 4))  # all maximally uncertain (logit 0)

    def point_fn(pts):
        # oracle: positive iff x > 0.5
        return jnp.where(pts[..., 0] > 0.5, 5.0, -5.0)

    out = np.asarray(subdivision_refine(cfg, coarse, point_fn))
    assert out.shape == (1, 16, 16)
    # refined cells carry the oracle's +-5 logits
    assert (np.abs(out) > 4.9).sum() >= 16


@pytest.mark.slow
def test_point_rend_detector_forward_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        os.path.join(REPO, "configs/point_rend/point_rend_r50_fpn_1x_coco.py")
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["rpn_head"].update(feat_channels=16)
    mc["roi_head"]["bbox_head"].update(fc_out_channels=16, num_classes=4)
    mc["roi_head"]["mask_head"].update(num_classes=4, fc_out_channels=32)
    mc["roi_head"]["point_head"].update(num_classes=4, fc_channels=16)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["train_cfg"]["rcnn"]["point"]["num_points"] = 16
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=8)
    mc["test_cfg"]["rcnn"].update(subdivision_steps=2,
                                  subdivision_num_points=32)
    det = build_detector(mc)

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1, with_masks=True)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_mask" in losses and "loss_point" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    out = det.predict(variables, batch, anchors, nla)
    dets, labels, valid, masks = out
    m = np.asarray(masks)
    # 7x7 coarse x 2^2 subdivision = 28x28 refined masks
    assert m.shape[-2:] == (28, 28)
    assert (m >= 0).all() and (m <= 1).all()
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
