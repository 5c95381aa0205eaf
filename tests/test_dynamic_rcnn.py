"""Dynamic R-CNN (reference ``roi_heads/dynamic_roi_head.py`` +
``configs/dynamic_rcnn``): adaptive RoI assigner IoU threshold and
SmoothL1 beta, state held in the bbox head's ``batch_stats``.

Covers:
  * DynamicRoIHead config -> ``dyn_iou_thr``/``dyn_beta`` declared at init;
  * ``ConvFCBBoxHead.update_dynamic`` interval-replay + floor/cap +
    NaN-skip semantics (deterministic unit check through a module apply);
  * train steps thread the state (bounds hold, loss finite), direct
    ``detector.loss`` stays pure;
  * traced ``beta_override`` reproduces the static-beta loss exactly.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.data.loader import FakeDetLoader

CANVAS = (64, 96)


def _dynamic_model_cfg():
    return dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=32,
                  num_outs=5),
        rpn_head=dict(
            type="RPNHead", in_channels=32, feat_channels=32,
            anchor_generator=dict(
                scales=[8], ratios=[1.0], strides=[4, 8, 16, 32, 64]),
        ),
        roi_head=dict(
            type="DynamicRoIHead",
            bbox_roi_extractor=dict(
                roi_layer=dict(type="RoIAlign", output_size=7),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                fc_out_channels=32,
                loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                               loss_weight=1.0),
            ),
        ),
        train_cfg=dict(
            rcnn=dict(
                sampler=dict(type="RandomSampler", num=16,
                             pos_fraction=0.25),
                dynamic_rcnn=dict(iou_topk=2, beta_topk=2,
                                  update_iter_interval=1,
                                  initial_iou=0.4, initial_beta=1.0),
            ),
            rpn_proposal=dict(nms_pre=64, max_per_img=32,
                              nms=dict(iou_threshold=0.7)),
        ),
        test_cfg=dict(
            rpn=dict(nms_pre=48, max_per_img=16,
                     nms=dict(iou_threshold=0.7)),
            rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=8),
        ),
    )


def _batch():
    b = next(FakeDetLoader(2, CANVAS, 4, num_batches=1).epoch_iter(0))
    b.pop("ori_shape")
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_dynamic_state_declared_and_update_semantics():
    det = build_detector(_dynamic_model_cfg())
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    bs = variables["batch_stats"]["bbox_head"]
    assert float(bs["dyn_iou_thr"]) == pytest.approx(0.4)
    assert float(bs["dyn_beta"]) == pytest.approx(1.0)

    from boosting_rcnn_tpu.models.detectors.two_stage import TwoStageNet

    # update_iter_interval=1 -> boundary every step: the state jumps to the
    # batch statistic under the reference floor/cap (iou floored at 0.4,
    # beta capped at 1.0)
    (niou, nbeta), upd = det.net.apply(
        variables, jnp.asarray(0.7), jnp.asarray(0.3),
        method=TwoStageNet.update_dynamic, mutable=["batch_stats"])
    assert float(niou) == pytest.approx(0.7)
    assert float(nbeta) == pytest.approx(0.3)
    assert float(upd["batch_stats"]["bbox_head"]["dyn_iou_thr"]) == (
        pytest.approx(0.7))
    # floor/cap: low iou stat floors at initial, high beta stat caps
    (fiou, fbeta), _ = det.net.apply(
        variables, jnp.asarray(0.1), jnp.asarray(5.0),
        method=TwoStageNet.update_dynamic, mutable=["batch_stats"])
    assert float(fiou) == pytest.approx(0.4)
    assert float(fbeta) == pytest.approx(1.0)
    # NaN statistics (empty batch) are skipped
    (siou, sbeta), _ = det.net.apply(
        variables, jnp.asarray(jnp.nan), jnp.asarray(jnp.nan),
        method=TwoStageNet.update_dynamic, mutable=["batch_stats"])
    assert float(siou) == pytest.approx(0.4)
    assert float(sbeta) == pytest.approx(1.0)


@pytest.mark.slow
def test_dynamic_train_steps_thread_state():
    import optax

    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_train_step,
    )

    det = build_detector(_dynamic_model_cfg())
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    state = create_train_state(variables, optax.sgd(1e-3))
    step = make_train_step(det, anchors, nla)
    batch = _batch()
    for i in range(2):
        state, m = step(state, batch, jax.random.PRNGKey(1 + i))
        assert np.isfinite(float(m["loss"]))
    iou = float(state.batch_stats["bbox_head"]["dyn_iou_thr"])
    beta = float(state.batch_stats["bbox_head"]["dyn_beta"])
    # reference floor/cap invariants hold through real updates
    assert iou >= 0.4 - 1e-6 and np.isfinite(iou)
    assert beta <= 1.0 + 1e-6 and beta > 0.0


@pytest.mark.slow
def test_dynamic_direct_loss_pure_and_predict():
    det = build_detector(_dynamic_model_cfg())
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    losses = det.loss(variables, jax.random.PRNGKey(1), _batch(),
                      anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(np.asarray(
        variables["batch_stats"]["bbox_head"]["dyn_iou_thr"])) == (
        pytest.approx(0.4))
    batch = _batch()
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert dets.shape[-1] == 5


def test_beta_override_matches_static_beta():
    from boosting_rcnn_tpu.models.roi_heads.bbox_head import (
        BBoxHeadCfg,
        bbox_head_loss,
    )

    rng = np.random.RandomState(0)
    r, c = 8, 4
    cls = jnp.asarray(rng.randn(r, c + 1), jnp.float32)
    reg = jnp.asarray(rng.randn(r, c * 4), jnp.float32)
    rois = jnp.asarray(np.abs(rng.randn(r, 4)) * 10, jnp.float32)
    labels = jnp.asarray(rng.randint(0, c + 1, size=r), jnp.int32)
    lw = jnp.ones((r,), jnp.float32)
    bt = jnp.asarray(rng.randn(r, 4) * 0.5, jnp.float32)
    bw = jnp.ones((r, 4), jnp.float32)

    static = bbox_head_loss(
        BBoxHeadCfg(num_classes=c, loss_bbox_type="smooth_l1",
                    smooth_l1_beta=0.37),
        cls, reg, rois, labels, lw, bt, bw)
    dyn = bbox_head_loss(
        BBoxHeadCfg(num_classes=c, loss_bbox_type="smooth_l1",
                    smooth_l1_beta=1.0),
        cls, reg, rois, labels, lw, bt, bw,
        beta_override=jnp.asarray(0.37))
    np.testing.assert_allclose(
        float(static["loss_bbox"]), float(dyn["loss_bbox"]), rtol=1e-6)
